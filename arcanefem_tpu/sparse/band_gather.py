"""Banded tile gather — the bounded-span kernel for SORTED request
streams (the compact pre-gather's stage 1).

The compact SpMV's pre-gather (xc = x[uniq]) sweeps each block of 1024
sorted requests against the block's whole multi-slot window: measured
~740k vreg-steps at 1.9M (the largest single cost in the champion SpMV,
VERDICT r4 #2 / ROADMAP "Round-4 session 1").  But the requests are
sorted with stride ~5-30, so most 128-request TILES touch only a few
rows of that window: measured dense-tile row spans on the 1.9M
sphere_cut pre stream — p50 = 5 rows, while the block window is ~130.

This kernel gives each tile its own K-row aligned band:

  * plan time: the dense 128-request tiles are split NARROW (span from
    the 8-aligned base <= K) / WIDE (everything else, incl. tiles that
    cross uniq-run boundaries).  Narrow tiles get a per-tile base row
    (SMEM) and TILE-LOCAL virtual indices; wide tiles fall back to the
    existing multi-slot span sweep (PlannedGather).
  * kernel: G=8 narrow tiles per grid step, one K-row DMA per tile into
    a (G·K, 128) scratch, then a K-step sweep where step j reads
    win[:, j, :] — every step processes all G tiles, so the sweep does
    K steps instead of window-rows steps.
  * NO runtime merge: the output is [narrow tiles; wide tiles]
    concatenated, and the narrow/wide tile permutation is baked into the
    downstream remap at plan time (_compact_columns) — a uniq run's
    stage-2 window splits into at most 2 contiguous clusters, which the
    multi-slot stage-2 planner absorbs.

Cost model on the 1.9M pre stream (tools analysis, round 5): K=16 keeps
58% of tiles narrow at 52k vreg-steps + ~59-120k for the wide remainder
vs 738k today — a ~4-6x cut on the pre leg.

Role reference: the gather half of the CUDA CSR SpMV inside Hypre's PCG
(femutils/HypreDoFLinearSystem.cc:686-742) — on GPU this locality is
what the L2 cache gives for free; on TPU it must be planned.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_spmv import _UNIT_PAD, LANE, PlannedGather

_DEF_K = 16


@partial(jax.jit, static_argnames=("key",))
def _band_products_unit(bases, lcols, x, key):
    """Narrow-tile band gather: unit weights, W=1 requests.

    bases (nb, 1, G) int32 aligned-8 source start rows; lcols
    (nb, G, LANE) tile-local virtual indices (lrow·128+lane, pad =
    _UNIT_PAD); x (rows, LANE).  Returns (nb, G, LANE) gathered values.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, G, nb = key

    def body(b_ref, lcols_ref, x_hbm, out_ref, win_ref, *sems):
        cps = []
        for g in range(G):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(b_ref[0, 0, g], K), :],
                win_ref.at[pl.ds(g * K, K), :],
                sems[g],
            )
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()
        idx = lcols_ref[0]
        hi = idx >> 7
        lj = idx & (LANE - 1)
        win = win_ref[pl.ds(0, G * K), :].reshape(G, K, LANE)
        acc = jnp.zeros((G, LANE), jnp.float32)
        for j in range(K):
            chunk = win[:, j, :]
            got = jnp.take_along_axis(chunk, lj, axis=1)
            acc = acc + jnp.where(hi == j, got, 0.0)
        out_ref[0] = acc

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((nb, G, LANE), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, G), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G * K, LANE), jnp.float32)]
        + [pltpu.SemaphoreType.DMA] * G,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(bases, lcols, x)


@partial(jax.jit, static_argnames=("key",))
def _band_products_b_unit(bases, lcols, xs, key):
    """Batched _band_products_unit over a (B, rows, LANE) table stack
    sharing one plan (grid (nb, B)) — BlockedGather channel tables."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, G, nb = key
    B = xs.shape[0]

    def body(b_ref, lcols_ref, x_hbm, out_ref, win_ref, *sems):
        r = pl.program_id(1)
        cps = []
        for g in range(G):
            cp = pltpu.make_async_copy(
                x_hbm.at[r, pl.ds(b_ref[0, 0, g], K), :],
                win_ref.at[pl.ds(g * K, K), :],
                sems[g],
            )
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()
        idx = lcols_ref[0]
        hi = idx >> 7
        lj = idx & (LANE - 1)
        win = win_ref[pl.ds(0, G * K), :].reshape(G, K, LANE)
        acc = jnp.zeros((G, LANE), jnp.float32)
        for j in range(K):
            chunk = win[:, j, :]
            got = jnp.take_along_axis(chunk, lj, axis=1)
            acc = acc + jnp.where(hi == j, got, 0.0)
        out_ref[0, 0] = acc

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((nb, B, G, LANE), jnp.float32),
        grid=(nb, B),
        in_specs=[
            pl.BlockSpec((1, 1, G), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, LANE), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, G, LANE), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G * K, LANE), jnp.float32)]
        + [pltpu.SemaphoreType.DMA] * G,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(bases, lcols, xs)


class BandedGather:
    """W=1 unit gather over a sorted-run request stream: narrow tiles on
    the band kernel, wide tiles on the span-sweep fallback, outputs
    concatenated [narrow; wide] in tile units of 128.

    ``tile_perm[t]`` maps ORIGINAL tile t to its output tile position —
    the caller bakes it into downstream indices (no runtime merge).
    Interface-compatible with the unit PlannedGather where it matters
    (n_rows / width / need_rows / __call__ / call_batched /
    with_weights_dtype), registered pytree, picklable.
    """

    width = 1
    vals_tiled = None  # unit-plan marker (emulate/bf16 paths check this)

    def __init__(self, bases, lcols, key, wide, n_tiles, n_narrow,
                 n_rows, need_rows, tile_perm):
        self.bases = bases  # (nb, 1, G) int32 device
        self.lcols = lcols  # (nb, G, LANE) int32 device
        self.key = key  # (K, G, nb) static
        self.wide = wide  # PlannedGather (W=1 unit) or None
        self.n_tiles = n_tiles
        self.n_narrow = n_narrow  # narrow tile count
        self.n_rows = n_rows  # OUTPUT length (= n_tiles * 128)
        self.need_rows = need_rows
        self.tile_perm = tile_perm  # (n_tiles,) np.int64, host-side

    @staticmethod
    def build(requests: np.ndarray, K: int | None = None,
              G: int = 8, max_window: int = 128 * 1024,
              min_narrow_frac: float = 0.25,
              valid: np.ndarray | None = None):
        """requests: (m,) int64 concatenated sorted runs (e.g. per-block
        distinct columns).  valid (m,) bool marks requests that must
        contribute (invalid ones output exact 0 — ELL padding slots);
        their request values are forward-filled so they never widen a
        band.  Returns (gather, tile_perm) or (None, None) when the wide
        remainder cannot be planned or banding is pointless
        (< min_narrow_frac narrow tiles)."""
        import os

        if K is None:
            K = int(os.environ.get("AFEM_BAND_K", str(_DEF_K)))
        if K % 8:
            raise ValueError("K must be a multiple of 8")
        m = len(requests)
        if m == 0:
            return None, None
        requests = np.asarray(requests, np.int64)
        if valid is not None:
            valid = np.asarray(valid, bool)
            if not valid.any():
                return None, None
            # forward-fill invalid requests from the nearest valid one
            idx = np.where(valid, np.arange(m), -1)
            np.maximum.accumulate(idx, out=idx)
            if idx[0] < 0:
                first = np.flatnonzero(valid)[0]
                idx[idx < 0] = first
            requests = requests[idx]
        T = -(-m // LANE)
        req = np.empty(T * LANE, np.int64)
        req[:m] = requests
        req[m:] = requests[-1]
        pad_mask = np.zeros(T * LANE, bool)
        pad_mask[m:] = True
        if valid is not None:
            pad_mask[:m] |= ~valid
        tiles = req.reshape(T, LANE)
        rows_t = tiles >> 7
        base8 = (rows_t.min(axis=1) // 8) * 8
        span = rows_t.max(axis=1) - base8 + 1
        narrow = span <= K
        n_nar = int(narrow.sum())
        if n_nar < min_narrow_frac * T:
            return None, None
        nar_ids = np.flatnonzero(narrow)
        wid_ids = np.flatnonzero(~narrow)
        # tile_perm: original tile -> output tile position
        tile_perm = np.empty(T, np.int64)
        tile_perm[nar_ids] = np.arange(n_nar)
        tile_perm[wid_ids] = n_nar + np.arange(T - n_nar)

        nb = -(-n_nar // G)
        bases = np.zeros((nb, 1, G), np.int32)
        lcols = np.full((nb * G, LANE), _UNIT_PAD, np.int32)
        nt = tiles[nar_ids]
        nb8 = base8[nar_ids]
        lrow = (nt >> 7) - nb8[:, None]
        lv = (lrow * LANE + (nt & (LANE - 1))).astype(np.int32)
        lv[pad_mask.reshape(T, LANE)[nar_ids]] = _UNIT_PAD
        lcols[:n_nar] = lv
        bases.reshape(nb * G)[:n_nar] = nb8.astype(np.int32)
        need_rows = int((nb8.max() if n_nar else 0) + K)

        wide = None
        if len(wid_ids):
            wreq = tiles[wid_ids].reshape(-1, 1)
            wpad = pad_mask.reshape(T, LANE)[wid_ids].reshape(-1, 1)
            wide = PlannedGather.build(
                wreq, (~wpad).astype(np.float32), block_rows=1024,
                max_window=max_window, wcap=0,
            )
            if wide is None:
                return None, None
            need_rows = max(need_rows, wide.need_rows)
        g = BandedGather(
            bases=jnp.asarray(bases),
            lcols=jnp.asarray(lcols.reshape(nb, G, LANE)),
            key=(K, G, nb), wide=wide, n_tiles=T, n_narrow=n_nar,
            n_rows=T * LANE, need_rows=need_rows, tile_perm=tile_perm,
        )
        return g, tile_perm

    def _pad_table(self, tp):
        need = self.need_rows * LANE
        n_t = -(-max(tp.shape[-1], need) // LANE) * LANE
        return jnp.pad(tp, [(0, 0)] * (tp.ndim - 1)
                       + [(0, n_t - tp.shape[-1])])

    def __call__(self, table: "jnp.ndarray") -> "jnp.ndarray":
        K, G, nb = self.key
        tp = self._pad_table(table.astype(jnp.float32)[None, :])[0]
        tp = tp.reshape(-1, LANE)
        nar = _band_products_unit(self.bases, self.lcols, tp, self.key)
        nar = nar.reshape(nb * G, LANE)[: self.n_narrow]
        parts = [nar.reshape(-1)]
        if self.wide is not None:
            parts.append(self.wide(tp.reshape(-1)))
        out = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        return out.astype(table.dtype)

    def call_batched(self, tables: "jnp.ndarray") -> "jnp.ndarray":
        K, G, nb = self.key
        B = tables.shape[0]
        tp = self._pad_table(tables.astype(jnp.float32))
        tp3 = tp.reshape(B, -1, LANE)
        nar = _band_products_b_unit(self.bases, self.lcols, tp3, self.key)
        nar = nar.transpose(1, 0, 2, 3).reshape(B, nb * G, LANE)
        nar = nar[:, : self.n_narrow].reshape(B, -1)
        if self.wide is not None:
            wid = self.wide.call_batched(tp)
            return jnp.concatenate([nar, wid], axis=1)
        return nar

    def with_weights_dtype(self, dtype) -> "BandedGather":
        # unit plan — no weights to cast; wide is unit too
        return self

    def emulate(self, table: np.ndarray) -> np.ndarray:
        """Numpy plan-emulation (CPU tests): exactly the kernel's
        semantics (band DMA + local-index resolve + pad zeroing)."""
        from ..utils.emulate import emulate_gather

        K, G, nb = self.key
        need = self.need_rows * LANE
        tp = np.zeros(max(len(table), need), np.float32)
        tp[: len(table)] = table
        tpr = tp.reshape(-1, LANE)
        bases = np.asarray(self.bases).reshape(nb * G)
        lcols = np.asarray(self.lcols).reshape(nb * G, LANE)
        out = np.zeros((self.n_narrow, LANE), np.float32)
        for t in range(self.n_narrow):
            idx = lcols[t].astype(np.int64)
            pad = idx >= int(_UNIT_PAD)
            hi = np.where(pad, 0, idx >> 7)
            lj = idx & (LANE - 1)
            vals = tpr[bases[t] + hi, lj]
            out[t] = np.where(pad, 0.0, vals)
        parts = [out.reshape(-1)]
        if self.wide is not None:
            parts.append(emulate_gather(self.wide, tp))
        return np.concatenate(parts) if len(parts) > 1 else parts[0]


class BandedRowSum:
    """Banded gather + W-wide row sums — the stage-2 subrow-sum shape.

    The split plans' stage 2 sums each row's W2 CONSECUTIVE subrow ids;
    flattened row-major the request stream is globally sorted with tiny
    steps, so every tile is narrow (identity tile_perm, no wide part)
    and the K-step band sweep replaces the block-window sweep (~9x fewer
    vreg-steps on the 1.9M leg2).  Output rows never straddle tiles
    (W2 | 128), so the row sum is the standard lane-selection MXU
    contraction straight off the (T, 128) band output."""

    def __init__(self, band: BandedGather, W2: int, n_rows: int):
        assert band.wide is None, "stage-2 stream must be all-narrow"
        assert LANE % W2 == 0
        self.band = band
        self.W2 = W2
        self.n_rows = n_rows

    @property
    def width(self):
        return self.W2

    @property
    def vals_tiled(self):
        return None  # unit-plan marker

    def _sel(self):
        k = LANE // self.W2
        return jnp.asarray(
            np.repeat(np.eye(k, dtype=np.float32), self.W2, axis=0))

    def __call__(self, table: "jnp.ndarray") -> "jnp.ndarray":
        y = self.band(table)  # (T*128,) row-major (r, w2)
        T = self.band.n_tiles
        s = jnp.einsum("tl,lk->tk", y.reshape(T, LANE), self._sel(),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return s.reshape(-1)[: self.n_rows].astype(table.dtype)

    def call_batched(self, tables: "jnp.ndarray") -> "jnp.ndarray":
        y = self.band.call_batched(tables)  # (B, T*128)
        T = self.band.n_tiles
        s = jnp.einsum("btl,lk->btk",
                       y.reshape(y.shape[0], T, LANE), self._sel(),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return s.reshape(y.shape[0], -1)[:, : self.n_rows].astype(
            tables.dtype)

    def with_weights_dtype(self, dtype) -> "BandedRowSum":
        return self  # unit weights throughout

    def emulate(self, table: np.ndarray) -> np.ndarray:
        y = self.band.emulate(np.asarray(table, np.float32))
        return y.reshape(-1, self.W2).sum(axis=1)[: self.n_rows]


jax.tree_util.register_pytree_node(
    BandedRowSum,
    lambda g: ((g.band,), (g.W2, g.n_rows)),
    lambda meta, data: BandedRowSum(data[0], meta[0], meta[1]),
)


def _banded_flatten(g):
    return (
        (g.bases, g.lcols, g.wide),
        (g.key, g.n_tiles, g.n_narrow, g.n_rows, g.need_rows),
    )


def _banded_unflatten(meta, data):
    out = BandedGather.__new__(BandedGather)
    out.bases, out.lcols, out.wide = data
    (out.key, out.n_tiles, out.n_narrow, out.n_rows,
     out.need_rows) = meta
    out.tile_perm = None  # host-side plan detail, not needed at runtime
    return out


jax.tree_util.register_pytree_node(
    BandedGather, _banded_flatten, _banded_unflatten
)
