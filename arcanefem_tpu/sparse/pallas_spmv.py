"""Pallas window-chunked BELL SpMV — the general-mesh TPU fast path.

XLA's gather on TPU runs ~0.11 Gelem/s (measured, v5e) which makes the
plain `x[cols]` BELL SpMV ~1000x off memory bandwidth.  Mosaic's only fast
random-access primitive is `tpu.dynamic_gather` (jnp.take_along_axis on a
2D operand, 128 lanes per row), so this kernel restructures the SpMV around
it:

* nodes are bandwidth-ordered (RCM, utils/ordering.py) so all columns of a
  block of R rows fall inside a contiguous window of x;
* per grid step the window is DMA'd HBM -> VMEM (scalar-prefetched start
  offset — the PrefetchScalarGridSpec pattern);
* the block's (R·W) window-local column indices, pre-laid-out on the host
  as native (G, 128) tiles, are resolved by sweeping the window 128 lanes
  at a time: broadcast chunk + take_along_axis(axis=1) + masked accumulate;
* the kernel emits gathered·value products; the per-row sum is a trivial
  XLA reshape+reduce outside (consecutive W lanes per node).

Cost: O(E/1024 · V/128) vector ops.  V is what matters; two mechanisms
keep it small on wide-bandwidth (3D) meshes:

* **multi-window blocks** — a 3D RCM matrix's row-block columns cluster
  into a few bands (same / previous / next BFS level of the RCM ordering),
  so instead of one window spanning the whole bandwidth, the planner splits
  each block's columns at the S-1 largest gaps and DMAs S small windows
  into one virtual VMEM window.  Measured on a 300k-node unstructured
  tetra mesh: single window ~18k elements vs S=6 multi-window ~6-9k.
* **hoisted index split** — the (sublane, lane) split of each entry's
  virtual window index is computed once before the sweep, so a sweep step
  is broadcast + gather + compare + select-accumulate (5 vector ops).

This is the TPU-native re-design of the role the reference's CUDA CSR SpMV
plays inside Hypre's PCG (femutils/HypreDoFLinearSystem.cc:686-742).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .topology import Topology

LANE = 128


@dataclass
class WindowPlan:
    """Host-side blocking plan for one topology (built once).

    A block's VMEM window is the concatenation of S sub-windows (slots);
    slot s has the static size ``slot_rows[s]·128`` and per-block start row
    ``lo[b, s]``.  ``lcols`` holds *virtual* window indices: an entry whose
    column lands in slot s at local row r, lane c maps to
    ``(slot_off[s] + r)·128 + c`` where slot_off is the running sum of
    slot_rows.  S=1 degenerates to the original single-window layout.
    """

    n_nodes: int
    width: int
    block_rows: int  # R
    window: int  # total V = sum(slot_rows)·128 (multiple of 8·128)
    n_blocks: int
    lo: np.ndarray  # (n_blocks, S) int32 per-slot window start rows
    lcols: np.ndarray  # (n_blocks, G, 128) virtual window-local columns
    slot_rows: tuple  # per-slot sub-window heights (rows of 128)
    need_rows: int  # source rows the DMAs may touch: max(lo[:,s]+slot_rows[s])
    order: np.ndarray | None  # flat entry order used for tiling (or None)

    def global_cols(self) -> np.ndarray:
        """Reconstruct the original (nb·R, W) column indices (tests)."""
        off = np.concatenate([[0], np.cumsum(self.slot_rows)])
        v = self.lcols.reshape(self.n_blocks, -1).astype(np.int64)
        vrow, lane = v >> 7, v & (LANE - 1)
        s = np.searchsorted(off, vrow, side="right") - 1
        g = (self.lo[np.arange(self.n_blocks)[:, None], s] + vrow - off[s])
        return (g * LANE + lane).reshape(
            self.n_blocks * self.block_rows, self.width
        )


def plan_windows(
    topo: Topology, block_rows: int = 512, max_window: int = 128 * 1024
) -> WindowPlan | None:
    """None if any block's window exceeds the VMEM budget."""
    return plan_windows_from_cols(
        topo.ell_cols, topo.n_nodes - 1, block_rows, max_window
    )


_SLOT_CANDIDATES = (1, 2, 3, 4, 6, 8)


def plan_windows_from_cols(
    cols_in: np.ndarray, pad_target: int,
    block_rows: int = 512, max_window: int = 128 * 1024,
    slot_candidates: tuple = _SLOT_CANDIDATES,
) -> WindowPlan | None:
    """Window plan over an arbitrary (rows, W) gather-index array.

    Used both for the BELL SpMV (indices into x) and the general assembly
    gather (indices into the flat element-entry array); pad rows point at
    pad_target, which must be a valid always-safe source index.

    For each candidate sub-window count S, every block's column row-groups
    are split at the block's S-1 largest index gaps; slot s's static height
    is the max over blocks of the s-th largest cluster span.  The S with
    the smallest total window wins (ties favour fewer DMAs).
    """
    n, W = cols_in.shape
    R = block_rows
    if (R * W) % LANE:
        return None
    nb = -(-n // R)
    n_pad = nb * R
    cols = np.empty((n_pad, W), np.int32)
    cols[:n] = cols_in
    cols[n:] = pad_target
    blk = cols.reshape(nb, R * W)

    # sorted row-groups (col // 128) per block; gaps drive the clustering
    srt = np.sort(blk // LANE, axis=1).astype(np.int32)  # (nb, M)
    M = srt.shape[1]
    d = np.diff(srt, axis=1)

    def layout_for(S):
        """(slot_rows list, starts (nb,S), ends (nb,S)) or None."""
        if S == 1:
            starts = srt[:, :1].astype(np.int64)
            spans = (srt[:, -1] - srt[:, 0] + 1).astype(np.int64)[:, None]
        else:
            k = min(S - 1, M - 1)
            gi = np.argpartition(d, -k, axis=1)[:, -k:]
            gi = np.sort(gi, axis=1)  # (nb, k) split positions
            b_idx = np.arange(nb)[:, None]
            seg_start = np.concatenate(
                [np.zeros((nb, 1), np.int64), gi + 1], axis=1
            )  # (nb, k+1) indices into srt
            seg_end = np.concatenate(
                [gi, np.full((nb, 1), M - 1, np.int64)], axis=1
            )
            starts = srt[b_idx, seg_start].astype(np.int64)
            spans = (srt[b_idx, seg_end] - starts + 1).astype(np.int64)
            if k + 1 < S:  # pad unused slots with empty clusters
                pad = S - (k + 1)
                starts = np.concatenate(
                    [starts, np.repeat(starts[:, :1], pad, axis=1)], axis=1
                )
                spans = np.concatenate(
                    [spans, np.zeros((nb, pad), np.int64)], axis=1
                )
            # assign clusters to slots largest-first so the static per-slot
            # heights (max over blocks) stay tight
            ordr = np.argsort(-spans, axis=1, kind="stable")
            starts = np.take_along_axis(starts, ordr, axis=1)
            spans = np.take_along_axis(spans, ordr, axis=1)
        # static slot heights, rounded to full (8,128) f32 tiles (a
        # non-multiple-of-8 sublane count in the DMA faults on v5e)
        slot_rows = [
            max(8, int(-(-int(spans[:, s].max()) // 8) * 8))
            for s in range(starts.shape[1])
        ]
        if sum(slot_rows) * LANE > max_window:
            return None
        return slot_rows, starts, spans

    best = None
    for S in slot_candidates:
        out = layout_for(S)
        if out is None:
            continue
        total = sum(out[0])
        if best is None or total < best[0]:
            best = (total, out)
    if best is None:
        return None
    slot_rows, starts, spans = best[1]
    S = len(slot_rows)
    off = np.concatenate([[0], np.cumsum(slot_rows)])

    # map every entry to (slot, virtual index)
    rg = (blk >> 7).astype(np.int64)  # (nb, M) row-group of each entry
    lane = (blk & (LANE - 1)).astype(np.int64)
    virt = np.full(blk.shape, -1, np.int64)
    for s in range(S):
        lo_s = starts[:, s : s + 1]
        in_s = (rg >= lo_s) & (rg < lo_s + spans[:, s : s + 1]) & (virt < 0)
        virt = np.where(in_s, (off[s] + rg - lo_s) * LANE + lane, virt)
    assert virt.min() >= 0, "multi-window planner missed an entry"

    G = R * W // LANE
    need_rows = int((starts + np.asarray(slot_rows)[None, :]).max())
    return WindowPlan(
        n_nodes=n, width=W, block_rows=R,
        window=int(off[-1]) * LANE, n_blocks=nb,
        lo=starts.astype(np.int32),
        lcols=virt.reshape(nb, G, LANE).astype(np.int32),
        slot_rows=tuple(slot_rows), need_rows=need_rows, order=None,
    )


def gather_sum_rows(plan: WindowPlan, table: "jnp.ndarray",
                    weights=None) -> "jnp.ndarray":
    """(rows,) sums of weights[r,:]·table[cols[r,:]] via the window kernel —
    the generic "gather W sources per row and reduce" primitive.  weights
    (rows, W) defaults to ones; use 0-entries to mask padding slots."""
    n, W = plan.n_nodes, plan.width
    R, nb = plan.block_rows, plan.n_blocks
    G = R * W // LANE
    if weights is None:
        vals = jnp.ones((nb, G, LANE), jnp.float32)
    else:
        w = jnp.asarray(weights, jnp.float32).reshape(n, W)
        if nb * R != n:
            w = jnp.pad(w, ((0, nb * R - n), (0, 0)))
        vals = w.reshape(nb, G, LANE)
    tp = table.astype(jnp.float32)
    need = plan.need_rows * LANE
    n_t = -(-max(tp.shape[0], need) // LANE) * LANE
    tp = jnp.pad(tp, (0, n_t - tp.shape[0])).reshape(n_t // LANE, LANE)
    key = (G, plan.slot_rows, nb)
    prods = _products(vals, jnp.asarray(plan.lcols), jnp.asarray(plan.lo), tp, key)
    return prods.reshape(nb * R, W).sum(axis=1)[:n]


def _make_kernel(G: int, slot_rows: tuple):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = len(slot_rows)
    offs = [0]
    for r in slot_rows:
        offs.append(offs[-1] + r)
    V = offs[-1] * LANE

    def body(lo_ref, vals_ref, lcols_ref, x_hbm, out_ref, win_ref, *sems):
        b = pl.program_id(0)
        cps = []
        for s in range(S):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(lo_ref[b, s], slot_rows[s]), :],
                win_ref.at[pl.ds(offs[s], slot_rows[s]), :],
                sems[s],
            )
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

        idx = lcols_ref[0]  # (G, 128) virtual window indices
        hi = idx >> 7  # sublane (window row), loop-invariant
        lj = idx & (LANE - 1)  # lane within the row
        win = win_ref[:]  # (V // LANE, LANE)
        acc = jnp.zeros((G, LANE), jnp.float32)
        for k in range(V // LANE):
            chunk = jnp.broadcast_to(win[k], (G, LANE))
            got = jnp.take_along_axis(chunk, lj, axis=1)
            acc = acc + jnp.where(hi == k, got, 0.0)
        out_ref[0] = vals_ref[0] * acc

    return body


@partial(jax.jit, static_argnames=("key",))
def _products(vals_tiled, lcols, lo, x, key):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, slot_rows, nb = key
    V = sum(slot_rows) * LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, G, LANE), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, LANE), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, LANE), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((V // LANE, LANE), jnp.float32)]
        + [pltpu.SemaphoreType.DMA] * len(slot_rows),
    )
    return pl.pallas_call(
        _make_kernel(G, slot_rows),
        out_shape=jax.ShapeDtypeStruct((nb, G, LANE), jnp.float32),
        grid_spec=grid_spec,
    )(lo, vals_tiled, lcols, x)


def _cached_spmv(topo):
    """Per-topology kernel cache, stored on the object (id()-keyed dicts
    can alias after garbage collection).

    The exhaustive window sweep is the default: the diagonal-coherent
    sorted kernel (pallas_spmv_diag.py) needs ~5x fewer probes per tile
    but each dynamic-fori_loop probe costs ~15x a sweep step, measuring
    3x SLOWER at 531k nodes on v5e (tools/bench_spmv.py 80: window
    6.7 ms vs diag 21.7 ms vs XLA 62 ms).  AFEM_SPMV=diag opts in for
    experimentation."""
    import os

    sp = getattr(topo, "_pallas_spmv", None)
    if sp is None:
        sp = None
        if os.environ.get("AFEM_SPMV") == "diag":
            from .pallas_spmv_diag import DiagBellSpmv

            sp = DiagBellSpmv(topo)
        if sp is None or not sp.available:
            sp = PallasBellSpmv(topo)
        topo._pallas_spmv = sp
    return sp


def as_pallas_matrix(A):
    """Wrap a BellMatrix so .spmv uses the window kernel.

    Block matrices (elasticity family) run block² scalar window gathers
    over the same plan.  Returns the original matrix unchanged when the
    kernel is unavailable (too-wide bandwidth or non-TPU backend).
    """
    import jax

    from .bell import BellMatrix

    if not isinstance(A, BellMatrix):
        return A
    if jax.devices()[0].platform != "tpu":
        return A
    sp = _cached_spmv(A.topo)
    if not sp.available:
        return A
    return PallasBellMatrix(values=A.values, topo=A.topo, block=A.block,
                            cols=A.cols)


class PallasBellMatrix:
    """BellMatrix drop-in whose spmv runs the window kernel.

    The window plan's index arrays ride in the pytree (``plan_arrays``) so
    jit traces see them as runtime buffers, not embedded literals.
    """

    def __init__(self, values, topo, block=1, cols=None, plan_arrays=None):
        from .bell import BellMatrix

        self._bell = BellMatrix(values=values, topo=topo, block=block,
                                cols=cols)
        if plan_arrays is None:
            sp = _cached_spmv(topo)
            plan_arrays = (
                sp.device_arrays() if hasattr(sp, "device_arrays") else None
            )
        self._plan_arrays = plan_arrays

    # delegate everything except spmv
    def __getattr__(self, name):
        return getattr(self._bell, name)

    def spmv(self, x):
        sp = _cached_spmv(self._bell.topo)
        # the opt-in diag kernel has no carriable plan arrays
        extra = (self._plan_arrays,) if hasattr(sp, "device_arrays") else ()
        b = self._bell.block
        if b == 1:
            return sp(self._bell.values, x, *extra)
        # block SpMV as b² scalar window gathers over the shared plan:
        # y[:, a] = sum_c gather(values[..., a, c], cols) · x[:, c]
        n = self._bell.topo.n_nodes
        xn = x.reshape(n, b)
        cols_vals = self._bell.values  # (N, W, b, b)
        ys = []
        for a in range(b):
            acc = None
            for c in range(b):
                t = sp(cols_vals[:, :, a, c], xn[:, c], *extra)
                acc = t if acc is None else acc + t
            ys.append(acc)
        return jnp.stack(ys, axis=1).reshape(-1).astype(x.dtype)

    def with_values(self, values):
        return PallasBellMatrix(
            values=values.reshape(self._bell.values.shape),
            topo=self._bell.topo, block=self._bell.block,
            cols=self._bell.cols, plan_arrays=self._plan_arrays,
        )


def _pallas_matrix_flatten(m):
    return (
        (m._bell.values, m._bell.cols, m._plan_arrays),
        (m._bell.topo, m._bell.block),
    )


def _pallas_matrix_unflatten(meta, data):
    return PallasBellMatrix(values=data[0], topo=meta[0], block=meta[1],
                            cols=data[1], plan_arrays=data[2])


jax.tree_util.register_pytree_node(
    PallasBellMatrix, _pallas_matrix_flatten, _pallas_matrix_unflatten
)


class PallasBellSpmv:
    """y = A @ x for a scalar BELL matrix via the window kernel.

    sp = PallasBellSpmv(topo); y = sp(values, x) with values (N, W) and
    x (N,).  Check `sp.available` first; falls back is the caller's job.
    """

    def __init__(self, topo: Topology, block_rows: int = 512):
        self.topo = topo
        self.plan = plan_windows(topo, block_rows)
        if self.plan is not None:
            p = self.plan
            self._lcols = jnp.asarray(p.lcols)
            self._lo = jnp.asarray(p.lo)
            self._key = (p.block_rows * p.width // LANE, p.slot_rows,
                         p.n_blocks)

    @property
    def available(self) -> bool:
        return self.plan is not None

    def device_arrays(self) -> tuple:
        """(lcols, lo) as device buffers — pytree-carriable by the matrix
        (closure capture would embed them as HLO literals, which bloats
        compiles and overflows remote-compile at ~1M+ nodes)."""
        return (self._lcols, self._lo)

    def __call__(self, values: jnp.ndarray, x: jnp.ndarray,
                 plan_arrays: tuple | None = None) -> jnp.ndarray:
        p = self.plan
        assert p is not None, "matrix bandwidth too wide for the window kernel"
        lcols, lo = plan_arrays if plan_arrays is not None else (
            self._lcols, self._lo
        )
        n, W = self.topo.n_nodes, self.topo.width
        R, nb = p.block_rows, p.n_blocks
        G = R * W // LANE
        vals = values.reshape(n, W).astype(jnp.float32)
        if nb * R != n:
            vals = jnp.pad(vals, ((0, nb * R - n), (0, 0)))
        vals_tiled = vals.reshape(nb, G, LANE)
        # pad x to full lanes, covering every sub-window DMA's reach
        xp = x.astype(jnp.float32)
        need = p.need_rows * LANE
        n_x = -(-max(n, need) // LANE) * LANE
        xp = jnp.pad(xp, (0, n_x - n)).reshape(n_x // LANE, LANE)
        prods = _products(vals_tiled, lcols, lo, xp, self._key)
        y = prods.reshape(nb * R, W).sum(axis=1)
        return y[:n].astype(x.dtype)
