"""Diagonal-coherent (sorted-request) window SpMV — ROADMAP item 2.

The plain window kernel (pallas_spmv.py) probes every 128-lane window chunk
for every request tile: O(G · V/128) vector ops per block, which is what
caps it at ~13x over XLA.  This kernel exploits that ELL rows store their
columns SORTED (sparse/topology.py builds them that way) and that after RCM
the w-th smallest neighbour of consecutive rows advances roughly with the
row index.  Tiling requests slot-major — one tile = slot w of 1024
consecutive rows as an (8, 128) VREG block, lanes = rows — makes each
tile's "diagonalized" column offsets (col − 128·sublane) span only a few
128-wide chunks.  The kernel then:

* DMAs the block's x window HBM → VMEM once (as before);
* per tile, takes S ≪ V/128 probes: an (8, 128) *dynamic sublane slice*
  of the window at the tile's planned chunk offset (scalar-prefetched),
  followed by a per-sublane `take_along_axis` — sublane s of probe t is
  window chunk c0+t+s, matching the natural one-chunk-per-128-rows drift
  of a banded matrix;
* emits products; the per-row sum is a reshape+reduce outside (slot-major
  tiles put each row's W products at stride R).

S (max probes per tile) is measured by the host-side planner; meshes whose
RCM band drifts too irregularly fall back to the plain window kernel or
XLA (plan returns None).  Verified exact on v5e (bit-identical products).

Reference role: the CUDA CSR SpMV inside Hypre PCG
(femutils/HypreDoFLinearSystem.cc:686-742).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .topology import Topology

LANE = 128
SUB = 8
TILE_ROWS = SUB * LANE  # 1024 rows per (8,128) tile


@dataclass
class DiagPlan:
    """Host-side slot-major blocking plan for one topology (built once)."""

    n_nodes: int
    width: int
    block_rows: int  # R (multiple of 1024)
    window: int  # V (multiple of 8*128 window entries)
    n_blocks: int
    n_probes: int  # S (static max; per-tile counts skip the rest)
    lo: np.ndarray  # (nb,) int32 window start (in 128-entry rows)
    c0: np.ndarray  # (nb, G) int32 per-tile probe base (window rows)
    scnt: np.ndarray  # (nb, G) int32 per-tile needed probes (<= S)
    lcols: np.ndarray  # (nb, G, 8, 128) int32 diagonalized offsets


def plan_diag(
    cols_in: np.ndarray,
    pad_target: int,
    block_rows: int = 4096,
    max_window: int = 512 * 1024,
    max_probes: int = 48,
) -> DiagPlan | None:
    """None if the columns are not diagonal-coherent enough or a window
    overflows.  The kernel's cost scales with the MEAN per-tile probe
    count (`scnt` bounds a dynamic fori_loop per tile), so `max_probes`
    gates the mean; the static max S only constrains the VMEM window."""
    n, W = cols_in.shape
    R = block_rows
    if R % TILE_ROWS:
        return None
    nb = -(-n // R)
    n_pad = nb * R
    cols = np.empty((n_pad, W), np.int64)
    cols[:n] = cols_in
    # pad rows: keep the diagonal drift going (col = row index, capped)
    if n_pad > n:
        cols[n:] = np.minimum(np.arange(n, n_pad), pad_target)[:, None]

    qn = R // TILE_ROWS  # tiles per slot per block
    G = W * qn
    # slot-major tiles: (nb, W, qn, 8, 128); lanes = consecutive rows
    t = cols.reshape(nb, qn, SUB, LANE, W).transpose(0, 4, 1, 2, 3)
    # sublane-diagonalized request: probe t's sublane s is window chunk
    # c0+t+s, so reachability needs lo·128 ≤ col − 128·s for every request
    # — the window start is the min of the DIAGONALIZED columns, not of the
    # raw columns (a far-reaching row deep in the block would otherwise put
    # requests below their sublane's reach)
    diag = t - (np.arange(SUB) * LANE)[None, None, None, :, None]
    lo = diag.reshape(nb, -1).min(axis=1) // LANE  # (nb,) may be < 0
    d = diag - lo[:, None, None, None, None] * LANE
    dmin = d.min(axis=(3, 4))  # (nb, W, qn) min over the tile
    dmax = d.max(axis=(3, 4))
    c0 = dmin // LANE
    scnt = (dmax // LANE - c0) + 1  # per-tile needed probes
    S = int(scnt.max())
    if float(scnt.mean()) > max_probes:
        return None
    v128 = int((c0 + S).max()) + SUB - 1  # probe t=S-1 reads rows c0+S-1+7
    v128 = -(-v128 // SUB) * SUB
    if v128 * LANE > max_window:
        return None
    # negative lo (block 0: col < 128·s) is handled by SUB leading pad rows
    # in the x layout; shift all window starts accordingly
    return DiagPlan(
        n_nodes=n, width=W, block_rows=R, window=v128 * LANE, n_blocks=nb,
        n_probes=S,
        lo=(lo + SUB).astype(np.int32),
        c0=c0.reshape(nb, G).astype(np.int32),
        scnt=scnt.reshape(nb, G).astype(np.int32),
        lcols=d.reshape(nb, G, SUB, LANE).astype(np.int32),
    )


def _make_kernel(G: int, V: int, S: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def body(lo_ref, c0_ref, scnt_ref, vals_ref, lcols_ref, x_hbm, out_ref,
             win_ref, sem):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(lo_ref[b], V // LANE), :], win_ref, sem
        )
        cp.start()
        cp.wait()

        for g in range(G):
            c0 = c0_ref[b, g]
            lcols = lcols_ref[0, g]

            # per-tile dynamic probe count: most tiles need far fewer than
            # the static max S (mean ~5-10 vs max ~dozens on 3D meshes),
            # and the dynamic bound also keeps the unroll small
            def probe_step(t, acc, c0=c0, lcols=lcols):
                probe = win_ref[pl.ds(c0 + t, SUB)]  # sublane s: chunk c0+t+s
                loc = lcols - (c0 + t) * LANE
                got = jnp.take_along_axis(
                    probe, jnp.clip(loc, 0, LANE - 1), axis=1
                )
                return acc + jnp.where((loc >= 0) & (loc < LANE), got, 0.0)

            acc = jax.lax.fori_loop(
                0, scnt_ref[b, g], probe_step,
                jnp.zeros((SUB, LANE), jnp.float32),
            )
            out_ref[0, g] = acc * vals_ref[0, g]

    return body


@partial(jax.jit, static_argnames=("key",))
def _products(lo, c0, scnt, vals_tiled, lcols, x, key):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, V, nb, S = key
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, G, SUB, LANE), lambda b, *s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, SUB, LANE), lambda b, *s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, SUB, LANE), lambda b, *s: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((V // LANE, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_kernel(G, V, S),
        out_shape=jax.ShapeDtypeStruct((nb, G, SUB, LANE), jnp.float32),
        grid_spec=grid_spec,
    )(lo, c0, scnt, vals_tiled, lcols, x)


class DiagBellSpmv:
    """y = A @ x for a scalar BELL matrix via the diagonal-coherent kernel.

    sp = DiagBellSpmv(topo); y = sp(values, x) with values (N, W), x (N,).
    Check `sp.available` first; fallback is the caller's job.
    """

    def __init__(self, topo: Topology, block_rows: int = 4096):
        self.topo = topo
        self.plan = plan_diag(topo.ell_cols, topo.n_nodes - 1, block_rows)
        if self.plan is not None:
            p = self.plan
            self._lo = jnp.asarray(p.lo)
            self._c0 = jnp.asarray(p.c0)
            self._scnt = jnp.asarray(p.scnt)
            self._lcols = jnp.asarray(p.lcols)
            self._key = (p.c0.shape[1], p.window, p.n_blocks, p.n_probes)

    @property
    def available(self) -> bool:
        return self.plan is not None

    def __call__(self, values: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        p = self.plan
        assert p is not None
        n, W = self.topo.n_nodes, self.topo.width
        R, nb = p.block_rows, p.n_blocks
        qn = R // TILE_ROWS
        vals = values.reshape(n, W).astype(jnp.float32)
        if nb * R != n:
            vals = jnp.pad(vals, ((0, nb * R - n), (0, 0)))
        # slot-major tiling to match the plan: (nb, W, qn, 8, 128)
        vals_tiled = vals.reshape(nb, qn, SUB, LANE, W).transpose(0, 4, 1, 2, 3)
        vals_tiled = vals_tiled.reshape(nb, W * qn, SUB, LANE)
        # SUB leading pad rows absorb negative raw window starts (plan lo is
        # pre-shifted by +SUB); trailing slack covers the last window
        xp = x.astype(jnp.float32)
        lead = SUB * LANE
        need = (int(p.lo.max()) + p.window // LANE) * LANE if nb else p.window
        n_x = -(-max(n + lead, need) // LANE) * LANE
        xp = jnp.pad(xp, (lead, n_x - n - lead)).reshape(n_x // LANE, LANE)
        prods = _products(self._lo, self._c0, self._scnt, vals_tiled,
                          self._lcols, xp, self._key)
        # (nb, W, qn, 8, 128) -> sum over W -> (nb, R) -> (n,)
        y = prods.reshape(nb, W, R).sum(axis=1)
        return y.reshape(-1)[:n].astype(x.dtype)
