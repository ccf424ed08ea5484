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

Cost: O(E/1024 · V/128) vector ops — a win whenever the matrix bandwidth V
is moderate (2D meshes, extruded grids; RCM keeps it ~√N there).  Wide-band
3D meshes should use the structured stencil path (mesh/structured.py) or
the XLA fallback; plan_windows() returns None in that case.

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
    """Host-side blocking plan for one topology (built once)."""

    n_nodes: int
    width: int
    block_rows: int  # R
    window: int  # V (multiple of 128)
    n_blocks: int
    lo: np.ndarray  # (n_blocks,) int32 window starts
    lcols: np.ndarray  # (n_blocks, G, 128) window-local columns
    order: np.ndarray | None  # flat entry order used for tiling (or None)


def plan_windows(
    topo: Topology, block_rows: int = 512, max_window: int = 32 * 1024
) -> WindowPlan | None:
    """None if any block's window exceeds the VMEM budget."""
    return plan_windows_from_cols(
        topo.ell_cols, topo.n_nodes - 1, block_rows, max_window
    )


def plan_windows_from_cols(
    cols_in: np.ndarray, pad_target: int,
    block_rows: int = 512, max_window: int = 32 * 1024,
) -> WindowPlan | None:
    """Window plan over an arbitrary (rows, W) gather-index array.

    Used both for the BELL SpMV (indices into x) and the general assembly
    gather (indices into the flat element-entry array); pad rows point at
    pad_target, which must be a valid always-safe source index.
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
    # lane-align window starts so the window DMA is a whole-row 2D copy
    lo = ((blk.min(axis=1) // LANE) * LANE).astype(np.int64)
    vmax = int((blk.max(axis=1) - lo).max()) + 1
    # full (8, 128) f32 tiles: a non-multiple-of-8 sublane count in the
    # VMEM window scratch faults the DMA on v5e
    V = -(-vmax // (8 * LANE)) * (8 * LANE)
    if V > max_window:
        return None
    G = R * W // LANE
    lcols = (blk - lo[:, None]).reshape(nb, G, LANE).astype(np.int32)
    lo = (lo // LANE).astype(np.int32)  # window start as a row index
    return WindowPlan(
        n_nodes=n, width=W, block_rows=R, window=V, n_blocks=nb,
        lo=lo, lcols=lcols, order=None,
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
    need = (int(plan.lo.max()) * LANE + plan.window) if nb else plan.window
    n_t = -(-max(tp.shape[0], need) // LANE) * LANE
    tp = jnp.pad(tp, (0, n_t - tp.shape[0])).reshape(n_t // LANE, LANE)
    key = (G, plan.window, nb)
    prods = _products(vals, jnp.asarray(plan.lcols), jnp.asarray(plan.lo), tp, key)
    return prods.reshape(nb * R, W).sum(axis=1)[:n]


def _make_kernel(G: int, V: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def body(lo_ref, vals_ref, lcols_ref, x_hbm, out_ref, win_ref, sem):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(lo_ref[b], V // LANE), :], win_ref, sem
        )
        cp.start()
        cp.wait()

        idx = lcols_ref[0]  # (G, 128)
        win = win_ref[:]  # (V // LANE, LANE)
        acc = jnp.zeros((G, LANE), jnp.float32)
        for k in range(V // LANE):
            chunk = jnp.broadcast_to(win[k], (G, LANE))
            loc = idx - k * LANE
            got = jnp.take_along_axis(
                chunk, jnp.clip(loc, 0, LANE - 1), axis=1
            )
            acc = acc + jnp.where((loc >= 0) & (loc < LANE), got, 0.0)
        out_ref[0] = vals_ref[0] * acc

    return body


@partial(jax.jit, static_argnames=("key",))
def _products(vals_tiled, lcols, lo, x, key):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, V, nb = key
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
        scratch_shapes=[
            pltpu.VMEM((V // LANE, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _make_kernel(G, V),
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
            self._key = (p.block_rows * p.width // LANE, p.window, p.n_blocks)

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
        # pad x to full lanes + one window of slack past every start row
        xp = x.astype(jnp.float32)
        need = (int(p.lo.max()) * LANE + p.window) if p.n_blocks else p.window
        n_x = -(-max(n, need) // LANE) * LANE
        xp = jnp.pad(xp, (0, n_x - n)).reshape(n_x // LANE, LANE)
        prods = _products(vals_tiled, lcols, lo, xp, self._key)
        y = prods.reshape(nb * R, W).sum(axis=1)
        return y[:n].astype(x.dtype)
