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

# Sentinel virtual index for padding entries in UNIT-weight plans: its
# window row (sentinel >> 7 = 2^21) exceeds every possible sweep height
# (VL ≤ 1024 rows, chunk-rounded), so the sweep's `hi == k` select never
# matches and the pad contributes exact 0 — no weights array needed.
_UNIT_PAD = np.int32(1 << 28)


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
        """Reconstruct the original (nb·R, W) column indices (tests).
        Unit-plan padding sentinels come back as -1."""
        off = np.concatenate([[0], np.cumsum(self.slot_rows)])
        v = self.lcols.reshape(self.n_blocks, -1).astype(np.int64)
        pad = v >= int(_UNIT_PAD)
        vrow, lane = (v >> 7) % max(int(off[-1]), 1), v & (LANE - 1)
        s = np.searchsorted(off, vrow, side="right") - 1
        g = (self.lo[np.arange(self.n_blocks)[:, None], s] + vrow - off[s])
        return np.where(pad, -1, g * LANE + lane).reshape(
            self.n_blocks * self.block_rows, self.width
        )


def plan_windows(
    topo: Topology, block_rows: int = 512, max_window: int = 128 * 1024
) -> WindowPlan | None:
    """None if any block's window exceeds the VMEM budget."""
    return plan_windows_from_cols(
        topo.ell_cols, topo.n_nodes - 1, block_rows, max_window
    )


_SLOT_CANDIDATES = (1, 2, 3, 4, 6, 8, 12, 16)


def _native_plan_enabled() -> bool:
    import os

    return os.environ.get("AFEM_NATIVE_PLAN", "1") == "1"


def _plan_native(cols: np.ndarray, block_rows: int, max_window: int,
                 slot_candidates: tuple):
    """Native-planner WindowPlan (planner.cpp); cols (n, W), entries < 0
    are padding and come back as the _UNIT_PAD sentinel.  Returns a
    WindowPlan; None when the library is unavailable/disabled (caller
    falls back to the numpy planner); False when the planner definitively
    found no layout fitting max_window (don't re-run numpy to learn the
    same thing)."""
    if not _native_plan_enabled():
        return None
    if cols.size and int(cols.max()) >= 2**31:
        return None  # table too large for the int32 planner
    from ..utils.native import plan_windows_native

    n, W = cols.shape
    R = block_rows
    nat = plan_windows_native(cols, R, max_window, slot_candidates)
    if nat is None or nat is False:
        return nat
    lo, slot_rows, virt, need_rows = nat
    nb = lo.shape[0]
    return WindowPlan(
        n_nodes=n, width=W, block_rows=R,
        window=int(sum(slot_rows)) * LANE, n_blocks=nb,
        lo=lo, lcols=virt.reshape(nb, R * W // LANE, LANE),
        slot_rows=slot_rows, need_rows=need_rows, order=None,
    )


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
    # native planner fast path (planner.cpp, ~20-40x): same layout search,
    # pad rows get the sentinel virt index instead of a filled column —
    # numerically identical (pad weights are zero / unit-plan sentinel)
    nat = _plan_native(np.ascontiguousarray(cols_in, np.int32),
                       R, max_window, slot_candidates)
    if nat is False:
        return None
    if nat is not None:
        return nat
    nb = -(-n // R)
    n_pad = nb * R
    cols = np.empty((n_pad, W), np.int32)
    cols[:n] = cols_in
    cols[n:] = pad_target
    blk = cols.reshape(nb, R * W)
    rg = (blk >> 7).astype(np.int32)  # (nb, M) row-group of each entry

    kmax = max(s - 1 for s in slot_candidates)
    if kmax == 0:
        # single-window only: min/max suffice, skip the sort entirely
        starts = rg.min(axis=1, keepdims=True).astype(np.int32)
        spans = (rg.max(axis=1, keepdims=True) - starts + 1).astype(np.int32)
        gap_vals = np.zeros((nb, 0), np.int32)
        gap_lo = np.zeros((nb, 0), np.int32)
    else:
        # one sort + one argpartition serves every candidate S: the top-k
        # gaps of the sorted row-groups, ordered by decreasing gap size
        srt = np.sort(rg, axis=1)
        M = srt.shape[1]
        d = np.diff(srt, axis=1)
        k = min(kmax, M - 1)
        gi = np.argpartition(d, -k, axis=1)[:, -k:]  # (nb, k) positions
        gsz = np.take_along_axis(d, gi, axis=1)
        by_size = np.argsort(-gsz, axis=1, kind="stable")
        gi = np.take_along_axis(gi, by_size, axis=1)
        # gap j splits between values gap_lo[j] and gap_hi[j]
        b_idx = np.arange(nb)[:, None]
        gap_lo = srt[b_idx, gi]  # last value before the gap
        gap_hi = srt[b_idx, gi + 1]  # first value after the gap
        starts = srt[:, :1]
        ends = srt[:, -1:]

    def layout_for(S):
        """slot boundaries using the S-1 largest gaps; None if too big."""
        if kmax == 0 or S == 1:
            st = starts
            sp = spans if kmax == 0 else (ends - starts + 1)
        else:
            kk = min(S - 1, gap_lo.shape[1])
            # cluster boundaries: sort the chosen gaps by position
            glo = np.sort(gap_lo[:, :kk], axis=1)  # (nb, kk)
            ghi = np.sort(gap_hi[:, :kk], axis=1)
            st = np.concatenate([starts, ghi], axis=1)  # (nb, kk+1)
            en = np.concatenate([glo, ends], axis=1)
            sp = en - st + 1
            if kk + 1 < S:
                pad = S - (kk + 1)
                st = np.concatenate(
                    [st, np.repeat(st[:, :1], pad, axis=1)], axis=1
                )
                sp = np.concatenate(
                    [sp, np.zeros((nb, pad), sp.dtype)], axis=1
                )
            # assign clusters to slots largest-first so the static per-slot
            # heights (max over blocks) stay tight
            ordr = np.argsort(-sp, axis=1, kind="stable")
            st = np.take_along_axis(st, ordr, axis=1)
            sp = np.take_along_axis(sp, ordr, axis=1)
        # static slot heights, rounded to full (8,128) f32 tiles (a
        # non-multiple-of-8 sublane count in the DMA faults on v5e)
        slot_rows = [
            max(8, int(-(-int(sp[:, s].max()) // 8) * 8))
            for s in range(st.shape[1])
        ]
        if sum(slot_rows) * LANE > max_window:
            return None
        return slot_rows, st, sp

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
    slot_rows, starts_b, spans_b = best[1]
    S = len(slot_rows)
    off = np.concatenate([[0], np.cumsum(slot_rows)]).astype(np.int32)

    # map every entry to (slot, virtual index); all int32 in-place ops —
    # this runs on (nb, R·W) arrays that reach ~300M entries at 10M nodes
    lane = (blk & (LANE - 1)).astype(np.int32)
    virt = np.full(blk.shape, -1, np.int32)
    for s in range(S):
        lo_s = starts_b[:, s : s + 1].astype(np.int32)
        in_s = (rg >= lo_s) & (rg < lo_s + spans_b[:, s : s + 1])
        in_s &= virt < 0
        virt = np.where(
            in_s, (off[s] + rg - lo_s) * LANE + lane, virt
        )
    assert virt.min() >= 0, "multi-window planner missed an entry"

    G = R * W // LANE
    need_rows = int(
        (starts_b.astype(np.int64) + np.asarray(slot_rows)[None, :]).max()
    )
    return WindowPlan(
        n_nodes=n, width=W, block_rows=R,
        window=int(off[-1]) * LANE, n_blocks=nb,
        lo=starts_b.astype(np.int32),
        lcols=virt.reshape(nb, G, LANE),
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


# Full unroll is fastest (no loop overhead, Mosaic pipelines the sweep)
# but its stack grows ~G·LANE·4B per unrolled step AND the emitted MLIR
# grows linearly in steps: at V//LANE≈700+, the kernel frame blew the 48MB
# scoped-vmem limit and multi-kernel programs (supernode PCG: 16 window
# kernels per SpMV) exceeded the remote-compile request-body limit
# (HTTP 413) — both observed on v5e at the 1.9M-node sphere_cut.  Past
# _FULL_UNROLL_ROWS the sweep therefore runs as a fori_loop over aligned
# _CHUNK_ROWS-row chunks: bounded stack, O(chunk) MLIR, same vector-op
# count per step (one extra dynamic VMEM slice per chunk).
_FULL_UNROLL_ROWS = 256
_CHUNK_ROWS = 32  # multiple of 8 (sublane-aligned dynamic slices)


def _make_kernel(G: int, slot_rows: tuple, batched: bool = False,
                 unit: bool = False):
    """unit=True: no weights operand — every real entry contributes with
    weight 1.0 and padding entries carry the _UNIT_PAD sentinel index
    (their `hi` never matches a sweep row).  Saves the (nb, G, LANE) f32
    weight array AND one vector multiply per output tile — assembly
    reductions and ChainedGather stage-2s are pure unit-weight sums."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = len(slot_rows)
    offs = [0]
    for r in slot_rows:
        offs.append(offs[-1] + r)
    VL = offs[-1]  # window rows (LANE lanes each)

    def body(lo_ref, *refs):
        if unit:
            lcols_ref, x_hbm, out_ref, win_ref, *sems = refs
        else:
            vals_ref, lcols_ref, x_hbm, out_ref, win_ref, *sems = refs
        cps = []
        for s in range(S):
            if batched:
                # channel r of the (B, rows, LANE) table stack — the grid's
                # inner dim, so the plan-array blocks (lo/vals/lcols) stay
                # resident across all B channels of a row block
                src = x_hbm.at[
                    pl.program_id(1), pl.ds(lo_ref[0, 0, s], slot_rows[s]), :
                ]
            else:
                src = x_hbm.at[pl.ds(lo_ref[0, 0, s], slot_rows[s]), :]
            cp = pltpu.make_async_copy(
                src,
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
        acc = jnp.zeros((G, LANE), jnp.float32)
        if VL <= _FULL_UNROLL_ROWS:
            win = win_ref[pl.ds(0, VL), :]
            for k in range(VL):
                chunk = jnp.broadcast_to(win[k], (G, LANE))
                got = jnp.take_along_axis(chunk, lj, axis=1)
                acc = acc + jnp.where(hi == k, got, 0.0)
        else:
            U = _CHUNK_ROWS

            def step(i, acc):
                base = i * U
                rows = win_ref[pl.ds(base, U), :]
                for j in range(U):
                    chunk = jnp.broadcast_to(rows[j], (G, LANE))
                    got = jnp.take_along_axis(chunk, lj, axis=1)
                    acc = acc + jnp.where(hi == base + j, got, 0.0)
                return acc

            # trailing rows past VL read scratch garbage, but no entry's
            # hi reaches them (hi < VL), so the mask zeroes them out
            acc = jax.lax.fori_loop(0, -(-VL // U), step, acc)
        # weights may ride as bf16 (preconditioner-only precision — halves
        # the nnz-sized weight stream, the kernel's dominant HBM traffic);
        # the product/accumulation stays f32
        if unit:
            out = acc
        else:
            out = vals_ref[0].astype(jnp.float32) * acc
        if batched:
            out_ref[0, 0] = out
        else:
            out_ref[0] = out

    return body


@partial(jax.jit, static_argnames=("key",))
def _products(vals_tiled, lcols, lo, x, key):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, slot_rows, nb = key
    S = len(slot_rows)
    V = sum(slot_rows) * LANE
    lo = lo.reshape(nb, 1, S)
    # lo rides as a PER-BLOCK (1, 1, S) SMEM operand — SMEM entries are
    # padded to 64B each, so prefetching (or whole-array placing) all
    # nb·S starts would need e.g. 1.5MB of the 1MB SMEM at nb=2982, S=8
    # (measured compile failures at 2.1M nodes); the (nb, 1, S) shape
    # keeps the blocked window's last two dims equal to the array's (the
    # Mosaic tiling rule) at a constant 64·S bytes of SMEM
    return pl.pallas_call(
        _make_kernel(G, slot_rows),
        out_shape=jax.ShapeDtypeStruct((nb, G, LANE), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        # chunked sweeps slice the scratch in _CHUNK_ROWS strides — round
        # its height up so the final chunk's slice stays in bounds
        scratch_shapes=[pltpu.VMEM(
            (V // LANE if V // LANE <= _FULL_UNROLL_ROWS
             else -(-(V // LANE) // _CHUNK_ROWS) * _CHUNK_ROWS, LANE),
            jnp.float32)]
        + [pltpu.SemaphoreType.DMA] * S,
        # the unrolled window sweep allocates fresh Mosaic stack per step
        # (~G·128·4B each): the fine-mesh kernel's frame is ~13MB, barely
        # under the 16MB default; match the plane kernels' proven 48MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(lo, vals_tiled, lcols, x)


@partial(jax.jit, static_argnames=("key",))
def _products_unit(lcols, lo, x, key):
    """`_products` without the weights operand (unit-weight plans)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, slot_rows, nb = key
    S = len(slot_rows)
    V = sum(slot_rows) * LANE
    lo = lo.reshape(nb, 1, S)
    return pl.pallas_call(
        _make_kernel(G, slot_rows, unit=True),
        out_shape=jax.ShapeDtypeStruct((nb, G, LANE), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(
            (V // LANE if V // LANE <= _FULL_UNROLL_ROWS
             else -(-(V // LANE) // _CHUNK_ROWS) * _CHUNK_ROWS, LANE),
            jnp.float32)]
        + [pltpu.SemaphoreType.DMA] * S,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(lo, lcols, x)


@partial(jax.jit, static_argnames=("key",))
def _products_b_unit(lcols, lo, xs, key):
    """Batched `_products_unit` (grid (nb, B), shared plan)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, slot_rows, nb = key
    S = len(slot_rows)
    V = sum(slot_rows) * LANE
    B = xs.shape[0]
    lo = lo.reshape(nb, 1, S)
    return pl.pallas_call(
        _make_kernel(G, slot_rows, batched=True, unit=True),
        out_shape=jax.ShapeDtypeStruct((nb, B, G, LANE), jnp.float32),
        grid=(nb, B),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, LANE), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, G, LANE), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(
            (V // LANE if V // LANE <= _FULL_UNROLL_ROWS
             else -(-(V // LANE) // _CHUNK_ROWS) * _CHUNK_ROWS, LANE),
            jnp.float32)]
        + [pltpu.SemaphoreType.DMA] * S,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(lo, lcols, xs)


@partial(jax.jit, static_argnames=("key",))
def _products_b(vals_tiled, lcols, lo, xs, key):
    """Batched `_products`: xs is a (B, rows, LANE) stack of tables sharing
    ONE plan.  A single pallas_call with grid (nb, B) — the kernel body is
    emitted ONCE instead of B times, which keeps multi-kernel programs
    (supernode SpMV: 8 column gathers + 8 row reductions) under the
    remote-compile request-body limit (HTTP 413 observed at 1.9M nodes),
    and the plan-array blocks stay resident across the inner B steps."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, slot_rows, nb = key
    S = len(slot_rows)
    V = sum(slot_rows) * LANE
    B = xs.shape[0]
    lo = lo.reshape(nb, 1, S)
    return pl.pallas_call(
        _make_kernel(G, slot_rows, batched=True),
        out_shape=jax.ShapeDtypeStruct((nb, B, G, LANE), jnp.float32),
        grid=(nb, B),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, LANE), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, LANE), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, G, LANE), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(
            (V // LANE if V // LANE <= _FULL_UNROLL_ROWS
             else -(-(V // LANE) // _CHUNK_ROWS) * _CHUNK_ROWS, LANE),
            jnp.float32)]
        + [pltpu.SemaphoreType.DMA] * S,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(lo, vals_tiled, lcols, xs)


def _adaptive_block_rows(W: int, target_g: int = 128,
                         cap: int = 16384) -> int:
    """Largest R ≤ cap with R·W ≡ 0 (mod 128) and G = R·W/128 ≲ target_g.

    Keeps every window kernel's vreg footprint in the measured-safe band:
    G=156 (the fine SpMV) compiles and runs, G=544 OOM'd the Mosaic stack
    on v5e ("scoped allocation 118M > 16M limit").  The cap only binds for
    W<8 plans (W=1 assembly-coordinate gathers: R=16384, G=128) — keeping
    the block count low there also keeps the whole-array `lo` SMEM operand
    small (nb·S·4B against the 1MB SMEM).
    """
    import math

    base = 128 // math.gcd(W, 128)
    r = (target_g * 128 // max(W, 1)) // base * base
    return int(max(base, min(cap, r)))


class PlannedGather:
    """Reusable ``y[r] = Σ_w weights[r,w] · table[cols[r,w]]`` operator.

    The window-kernel form of a fixed gather+reduce (AMG prolongation /
    restriction and coarse-level SpMVs, solver/amg.py).  Plan index arrays
    and the pre-tiled weights ride as pytree DATA so jit traces see runtime
    buffers, not HLO literals (closure capture overflows remote-compile at
    1M+ rows).  Construct with ``PlannedGather.build(...)`` — returns None
    when no window plan exists (caller falls back to the XLA gather).

    Rows wider than ``wcap`` are SPLIT into ≤wcap-wide subrows reduced by
    a second (tiny) planned gather — a wide ELL (e.g. the restriction
    P^T whose width is the max aggregate size, 136 on the 300k sphere_cut)
    would otherwise force a G=R·W/128≈544 kernel that overflows the Mosaic
    stack; the split keeps both stages near G=128 and drops the ELL
    padding waste.
    """

    def __init__(self, vals_tiled, lcols, lo, key, n_rows, width, need_rows):
        self.vals_tiled = vals_tiled
        self.lcols = lcols
        self.lo = lo
        self.key = key  # (G, slot_rows, nb) — static
        self.n_rows = n_rows
        self.width = width
        self.need_rows = need_rows

    @staticmethod
    def build(cols: np.ndarray, weights: np.ndarray,
              block_rows: int | None = None,
              max_window: int = 128 * 1024, wcap: int = 16,
              compact: bool = False):
        """cols/weights (n, W); zero-weight entries are padding, and their
        column is replaced by a window-friendly nearby real column.

        compact=True prepends a per-block distinct-column pre-gather
        (ChainedGather) so the main sweep's windows cover only the block's
        DISTINCT columns instead of their span — a ~6x lane-op cut on
        3D-bandwidth meshes (see CompactBellSpmv); falls back to the
        direct plan when the pre-gather cannot be planned."""
        n, W = cols.shape
        # bool weights = unit semantics without an E-sized f32 (the 8.9M
        # assembly plan build OOM'd a 125 GB host on such temporaries)
        w_np = np.asarray(weights)
        unit_in = w_np.dtype == np.bool_
        if not unit_in and w_np.dtype != np.float32:
            w_np = w_np.astype(np.float32)
        real = w_np if unit_in else (w_np != 0.0)
        deg = real.sum(axis=1).astype(np.int64)
        if wcap and int(deg.max(initial=0)) > wcap:
            return _build_split(cols,
                                w_np.astype(np.float32) if unit_in
                                else w_np,
                                real, deg, block_rows,
                                max_window, wcap, compact=compact)
        if block_rows is None:
            block_rows = _adaptive_block_rows(W)
        if compact:
            pre, cols2 = _compact_columns(
                np.asarray(cols), real, block_rows,
                max_window=max_window,
            )
            if pre is not None:
                main = PlannedGather.build(
                    cols2, w_np, block_rows, max_window, wcap=0,
                )
                if main is not None:
                    return ChainedGather(pre, main, n)
        cols = np.asarray(cols)
        if not real.any():
            return None
        # native planner path: pads ride as -1 and come back as the
        # sentinel — the fill-nearby-column and unit-mask passes disappear
        plan = None
        if cols.size and int(cols.max()) < 2**31:
            plan = _plan_native(
                np.where(real, cols, -1).astype(np.int32, copy=False),
                block_rows, max_window, _SLOT_CANDIDATES)
        from_native = plan is not None and plan is not False
        if plan is False:
            return None
        if plan is None:
            cols = np.asarray(cols, np.int64).copy()
            # pad columns -> the row's first real column; empty rows
            # forward-fill from the nearest non-empty row so they never
            # widen a window
            first = np.where(real.any(axis=1), cols[np.arange(n),
                             real.argmax(axis=1)], -1)
            idx = np.where(first >= 0, np.arange(n), -1)
            np.maximum.accumulate(idx, out=idx)
            if idx[0] < 0:
                nz = np.flatnonzero(first >= 0)
                if not len(nz):
                    return None
                idx[idx < 0] = nz[0]
            fill = first[idx]
            cols = np.where(real, cols, fill[:, None])
            plan = plan_windows_from_cols(
                cols.astype(np.int32), pad_target=int(fill[-1]),
                block_rows=block_rows, max_window=max_window,
            )
        if plan is None:
            return None
        nb, R = plan.n_blocks, plan.block_rows
        G = R * W // LANE
        # UNIT plan: every real weight is exactly 1.0 (assembly reductions,
        # ChainedGather stage-2 sums, compact pre-gathers) — drop the
        # (nb, G, LANE) f32 weights entirely and mark padding with the
        # _UNIT_PAD sentinel index instead (the sweep's row-match select
        # zeroes it).  Halves the plan's HBM footprint and saves a vector
        # multiply per tile; the 8.7 GB window-assembly plan at 1.9M nodes
        # OOM'd HBM by 1.28 GB without this (measured 2026-08-19).
        if unit_in or bool(np.all(w_np[real] == 1.0)):
            if from_native:
                # pads are already the sentinel — no masking pass
                lc = np.asarray(plan.lcols)
            else:
                m = np.zeros((nb * R, W), bool)
                m[:n] = real
                lc = np.asarray(plan.lcols).reshape(nb, R * W).copy()
                lc[~m.reshape(nb, R * W)] = _UNIT_PAD
            return PlannedGather(
                vals_tiled=None,
                lcols=jnp.asarray(lc.reshape(nb, G, LANE)),
                lo=jnp.asarray(plan.lo),
                key=(G, plan.slot_rows, nb),
                n_rows=n, width=W, need_rows=plan.need_rows,
            )
        wt = w_np
        if nb * R != n:
            wt = np.concatenate([wt, np.zeros((nb * R - n, W), np.float32)])
        return PlannedGather(
            vals_tiled=jnp.asarray(wt.reshape(nb, G, LANE)),
            lcols=jnp.asarray(plan.lcols),
            lo=jnp.asarray(plan.lo),
            key=(G, plan.slot_rows, nb),
            n_rows=n, width=W, need_rows=plan.need_rows,
        )

    @staticmethod
    def build_csr(indices: np.ndarray, indptr: np.ndarray,
                  block_rows: int | None = None,
                  max_window: int = 128 * 1024, wcap: int = 8,
                  weights: np.ndarray | None = None,
                  compact: bool = False):
        """y[r] = Σ_{k∈[indptr[r],indptr[r+1])} weights[k]·table[indices[k]]
        from CSR-style entry lists (no dense (n, K) intermediate).  Rows
        wider than wcap split into subrows (ChainedGather).  Returns None
        when no window plan exists."""
        indptr = np.asarray(indptr, np.int64)
        return PlannedGather.build_csr_deg(
            indices, np.diff(indptr), block_rows, max_window, wcap,
            weights=weights, compact=compact)

    @staticmethod
    def build_csr_deg(indices: np.ndarray, deg: np.ndarray,
                      block_rows: int | None = None,
                      max_window: int = 128 * 1024, wcap: int = 8,
                      weights: np.ndarray | None = None,
                      compact: bool = False):
        """build_csr from per-row entry counts (row r owns the next deg[r]
        indices); weights=None = unit (no ones array is materialized —
        at assembly scale that alone is ~0.7 GB)."""
        cvals = (None if weights is None
                 else np.asarray(weights, np.float32))
        return _build_split_compact(np.asarray(indices), cvals,
                                    np.asarray(deg), len(deg), block_rows,
                                    max_window, wcap, compact=compact)

    def __call__(self, table: "jnp.ndarray") -> "jnp.ndarray":
        G, slot_rows, nb = self.key
        R = G * LANE // self.width
        tp = table.astype(jnp.float32)
        need = self.need_rows * LANE
        n_t = -(-max(tp.shape[0], need) // LANE) * LANE
        tp = jnp.pad(tp, (0, n_t - tp.shape[0])).reshape(n_t // LANE, LANE)
        if self.vals_tiled is None:
            prods = _products_unit(self.lcols, self.lo, tp, self.key)
        else:
            prods = _products(self.vals_tiled, self.lcols, self.lo, tp,
                              self.key)
        out = self._row_sums(prods, nb, R)[: self.n_rows]
        return out.astype(table.dtype)

    def _row_sums(self, prods: "jnp.ndarray", nb: int,
                  R: int) -> "jnp.ndarray":
        """Per-row sums of the kernel's (nb, G, 128) product tiles.

        The generic reshape((nb·R, W)).sum(1) forces a physical relayout
        whose (8,128)-tiled form pads W up to 128 lanes — at assembly
        scale (51M subrows × W=8) that is a 26 GB HBM allocation (measured
        OOM on v5e, 2026-08-19).  When W divides 128 each lane tile holds
        exactly 128/W whole rows in order, so the row sums are one
        MXU contraction with a 0/1 lane-selection matrix — no relayout."""
        W = self.width
        if W == 1:
            # width-1 plans (coords gathers, compact pre-gathers): the
            # row sum is the identity — the lane-selection einsum below
            # would be a wasted full-table MXU pass (834 MB at 52M cells)
            return prods.reshape(nb * R)
        if LANE % W == 0:
            k = LANE // W
            sel = jnp.asarray(
                np.repeat(np.eye(k, dtype=np.float32), W, axis=0)
            )  # (128, k): lane l -> row-slot l//W
            # precision=HIGHEST: the default TPU matmul quantizes f32
            # inputs to bf16 — a silent ~0.4% error on every row sum
            # (caught by the on-TPU parity tests, 2026-08-19)
            s = jnp.einsum("bgl,lk->bgk", prods, sel,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            return s.reshape(nb * R)
        return prods.reshape(nb * R, W).sum(axis=1)

    def call_batched(self, tables: "jnp.ndarray") -> "jnp.ndarray":
        """Apply to a (B, n_table) stack of tables sharing this plan in ONE
        kernel (grid (nb, B)); returns (B, n_rows).  Exactly B scalar
        __call__s worth of math with a single emitted kernel body."""
        G, slot_rows, nb = self.key
        R = G * LANE // self.width
        B = tables.shape[0]
        tp = tables.astype(jnp.float32)
        need = self.need_rows * LANE
        n_t = -(-max(tp.shape[1], need) // LANE) * LANE
        tp = jnp.pad(tp, ((0, 0), (0, n_t - tp.shape[1])))
        tp = tp.reshape(B, n_t // LANE, LANE)
        if self.vals_tiled is None:
            prods = _products_b_unit(self.lcols, self.lo, tp, self.key)
        else:
            prods = _products_b(self.vals_tiled, self.lcols, self.lo, tp,
                                self.key)  # (nb, B, G, LANE)
        if self.width == 1:
            # identity row sums; a (B, nb*R, 1) intermediate would
            # tile-pad 1 -> 128 lanes (see _row_sums)
            out = prods.transpose(1, 0, 2, 3).reshape(B, nb * R)
            return out[:, : self.n_rows].astype(tables.dtype)
        out = prods.transpose(1, 0, 2, 3).reshape(B, nb * R, self.width)
        return out.sum(axis=2)[:, : self.n_rows].astype(tables.dtype)

    def with_weights_dtype(self, dtype) -> "PlannedGather":
        """Same plan, weights cast (bf16 halves the weight stream; kernel
        accumulation stays f32 — preconditioner-rate-only precision).
        Unit plans carry no weights — nothing to cast."""
        if self.vals_tiled is None:
            return self
        return PlannedGather(
            self.vals_tiled.astype(dtype), self.lcols, self.lo,
            self.key, self.n_rows, self.width, self.need_rows,
        )


def _planned_gather_flatten(g):
    return (
        (g.vals_tiled, g.lcols, g.lo),
        (g.key, g.n_rows, g.width, g.need_rows),
    )


def _planned_gather_unflatten(meta, data):
    return PlannedGather(data[0], data[1], data[2], *meta)


jax.tree_util.register_pytree_node(
    PlannedGather, _planned_gather_flatten, _planned_gather_unflatten
)


class ChainedGather:
    """Two-stage planned gather: wide rows split into ≤wcap subrows.

    stage1 computes the subrow partial sums (one window kernel over the
    original table); stage2 sums each row's subrows (a second, tiny window
    kernel whose indices are consecutive subrow ids — near-perfect
    windows).  Exactly equivalent to the unsplit gather up to f32 sum
    association."""

    def __init__(self, stage1: PlannedGather, stage2: PlannedGather,
                 n_rows: int):
        self.stage1 = stage1
        self.stage2 = stage2
        self.n_rows = n_rows

    def __call__(self, table: "jnp.ndarray") -> "jnp.ndarray":
        return self.stage2(self.stage1(table))

    def call_batched(self, tables: "jnp.ndarray") -> "jnp.ndarray":
        """(B, n_table) stack -> (B, n_rows), both stages batched."""
        return self.stage2.call_batched(self.stage1.call_batched(tables))

    def with_weights_dtype(self, dtype) -> "ChainedGather":
        # stage2's weights are structural 1.0s — casting them too keeps its
        # (tiny) stream half-width as well
        return ChainedGather(
            self.stage1.with_weights_dtype(dtype),
            self.stage2.with_weights_dtype(dtype),
            self.n_rows,
        )


jax.tree_util.register_pytree_node(
    ChainedGather,
    lambda g: ((g.stage1, g.stage2), (g.n_rows,)),
    lambda meta, data: ChainedGather(data[0], data[1], meta[0]),
)


def _compact_columns(cols, real, block_rows, stage1_rows=None,
                     max_window=128 * 1024):
    """Per-block distinct-column pre-gather.

    Returns (pre, remap): `pre` is a W=1 PlannedGather computing
    xc = x[uniq] (uniq = concatenated per-block sorted distinct real
    columns), and `remap` (n, W) holds each entry's index into xc —
    block b's entries land in xc[off_b : off_b + n_uniq_b], so the main
    plan's windows are exactly the per-block uniq runs.  Entries with
    real=False map to their block's first compact slot (their weight is
    zero).  (None, None) when the pre-gather cannot be planned."""
    n, W = cols.shape
    R = block_rows
    nb = -(-n // R)
    uniq = remap = None
    import os as _os2

    if (cols.size and int(cols.max(initial=0)) < 2**31
            and _os2.environ.get("AFEM_NATIVE_UNIQ") == "1"):
        # native per-block sort+unique+remap (amg_setup.cpp).  MEASURED
        # NEGATIVE at 1.9M (3.7s vs the numpy loop's 2.9s — the per-block
        # sort dominates both and numpy's is as good); kept opt-in for
        # machines where numpy is the slower one
        from ..utils.native import compact_uniq_native

        nat = compact_uniq_native(
            np.where(real, cols, -1).astype(np.int32), R)
        if nat is not None:
            uniq, remap_n = nat  # remap_n is (n, W) — no pad rows
            remap = np.empty((nb * R, W), np.int64)
            remap[:n] = remap_n
            remap[n:] = 0
    if uniq is None:
        # int32 index space at scale (values and compact positions both
        # < 2^31 at every size in use) — the int64 form doubled the
        # 8.9M assembly build's footprint (OOM, round 5)
        idt = (np.int32 if (cols.size == 0
                            or int(cols.max(initial=0)) < 2**31)
               else np.int64)
        cp = np.full((nb * R, W), -1, idt)
        cp[:n] = np.where(real, cols, -1)
        uniqs, off = [], 0
        remap = np.empty((nb * R, W), idt)
        for b in range(nb):
            blk = cp[b * R : (b + 1) * R]
            m = blk >= 0
            if not m.any():
                uniqs.append(np.zeros(1, idt))
                remap[b * R : (b + 1) * R] = off
                off += 1
                continue
            u, inv = np.unique(blk[m], return_inverse=True)
            rm = np.full(blk.shape, off, idt)
            rm[m] = (off + inv).astype(idt)
            remap[b * R : (b + 1) * R] = rm
            uniqs.append(u)
            off += len(u)
        del cp
        uniq = np.concatenate(uniqs)
    pre = None
    import os as _os

    if _os.environ.get("AFEM_BAND_PRE", "0") == "1":
        # banded tile pre-gather (band_gather.py): per-tile K-row bands
        # for the sorted request stream, ~4-6x fewer sweep steps than the
        # span sweep at 1.9M (VERDICT r4 #2).  The narrow/wide tile
        # permutation is baked into remap here — downstream windows see
        # each uniq run as <=2 contiguous clusters, no runtime merge.
        from .band_gather import BandedGather

        band, perm = BandedGather.build(uniq, max_window=max_window)
        if band is not None:
            pre = band
            remap = perm[remap // 128] * 128 + remap % 128
    if pre is None:
        if stage1_rows is None:
            # pre-block size: larger blocks mean fewer grid steps and
            # slot DMAs (the leg0 cost class — band A/B showed the sweep
            # is NOT the binding constraint) at wider windows; A/B via
            # AFEM_PRE_ROWS (must be a multiple of 128)
            stage1_rows = int(_os.environ.get("AFEM_PRE_ROWS", "1024"))
        pre = PlannedGather.build(
            uniq[:, None], np.ones((len(uniq), 1), np.bool_),
            block_rows=stage1_rows, max_window=max_window, wcap=0,
        )
    if pre is None:
        return None, None
    return pre, remap[:n]


def _build_split(cols, w_np, real, deg, block_rows, max_window, wcap,
                 compact=False):
    """Split rows with >wcap real entries into subrows; see PlannedGather."""
    n, _ = cols.shape
    cols = np.asarray(cols, np.int64)
    # row-major compaction of the real entries
    ccols = cols[real]
    cvals = w_np[real]
    return _build_split_compact(ccols, cvals, deg, n, block_rows,
                                max_window, wcap, compact=compact)


def _split_stage2(n, nsub, total, block_rows, max_window):
    """Stage-2 of a split plan: sum each row's consecutive subrow ids.
    Near-perfect windows (consecutive integers); unit weights."""
    nsub = np.asarray(nsub, np.int64)
    W2 = max(1, int(nsub.max(initial=0)))
    # round W2 up to a divisor of 128 so the row-sum stays the fused MXU
    # contraction (_row_sums): a non-divisor width falls back to the
    # padded-relayout reduce, which is a 24 GB HBM bomb at 47M rows
    while LANE % W2:
        W2 += 1
    sub_start = np.concatenate([[0], np.cumsum(nsub)])
    base = (sub_start[:-1, None] + np.arange(W2)[None, :]).astype(np.int32)
    o_w = np.arange(W2)[None, :] < nsub[:, None]
    o_cols = np.where(o_w, base, 0)
    import os as _os3

    if _os3.environ.get("AFEM_BAND_PRE", "0") == "1":
        # flattened row-major the stream is globally sorted with ~1-2
        # steps per row — every tile narrow, K-step band sweep (~9x on
        # the 1.9M leg2); falls through when any tile lands wide
        from .band_gather import BandedGather, BandedRowSum

        band, _ = BandedGather.build(
            base.reshape(-1).astype(np.int64), max_window=max_window,
            valid=o_w.reshape(-1), min_narrow_frac=0.999,
        )
        if band is not None and band.wide is None:
            return BandedRowSum(band, W2, n)
    return PlannedGather.build(o_cols, o_w.astype(np.float32), block_rows,
                               max_window, wcap=0)


def _build_split_compact(ccols, cvals, deg, n, block_rows, max_window, wcap,
                         compact=False):
    """_build_split on already-compacted CSR-style entries: row r owns
    ccols/cvals[deg[:r].sum() : deg[:r+1].sum()].  Avoids materializing the
    dense (n, K) cols/weights — at assembly scale (n_slots=38M, K≈30 on
    the 2.1M sphere_cut) the dense form alone is ~9 GB."""
    # native fast path for UNIT weights (the assembly reducer, compact
    # pre-gathers): subrow layout + stage-1 plan entirely in planner.cpp —
    # no (total, wcap) int64/float32 numpy temporaries, pads ride as -1
    unit = cvals is None or bool(np.all(cvals == 1.0))
    if (not compact and _native_plan_enabled() and unit
            and (len(ccols) == 0 or int(np.max(ccols)) < 2**31)):
        from ..utils.native import subrow_cols_native

        nat = subrow_cols_native(ccols, deg, wcap)
        if nat is not None:
            s_cols_n, nsub_n = nat
            total_n = s_cols_n.shape[0]
            R1 = block_rows or _adaptive_block_rows(wcap)
            p1 = _plan_native(s_cols_n, R1, max_window, _SLOT_CANDIDATES)
            if p1 is False:
                return None
            if p1 is not None:
                stage1 = PlannedGather(
                    vals_tiled=None,
                    lcols=jnp.asarray(p1.lcols),
                    lo=jnp.asarray(p1.lo),
                    key=(R1 * wcap // LANE, p1.slot_rows, p1.n_blocks),
                    n_rows=total_n, width=wcap, need_rows=p1.need_rows,
                )
                stage2 = _split_stage2(n, nsub_n, total_n, block_rows,
                                       max_window)
                if stage2 is None:
                    return None
                return ChainedGather(stage1, stage2, n)
        # no native stage-1 plan/library: fall through to the numpy path

    # memory diet (round 5): the 8.9M compact ASSEMBLY build OOM-killed a
    # 125 GB host at int64 scale (E=834M entries) — everything below
    # stays int32/bool where the value range allows, no E-sized int64
    # temporaries, and unit weights are never materialized as f32.
    E = len(ccols)
    lean = E > (1 << 26) and (E == 0 or int(np.max(ccols)) < 2**31)
    if lean:
        ccols = np.asarray(ccols, np.int32)
    nsub = -(-deg // wcap)
    if not compact:
        # span-bound (non-compact) sweeps: deg==0 rows KEEP a padding
        # subrow.  Dropping them does not cut sweep work (sum of window
        # rows is invariant — fewer blocks x proportionally wider spans)
        # but DOES widen each block's source span past max_window at 3D
        # scale (measured: the 1.9M window-assembly plan stopped building,
        # q7_jacobi 2026-08-19).  Compact sweeps window the per-block
        # DISTINCT sources instead, so there the empty subrows are pure
        # waste (19M of 51M stage-1 subrows at 1.9M) and are dropped.
        nsub = np.maximum(1, nsub)
    total = int(nsub.sum())
    idt = np.int32 if (lean and total < 2**31 and E < 2**31) else np.int64
    sub_start = np.concatenate([[0], np.cumsum(nsub)]).astype(idt)
    ent_start = np.concatenate([[0], np.cumsum(deg)]).astype(idt)
    pos = np.arange(E, dtype=idt)
    pos -= np.repeat(ent_start[:-1], deg)
    sub_idx = np.repeat(sub_start[:-1], deg)
    sub_idx += pos // wcap
    np.mod(pos, wcap, out=pos)
    slot = pos  # pos reused in place — no second E-sized array
    cdtype = np.int32 if lean else np.int64
    s_cols = np.zeros((total, wcap), cdtype)
    s_cols[sub_idx, slot] = ccols
    s_valid = np.zeros((total, wcap), bool)
    if cvals is None:
        s_valid[sub_idx, slot] = True
        s_w = None  # unit — never materialize an E-sized f32
    else:
        s_w = np.zeros((total, wcap), np.float32)
        s_w[sub_idx, slot] = cvals
        s_valid = s_w != 0.0
    del sub_idx, pos
    # zero-weight REAL entries would be dropped by the stage-1 pad logic;
    # nudge them to a tiny non-zero so the linear map stays exact enough
    # is unnecessary: a zero weight contributes zero either way.
    stage1 = None
    if compact:
        R1 = block_rows or _adaptive_block_rows(wcap)
        pre, s_cols2 = _compact_columns(s_cols, s_valid, R1,
                                        max_window=max_window)
        if pre is not None:
            main = PlannedGather.build(
                s_cols2, s_valid if s_w is None else s_w, R1, max_window,
                wcap=0)
            if main is not None:
                stage1 = ChainedGather(pre, main, total)
        if stage1 is None:
            # the subrow layout above dropped empty rows (compact-only
            # optimization); rebuild in the padded non-compact form
            return _build_split_compact(ccols, cvals, deg, n, block_rows,
                                        max_window, wcap, compact=False)
    else:
        stage1 = PlannedGather.build(
            s_cols, s_valid if s_w is None else s_w, block_rows,
            max_window, wcap=0)
    if stage1 is None:
        return None
    stage2 = _split_stage2(n, nsub, total, block_rows, max_window)
    if stage2 is None:
        return None
    return ChainedGather(stage1, stage2, n)


def _cached_spmv(topo):
    """Per-topology kernel cache, stored on the object (id()-keyed dicts
    can alias after garbage collection).

    The exhaustive window sweep is the default: the diagonal-coherent
    sorted kernel (pallas_spmv_diag.py) needs ~5x fewer probes per tile
    but each dynamic-fori_loop probe costs ~15x a sweep step, measuring
    3x SLOWER at 531k nodes on v5e (tools/bench_spmv.py 80: window
    6.7 ms vs diag 21.7 ms vs XLA 62 ms).  AFEM_SPMV=diag opts in for
    experimentation; AFEM_SPMV=compact opts into the two-stage
    column-compaction sweep (CompactBellSpmv, ~6x fewer lane-ops on the
    2.1M sphere_cut plan model)."""
    import os

    mode = os.environ.get("AFEM_SPMV")
    sp = getattr(topo, "_pallas_spmv", None)
    # the cache is mode-keyed: a kernel built (or unpickled from an old
    # hierarchy cache) under another AFEM_SPMV must not silently serve
    # this one — rebuild for the requested mode instead
    if sp is not None and getattr(topo, "_pallas_spmv_mode", None) != mode:
        sp = None
    if sp is None:
        if mode == "diag":
            from .pallas_spmv_diag import DiagBellSpmv

            sp = DiagBellSpmv(topo)
        elif mode == "compact":
            sp = CompactBellSpmv(topo)
        if sp is None or not sp.available:
            sp = PallasBellSpmv(topo)
        topo._pallas_spmv = sp
        topo._pallas_spmv_mode = mode
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

    def __init__(self, values, topo, block=1, cols=None, plan_arrays=None,
                 plan_kind=None):
        from .bell import BellMatrix

        self._bell = BellMatrix(values=values, topo=topo, block=block,
                                cols=cols)
        if plan_arrays is None:
            sp = _cached_spmv(topo)
            plan_arrays = (
                sp.device_arrays() if hasattr(sp, "device_arrays") else None
            )
            plan_kind = type(sp).__name__
        self._plan_arrays = plan_arrays
        self._plan_kind = plan_kind

    # plan arrays are kernel-MODE-specific (window: 2-tuple, compact:
    # 3-tuple).  Pickled hierarchies (bench AMG cache) must not bake in
    # the mode they were built under — drop the arrays on pickle and
    # regenerate for the CURRENT mode's kernel on load.
    def __getstate__(self):
        return {"_bell": self._bell, "_plan_arrays": self._plan_arrays,
                "_plan_kind": getattr(self, "_plan_kind", None)}

    def __setstate__(self, state):
        self._bell = state["_bell"]
        sp = _cached_spmv(self._bell.topo)
        if state.get("_plan_kind") == type(sp).__name__:
            self._plan_arrays = state["_plan_arrays"]
        else:
            self._plan_arrays = (
                sp.device_arrays() if hasattr(sp, "device_arrays") else None
            )
        self._plan_kind = type(sp).__name__

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
            plan_kind=getattr(self, "_plan_kind", None),
        )


def _pallas_matrix_flatten(m):
    return (
        (m._bell.values, m._bell.cols, m._plan_arrays),
        (m._bell.topo, m._bell.block, getattr(m, "_plan_kind", None)),
    )


def _pallas_matrix_unflatten(meta, data):
    return PallasBellMatrix(values=data[0], topo=meta[0], block=meta[1],
                            cols=data[1], plan_arrays=data[2],
                            plan_kind=meta[2] if len(meta) > 2 else None)


jax.tree_util.register_pytree_node(
    PallasBellMatrix, _pallas_matrix_flatten, _pallas_matrix_unflatten
)


class CompactBellSpmv:
    """Two-stage column-compaction window SpMV.

    The plain window sweep's cost is (request tiles) × (window rows), and a
    3D RCM block's columns span ~2·bandwidth ≈ 130k nodes (VL ≈ 350 rows
    after multi-slot splitting at 1.9M) while touching only ~2.6k DISTINCT
    columns.  Splitting the gather fixes the mismatch:

      stage 1: xc = x[uniq]  — per-block sorted distinct columns, gathered
               by a narrow (W=1) planned gather whose own requests are
               sorted, so ITS windows shrink with the multi-slot planner;
      stage 2: the original sweep, but over window-LOCAL compact indices —
               each block's window is exactly its own uniq run (VL ≈ 32).

    Plan-model cost on the 2.1M sphere_cut: 130M lane-op units direct vs
    9.6M (stage 1, R1=512) + 11.8M (stage 2) ≈ 6.1x fewer.  Same linear
    map: every entry multiplies the same x value, re-routed through xc.

    Interface-compatible with PallasBellSpmv (available / device_arrays /
    __call__(values, x, plan_arrays)).
    """

    STAGE1_ROWS = 1024  # fewer, fatter grid steps than 512 (G=8, VL~176)

    def __init__(self, topo: Topology, block_rows: int | None = None):
        n, W = topo.n_nodes, topo.width
        R = block_rows or _adaptive_block_rows(W)
        self.topo = topo
        self.plan2 = None
        if (R * W) % LANE:
            return
        cols = np.asarray(topo.ell_cols, np.int64)
        valid = np.asarray(topo.ell_valid, bool).reshape(n, W)
        pg1, remap = _compact_columns(cols, valid, R,
                                      stage1_rows=self.STAGE1_ROWS)
        if pg1 is None:
            return
        plan2 = plan_windows_from_cols(
            remap.astype(np.int32), int(remap.max()), block_rows=R
        )
        if plan2 is None:
            return
        self.plan2 = plan2
        self._pg1 = pg1
        self._lcols2 = jnp.asarray(plan2.lcols)
        self._lo2 = jnp.asarray(plan2.lo)
        self._key2 = (R * W // LANE, plan2.slot_rows, plan2.n_blocks)
        self._n_compact = pg1.n_rows

    @property
    def available(self) -> bool:
        return self.plan2 is not None

    def device_arrays(self) -> tuple:
        """Pytree-carriable plan data: (stage-1 PlannedGather — itself a
        registered pytree — stage-2 lcols, stage-2 lo)."""
        return (self._pg1, self._lcols2, self._lo2)

    def __call__(self, values: jnp.ndarray, x: jnp.ndarray,
                 plan_arrays: tuple | None = None) -> jnp.ndarray:
        assert self.plan2 is not None
        pg1, lcols2, lo2 = plan_arrays if plan_arrays is not None else (
            self._pg1, self._lcols2, self._lo2
        )
        p = self.plan2
        n, W = self.topo.n_nodes, self.topo.width
        R, nb = p.block_rows, p.n_blocks
        G = R * W // LANE
        vals = values.reshape(n, W).astype(jnp.float32)
        if nb * R != n:
            vals = jnp.pad(vals, ((0, nb * R - n), (0, 0)))
        vals_tiled = vals.reshape(nb, G, LANE)
        xc = pg1(x.astype(jnp.float32))  # compact per-block column table
        need = p.need_rows * LANE
        n_c = -(-max(xc.shape[0], need) // LANE) * LANE
        xc = jnp.pad(xc, (0, n_c - xc.shape[0])).reshape(n_c // LANE, LANE)
        prods = _products(vals_tiled, lcols2, lo2, xc, self._key2)
        y = prods.reshape(nb * R, W).sum(axis=1)
        return y[:n].astype(x.dtype)


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
