"""Pallas window-gather assembly for general (unstructured) meshes.

XLA segment_sum runs ~0.11 Gelem/s on v5e, which bounds the general BELL
assembly (sparse/bell.py) to ~1 MDoF/s.  This inverts the scatter into a
gather: at plan time every flat ELL slot gets the (padded, fixed-K) list of
element-entry indices that contribute to it, so assembly becomes

    values[slot] = sum_k ke_flat[src[slot, k]]

— the "gather K sources per row and reduce" primitive of the window SpMV
kernel (sparse/pallas_spmv.py::gather_sum_rows), with zero weights masking
the padding.  Locality requirement: after RCM node ordering and min-node
cell sorting (utils/ordering.py), the entries feeding a block of slots sit
in a contiguous window of the cell-major entry array; plan() returns None
when any window exceeds the VMEM budget (fall back to segment_sum).

Measured (v5e, 491k-node tria mesh): exact vs segment_sum, 1.6x faster
(69 ms vs 114 ms).  The entry window is ~npc² wider than the SpMV's node
window, so the 128-lane chunk sweep dominates; the round-2 fix is ordering
requests by source entry so each request tile touches 1-2 chunks
(ROADMAP.md #2), which applies to this gather unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_spmv import (
    PlannedGather,
    gather_sum_rows,
    plan_windows_from_cols,
)
from .topology import Topology

# tetra upper-triangle (i<=j) local pair -> packed index 0..9 (row-major:
# (0,0),(0,1),...,(3,3)) — the lane-major ke10 stacking order of
# ops/lane_assembly.py; Q2P16 maps the full ordered pair q=i*4+j onto it
TRI10 = {
    (i, j): k
    for k, (i, j) in enumerate((i, j) for i in range(4) for j in range(i, 4))
}
Q2P16 = np.array(
    [TRI10[(min(i, j), max(i, j))] for i in range(4) for j in range(4)],
    np.int64,
)


class PallasAssembler:
    """values = assemble(element matrices) via window gathers."""

    def __init__(self, topo: Topology, block_rows: int = 512,
                 max_window: int = 32 * 1024):
        self.topo = topo
        slots = np.concatenate(
            [topo.slot_maps[k].reshape(-1) for k in topo.slot_maps]
        )
        E = slots.shape[0]
        order = np.argsort(slots, kind="stable").astype(np.int64)
        ssorted = slots[order]
        counts = np.bincount(ssorted, minlength=topo.n_slots)
        K = max(int(counts.max()), 1)
        ptr = np.zeros(topo.n_slots + 1, np.int64)
        np.cumsum(counts, out=ptr[1:])
        pos = np.arange(E, dtype=np.int64) - ptr[ssorted]
        src = np.full((topo.n_slots, K), -1, np.int64)
        src[ssorted, pos] = order
        self.K = K
        self.E = E
        self.mask = (src >= 0).astype(np.float32)
        # planning needs in-range sources for padding slots; empty slots
        # (BELL pad entries) forward-fill from the nearest real slot so
        # they never widen a block's window
        first = src[:, 0].copy()
        real = first >= 0
        if not real.any():
            raise ValueError("empty topology")
        idx = np.where(real, np.arange(topo.n_slots), -1)
        np.maximum.accumulate(idx, out=idx)
        lead = idx < 0  # leading empties: backfill from the first real slot
        idx[lead] = int(np.argmax(real))
        fallback = first[idx]
        src_plan = np.where(src >= 0, src, fallback[:, None]).astype(np.int32)
        self.plan = plan_windows_from_cols(
            src_plan, pad_target=int(fallback[-1]), block_rows=block_rows,
            max_window=max_window,
        )
        if self.plan is not None:
            self._weights = jnp.asarray(self.mask)

    @property
    def available(self) -> bool:
        return self.plan is not None

    def __call__(self, mats: dict) -> jnp.ndarray:
        """mats: cell-type -> (nc, npc, npc) element matrices (scalar).
        Returns flat (n_slots,) BELL values (f32)."""
        ke = jnp.concatenate(
            [mats[k].reshape(-1) for k in self.topo.slot_maps]
        )
        return gather_sum_rows(self.plan, ke, weights=self._weights)


class ReorderedAssembler:
    """Scatter-free 3D tetra assembly: per-ordered-pair entry streams.

    SortedEntryAssembler fails on 3D meshes because slot-sorted sources
    span a solid ~1.5M-entry band of the cell-major entry array (see its
    docstring).  Separating entries by their LOCAL ordered corner pair
    (ki, kj) — stream (ki, kj) sorts cells by the destination row
    conn[:, ki] and gathers from ONE contiguous lane of the (10, nc)
    lane-major ke table — shrinks each stream's source span to the CELL
    bandwidth.  Two stages:

      1. 16 permutation gathers — stream (ki,kj) reads ke10[pair_row]
         in conn[:,ki]-sorted order;
      2. one width-capped reduce over the concatenated streams
         (PlannedGather.build_csr) — a slot block's sources sit in ≤16
         tiny per-stream regions (the planner's multi-window S=16).

    **Measured limit (2.1M sphere_cut): still unplannable.** The stream
    source span is bw_nodes × cells/node ≈ 16k × 5.9 ≈ 94-111k entries
    per 16k-request block — a solid band at the 128k window budget, and
    even if planned the sweep cost (~860 rows/block) models to ~1.4-1.7 s
    vs segment_sum's 2.8 s.  Every reorder of E entries from cell order
    to node order pays a bandwidth-proportional window; this class is
    kept as the documented negative result (it plans on 2D/narrow
    meshes).  See ROADMAP.md "The scatter tax".

    Role reference: CUDA atomic assembly BSRFormat.h:842-898; the
    stream-by-corner discipline is the node-wise atomic-free idea
    (NodeWiseCsrBiliAssembly.cc) turned into plan-time sorts.
    """

    # upper-triangle pair -> packed 0..9 (row-major), mirrors for j<i
    _PAIRS = [(i, j) for i in range(4) for j in range(4)]

    def __init__(self, topo: Topology, conn: np.ndarray,
                 wcap: int = 8, max_window: int = 128 * 1024):
        self.topo = topo
        conn = np.asarray(conn, np.int64)
        nc = conn.shape[0]
        self.n_cells = nc
        tri10 = TRI10
        sm = np.asarray(
            topo.slot_maps["tetra4"], np.int64
        ).reshape(conn.shape[0], 16)  # cell-major, q = i*4+j

        ones = np.ones((nc, 1), np.float32)
        plans, rows10, dest = [], [], []
        for q16, (ki, kj) in enumerate(self._PAIRS):
            order = np.argsort(conn[:, ki], kind="stable")
            p = PlannedGather.build(
                order.reshape(-1, 1), ones,
                max_window=max_window, wcap=0,
            )
            if p is None:
                self.plans = None
                return
            plans.append(p)
            rows10.append(tri10[(min(ki, kj), max(ki, kj))])
            dest.append(sm[order, q16])
        slots = np.concatenate(dest)  # (16·nc,) concat-layout destinations
        order2 = np.argsort(slots, kind="stable")
        counts = np.bincount(slots, minlength=topo.n_slots)
        ptr = np.zeros(topo.n_slots + 1, np.int64)
        np.cumsum(counts, out=ptr[1:])
        self.reduce = PlannedGather.build_csr(
            order2, ptr, wcap=wcap, max_window=max_window
        )
        self.plans = None if self.reduce is None else plans
        self.rows10 = rows10

    @property
    def available(self) -> bool:
        return self.plans is not None

    @property
    def apply(self) -> "_ReorderedApply":
        """Pytree-shaped callable for passing through jit boundaries."""
        t = self.topo
        return _ReorderedApply(
            self.plans, self.reduce, self.rows10, t.n_nodes, t.width
        )

    def __call__(self, ke10: "jnp.ndarray") -> "jnp.ndarray":
        """ke10: (10, nc) lane-major upper-triangle element entries.
        Returns (N, W) BELL values."""
        return self.apply(ke10)


class _ReorderedApply:
    """Pytree-shaped apply closure of a ReorderedAssembler: callable on
    the (10, nc) lane-major ke stack, returns (N, W)."""

    def __init__(self, plans, reduce, rows10, n, w):
        self.plans = tuple(plans)
        self.reduce = reduce
        self.rows10 = tuple(rows10)
        self.n = n
        self.w = w

    def __call__(self, ke10):
        segs = [p(ke10[r]) for p, r in zip(self.plans, self.rows10)]
        return self.reduce(jnp.concatenate(segs)).reshape(self.n, self.w)


jax.tree_util.register_pytree_node(
    _ReorderedApply,
    lambda m: ((m.plans, m.reduce), (m.rows10, m.n, m.w)),
    lambda meta, data: _ReorderedApply(data[0], data[1], *meta),
)


class SortedEntryAssembler:
    """BELL assembly as a width-capped split window gather (ChainedGather).

    Entries are argsorted by slot ONCE on the host and the reduction
    becomes PlannedGather.build_csr(order, ptr): subrows of ≤wcap sources
    swept by the window kernel, then a tiny second-stage sum — the exact
    mechanism the wide-row SpMV already uses (pallas_spmv.ChainedGather).
    Beats segment_sum (scatter, ~0.07 Gelem/s on v5e) when a window plan
    exists.

    **Scale limit (measured on the 2.1M sphere_cut):** the plan exists
    only for 2D/narrow-band meshes.  In slot order, the sources of 8k
    consecutive entries span ~1.5–1.9M cell-major positions with NO
    outlier tail (p50 1.54M vs 98%-quantile 1.54M — a solid band, width
    ≈ RCM bandwidth × entries/cell), so no VMEM window covers them and
    `available` is False; callers fall back to segment_sum.  See
    ROADMAP.md "The scatter tax" for the full analysis.

    Role reference: the CUDA atomic assembly BSRFormat.h:842-898; the
    sort+scan discipline mirrors computeSparsityAtomic's packed-edge sort
    (BSRFormat.h:602-688) moved to plan time.
    """

    def __init__(self, topo: Topology, wcap: int = 8,
                 max_window: int = 128 * 1024,
                 entry_map: np.ndarray | None = None,
                 compact: bool = False):
        """entry_map: optional (E,) remap of global entry ids into the
        table the caller will pass to __call__ — e.g. the symmetric
        packing that redirects lower-triangle ke entries at their upper
        twins (ke is symmetric), shrinking the table (and the windows)
        by 6/16 for tetra.

        compact: apply the same per-block distinct-column pre-gather the
        fast SpMV uses (CompactBellSpmv) — the direct sweep pays
        span-sized windows per subrow block (each cell-major source band
        is re-streamed for every block that touches it), while the
        compact form streams each block's DISTINCT sources once and
        sweeps uniq-sized windows."""
        self.topo = topo
        sms = [np.asarray(topo.slot_maps[k]).reshape(-1)
               for k in topo.slot_maps]
        slots = sms[0] if len(sms) == 1 else np.concatenate(sms)
        # native counting-sort path (planner.cpp): argsort + entry_map
        # gather + bincount in O(E) C++ passes — the grouped indices stay
        # int32 end-to-end (the i64 sort/gather alone is ~5s per 22M
        # entries on the 1-CPU host)
        nat = None
        if (topo.n_slots < 2**31
                and (entry_map is None
                     or entry_map.dtype == np.int32
                     or (len(entry_map)
                         and int(entry_map.max()) < 2**31))):
            from ..utils.native import group_by_slot_native

            nat = group_by_slot_native(slots, entry_map, topo.n_slots)
        if nat is not None:
            indices, deg = nat
            self.plan = PlannedGather.build_csr_deg(
                indices, deg, wcap=wcap, max_window=max_window,
                compact=compact,
            )
        else:
            slots = slots.astype(np.int64)
            order = np.argsort(slots, kind="stable")
            counts = np.bincount(slots, minlength=topo.n_slots)
            ptr = np.zeros(topo.n_slots + 1, np.int64)
            np.cumsum(counts, out=ptr[1:])
            indices = order if entry_map is None else entry_map[order]
            self.plan = PlannedGather.build_csr(
                indices, ptr, wcap=wcap, max_window=max_window,
                compact=compact,
            )

    @property
    def available(self) -> bool:
        return self.plan is not None

    def __call__(self, ke_flat: jnp.ndarray) -> jnp.ndarray:
        """ke_flat: flat cell-major element-matrix entries, concatenated
        over cell types in topo.slot_maps order (entry id = base_ct +
        c*npc² + i*npc + j).  Returns (N, W) BELL values."""
        t = self.topo
        return self.plan(ke_flat).reshape(t.n_nodes, t.width)
