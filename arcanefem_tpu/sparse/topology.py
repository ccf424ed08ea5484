"""Sparsity topology + assembly slot maps (host NumPy, built once per mesh).

TPU-native replacement for the reference's BSRFormat sparsity builders
(reference femutils/BSRFormat.h:353-781: packed-edge sort + atomic
neighbor count + exclusive-scan row index + atomic column scatter).

On TPU there are no fast atomics, so the whole "find the nnz slot for
(row,col) at every write" discipline (BSRFormat.h:145 findValueIndex)
is inverted: we precompute, once per (mesh, dof-layout), a *static slot
index* for every (cell, i, j) entry.  Assembly then becomes a batched
element-matrix computation + one segment-sum — deterministic by
construction (the reference's "atomic-free" variant is the same idea,
BSRFormat.h:938-1100).

Primary device layout is **BELL (blocked ELLPACK)**: every block-row is
padded to a fixed width W.  This trades ~(W/avg_degree - 1) padding for
perfectly regular gathers — the shape XLA/TPU wants — and makes SpMV a
gather + small-einsum + row-reduction with zero scatters.  A CSR view of
the same topology is kept for interop/tests (the role of
BSRMatrix::toCsr, BSRFormat.h:194-256).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(eq=False)
class Topology:
    """Node-graph sparsity of one mesh + per-bucket assembly slot maps.

    ``eq=False``: instances compare by identity so they can serve as static
    (hashable) jit-cache keys inside BellMatrix pytrees.
    """

    n_nodes: int
    width: int  # ELL row width W (max node degree incl. self)
    ell_cols: np.ndarray  # (n_nodes, W) int32; padding entries = own row id
    ell_valid: np.ndarray  # (n_nodes, W) bool; False on padding
    # CSR view of the same graph
    row_ptr: np.ndarray  # (n_nodes+1,) int32
    csr_cols: np.ndarray  # (nnz,) int32
    csr_to_ell: np.ndarray  # (nnz,) int32 flat ELL slot of each CSR entry
    diag_slot: np.ndarray  # (n_nodes,) int32 flat ELL slot of the diagonal
    # per cell-bucket: (cell_conn, slot_map) where slot_map is
    # (nc, npc, npc) int32 of flat ELL block slots
    slot_maps: dict[str, np.ndarray]

    def __getstate__(self):
        # drop derived caches (e.g. the _pallas_spmv kernel attached by
        # sparse/pallas_spmv._cached_spmv): they are mode-dependent and
        # would bloat pickled AMG hierarchies with whole kernel plans
        d = dict(self.__dict__)
        for k in list(d):
            if k.startswith("_"):
                d.pop(k)
        return d

    @property
    def nnz(self) -> int:
        return int(self.csr_cols.shape[0])

    @property
    def n_slots(self) -> int:
        return self.n_nodes * self.width


def build_topology(
    n_nodes: int,
    buckets: dict[str, np.ndarray],
    pad_width_to: int = 1,
    use_native: bool = True,
) -> Topology:
    """Build the node-pair sparsity graph of a mesh.

    buckets: cell-type -> (nc, npc) int32 connectivity. The sparsity is the
    union over cells of all (node_i, node_j) pairs — identical to the set
    built by BSRFormat::computeSparsity (BSRFormat.h:401-402: nnz =
    2*nb_edges + nb_nodes for P1 simplices).

    pad_width_to: round W up to a multiple (lane-friendly widths help XLA).

    Uses the native C++ builder (native/topology.cpp, the reference's
    BSRFormat-sparsity role) when available; NumPy fallback otherwise.
    """
    if use_native and buckets:
        from ..utils.native import build_topology_native

        out = build_topology_native(n_nodes, buckets, pad_width_to)
        if out is not None:
            width, row_ptr, csr_cols, csr_to_ell, diag_slot, ell_cols, ell_valid, smaps = out
            return Topology(
                n_nodes=n_nodes,
                width=int(width),
                ell_cols=ell_cols,
                ell_valid=ell_valid,
                row_ptr=row_ptr.astype(np.int64),
                csr_cols=csr_cols,
                csr_to_ell=csr_to_ell,
                diag_slot=diag_slot,
                slot_maps=smaps,
            )
    keys = []
    entry_counts = []
    for conn in buckets.values():
        nc, npc = conn.shape
        c64 = conn.astype(np.int64)
        rows = np.repeat(c64, npc, axis=1)  # (nc, npc*npc) row-major i
        cols = np.tile(c64, (1, npc))  # j fastest
        keys.append((rows * n_nodes + cols).ravel())
        entry_counts.append(nc * npc * npc)
    all_keys = (
        np.concatenate(keys) if keys else np.zeros(0, np.int64)
    )

    uniq, inverse = np.unique(all_keys, return_inverse=True)
    rows = (uniq // n_nodes).astype(np.int32)
    cols = (uniq % n_nodes).astype(np.int32)

    counts = np.bincount(rows, minlength=n_nodes).astype(np.int32)
    width = int(counts.max()) if len(counts) else 1
    if pad_width_to > 1:
        width = -(-width // pad_width_to) * pad_width_to

    row_ptr = np.zeros(n_nodes + 1, np.int32)
    np.cumsum(counts, out=row_ptr[1:])
    pos_in_row = np.arange(len(uniq), dtype=np.int32) - row_ptr[rows]
    csr_to_ell = rows.astype(np.int64) * width + pos_in_row
    csr_to_ell = csr_to_ell.astype(np.int32)

    ell_cols = np.tile(
        np.arange(n_nodes, dtype=np.int32)[:, None], (1, width)
    )  # padding col = own row (safe gather, zero value)
    ell_valid = np.zeros((n_nodes, width), bool)
    ell_cols[rows, pos_in_row] = cols
    ell_valid[rows, pos_in_row] = True

    diag_csr = np.searchsorted(uniq, np.arange(n_nodes, dtype=np.int64) * (n_nodes + 1))
    diag_slot = csr_to_ell[np.minimum(diag_csr, len(uniq) - 1)]

    slot_maps: dict[str, np.ndarray] = {}
    off = 0
    entry_slots = csr_to_ell[inverse]
    for name, conn in buckets.items():
        nc, npc = conn.shape
        n = nc * npc * npc
        slot_maps[name] = entry_slots[off : off + n].reshape(nc, npc, npc)
        off += n

    return Topology(
        n_nodes=n_nodes,
        width=width,
        ell_cols=ell_cols,
        ell_valid=ell_valid,
        row_ptr=row_ptr,
        csr_cols=cols,
        csr_to_ell=csr_to_ell,
        diag_slot=diag_slot,
        slot_maps=slot_maps,
    )


def face_dof_slots(
    topo: Topology, face_rows: np.ndarray, face_cols: np.ndarray
) -> np.ndarray:
    """Flat ELL slots for arbitrary (row_node, col_node) pairs.

    Used by boundary-element assembly (paraxial terms in soildynamics) and
    tests; pairs must exist in the sparsity. Vectorised binary search over
    the CSR structure.
    """
    uniq = (
        topo.csr_cols.astype(np.int64)
        + np.repeat(
            np.arange(topo.n_nodes, dtype=np.int64),
            np.diff(topo.row_ptr),
        )
        * topo.n_nodes
    )
    want = face_rows.astype(np.int64) * topo.n_nodes + face_cols.astype(np.int64)
    idx = np.searchsorted(uniq, want)
    if not np.all(uniq[np.minimum(idx, len(uniq) - 1)] == want):
        raise ValueError("requested (row,col) pair not present in sparsity")
    return topo.csr_to_ell[idx]
