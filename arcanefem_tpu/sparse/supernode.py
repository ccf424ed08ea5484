"""Supernode-blocked SpMV: trading block fill for gather locality.

The window SpMV's cost is `requests × window_rows` lane-ops (the Mosaic
dynamic_gather sweep, pallas_spmv.py), and window_rows ∝ RCM bandwidth ∝
N^(2/3) — superlinear scaling (ROADMAP.md "The scatter tax").  Grouping
nodes into geometric supernodes of BS=8 shrinks both factors: x is
gathered per BLOCK-column (requests = block-nnz ≈ nnz·fill/64, windows in
block space are 8x narrower), and the per-block 8×8 contraction runs as a
fused einsum at HBM bandwidth.  Measured on the 2.1M sphere_cut: block
fill 11.4x (A = 1.4 GB f32), sweep work ~9x below the scalar window
kernel's.

Pipeline (device, per SpMV):
    xb   = PG_perm(x)                    # block-permuted x, (NB, 8)
    xg_r = PG_cols(xb[:, r])  r=0..7     # 8 gathers over block windows
    yp   = einsum('eij,je->ei', A_blocks, xg)     # (nnzb, 8)
    yb_i = PG_rows(yp[:, i])  i=0..7     # per-row-position block reduce
    y    = PG_unperm(yb)

All five stages are PlannedGather/ChainedGather applications (reused
unchanged) + one einsum; the whole operator is CPU-emulable for tests
(tests/test_supernode.py) and pays zero scatter.

Role reference: the BSR layout of femutils/BSRFormat.h:104-336 — but
with TPU-chosen block clusters (spatial bricks) instead of per-node
dof blocks, and fill accepted to buy locality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bell import BellMatrix
from .pallas_spmv import PlannedGather

BS = 8  # supernode size: one VREG sublane column per supernode


def geometric_supernodes(coords: np.ndarray, bs: int = BS):
    """Cluster nodes into spatial bricks of ≤bs, ordered by min member.

    Nodes are assumed RCM-ordered (utils/ordering.py); supernodes sorted
    by their minimum member id inherit that banding, which keeps the
    block-space gather windows narrow.  Returns (agg, n_sup): agg[i] =
    supernode id of node i, ids ordered by min member.
    """
    n = coords.shape[0]
    lo, hi = coords.min(0), coords.max(0)
    vol = float(np.prod(np.maximum(hi - lo, 1e-30)))
    edge = (bs * vol / max(n, 1)) ** (1.0 / 3.0)
    cell = np.floor((coords - lo) / max(edge, 1e-30)).astype(np.int64)
    dims = cell.max(0) + 1
    key = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    _, inv = np.unique(key, return_inverse=True)
    # split grid cells with >bs members into chunks of bs
    order = np.argsort(inv, kind="stable")
    sizes = np.bincount(inv)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    pos = np.empty(n, np.int64)
    pos[order] = np.arange(n) - np.repeat(starts, sizes)
    sub_key = inv * np.int64(64) + pos // bs
    _, agg = np.unique(sub_key, return_inverse=True)
    # relabel by min member so supernode order follows the node (RCM) order
    n_sup = int(agg.max()) + 1
    first = np.full(n_sup, n, np.int64)
    np.minimum.at(first, agg, np.arange(n))
    rank = np.empty(n_sup, np.int64)
    rank[np.argsort(first, kind="stable")] = np.arange(n_sup)
    return rank[agg], n_sup


class SupernodeSpmv:
    """y = A @ x with A re-blocked into BS×BS supernode blocks.

    Build once per (topology, values) with ``SupernodeSpmv.build``;
    apply with ``__call__`` (TPU window kernels) or ``emulate`` (numpy,
    for CPU tests).  The matrix VALUES are converted host-side at build
    (a solve-setup cost, like the AMG hierarchy).
    """

    def __init__(self, n, n_sup, blocks, pg_perm, pg_cols, pg_rows,
                 pg_unperm, perm, cols_csr, rows_of_blocks):
        self.n = n
        self.n_sup = n_sup
        self.blocks = blocks          # (nnzb, BS, BS) jnp f32
        self.pg_perm = pg_perm        # x -> blocked x
        self.pg_cols = pg_cols        # xb column gather (block space)
        self.pg_rows = pg_rows        # per-row-position block reduction
        self.pg_unperm = pg_unperm    # blocked y -> y
        # host copies for emulate()
        self._perm = perm             # (n_sup*BS,) node id or -1 (phantom)
        self._cols = cols_csr         # (indptr, bcol ids) CSR over block rows
        self._rows = rows_of_blocks   # (nnzb,) block-row of each block

    # -- construction -------------------------------------------------------
    @staticmethod
    def build(A: BellMatrix, coords: np.ndarray, bs: int = BS):
        """A: scalar BellMatrix (finalized values); coords: (n, dim) node
        positions (RCM order).  Returns None when any gather plan fails."""
        topo = A.topo
        n = topo.n_nodes
        agg, n_sup = geometric_supernodes(np.asarray(coords, np.float64), bs)
        sizes = np.bincount(agg, minlength=n_sup)

        # node -> (block, slot) placement; phantom slots point at -1
        order = np.argsort(agg, kind="stable")
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        slot = np.empty(n, np.int64)
        slot[order] = np.arange(n) - np.repeat(starts, sizes)
        perm = np.full(n_sup * bs, -1, np.int64)
        perm[agg * bs + slot] = np.arange(n)

        # CSR over block rows: distinct block cols per block row
        rp, cc = topo.row_ptr.astype(np.int64), topo.csr_cols.astype(np.int64)
        rows = np.repeat(np.arange(n), np.diff(rp))
        bkey = agg[rows] * np.int64(n_sup) + agg[cc]
        ub, binv = np.unique(bkey, return_inverse=True)
        nnzb = len(ub)
        brow = (ub // n_sup).astype(np.int64)
        bcol = (ub % n_sup).astype(np.int64)
        bptr = np.zeros(n_sup + 1, np.int64)
        np.add.at(bptr, brow + 1, 1)
        np.cumsum(bptr, out=bptr)

        # block values, host scatter (one pass over nnz)
        vals = np.asarray(A.values, np.float32).reshape(n, topo.width)
        valid = np.asarray(topo.ell_valid, bool)
        blocks = np.zeros((nnzb, bs, bs), np.float32)
        er = np.repeat(np.arange(n), topo.width)[valid.reshape(-1)]
        ec = np.asarray(topo.ell_cols, np.int64).reshape(-1)[valid.reshape(-1)]
        ev = vals.reshape(-1)[valid.reshape(-1)]
        ekey = agg[er] * np.int64(n_sup) + agg[ec]
        eb = np.searchsorted(ub, ekey)
        blocks[eb, slot[er], slot[ec]] = ev

        # gather plans (all host-side; None -> no supernode fast path)
        def pg(cols, n_rows=None, wcap=0):
            cols = np.asarray(cols, np.int64).reshape(-1, 1)
            return PlannedGather.build(
                cols, np.ones((len(cols), 1), np.float32), wcap=wcap
            )

        # 1) x -> blocked x: xb[p] = x[perm[p]] (phantom -> weight 0)
        w_perm = (perm >= 0).astype(np.float32)[:, None]
        g_perm = PlannedGather.build(
            np.maximum(perm, 0).reshape(-1, 1), w_perm, wcap=0
        )
        # 2) block-col gather: for each block e, xb-block bcol[e]
        g_cols = pg(bcol)
        # 3) per-row-position reduction over each block row (CSR)
        g_rows = PlannedGather.build_csr(
            np.arange(nnzb, dtype=np.int64), bptr, wcap=8
        )
        # 4) blocked y -> y: y[i] = yb[agg[i]*bs + slot[i]]
        g_unperm = pg(agg * bs + slot)
        if any(g is None for g in (g_perm, g_cols, g_rows, g_unperm)):
            return None
        return SupernodeSpmv(
            n, n_sup, jnp.asarray(blocks), g_perm, g_cols, g_rows,
            g_unperm, perm, (bptr, bcol), brow,
        )

    # -- application --------------------------------------------------------
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bs = self.blocks.shape[1]
        xb = self.pg_perm(x).reshape(self.n_sup, bs)
        xg = jnp.stack(
            [self.pg_cols(xb[:, r]) for r in range(bs)]
        )  # (bs, nnzb)
        yp = jnp.einsum("eij,je->ei", self.blocks, xg)  # (nnzb, bs)
        yb = jnp.stack(
            [self.pg_rows(yp[:, i]) for i in range(bs)], axis=1
        )  # (n_sup, bs)
        return self.pg_unperm(yb.reshape(-1))[: self.n]

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        return self(x)

    def emulate(self, x: np.ndarray) -> np.ndarray:
        """Numpy reference of the exact device pipeline (plan-faithful)."""
        bs = self.blocks.shape[1]
        perm = self._perm
        xb = np.where(perm >= 0, np.asarray(x)[np.maximum(perm, 0)], 0.0)
        xb = xb.reshape(self.n_sup, bs)
        bptr, bcol = self._cols
        xg = xb[bcol]  # (nnzb, bs)
        yp = np.einsum("eij,ej->ei", np.asarray(self.blocks), xg)
        yb = np.zeros((self.n_sup, bs))
        np.add.at(yb, self._rows, yp)
        flat = yb.reshape(-1)[self._perm >= 0]
        y = np.zeros(self.n)
        y[perm[perm >= 0]] = flat
        return y


def _sn_flatten(m):
    return (
        (m.blocks, m.pg_perm, m.pg_cols, m.pg_rows, m.pg_unperm),
        (m.n, m.n_sup),
    )


def _sn_unflatten(meta, data):
    # host-side arrays (emulate()) don't survive the pytree roundtrip —
    # device use only needs the plans + blocks
    return SupernodeSpmv(meta[0], meta[1], *data, None, None, None)


jax.tree_util.register_pytree_node(SupernodeSpmv, _sn_flatten, _sn_unflatten)


class SupernodeMatrix:
    """BellMatrix-shaped adapter: .spmv via the supernode pipeline,
    .diagonal from the original matrix (for Jacobi smoothers)."""

    def __init__(self, sn: SupernodeSpmv, diag: jnp.ndarray):
        self.sn = sn
        self.diag = diag

    def spmv(self, x):
        return self.sn(x)

    def diagonal(self):
        return self.diag


jax.tree_util.register_pytree_node(
    SupernodeMatrix,
    lambda m: ((m.sn, m.diag), None),
    lambda _, data: SupernodeMatrix(data[0], data[1]),
)
