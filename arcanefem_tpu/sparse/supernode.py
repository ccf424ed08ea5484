"""Supernode-blocked SpMV: trading block fill for gather locality.

The window SpMV's cost is `requests × window_rows` lane-ops (the Mosaic
dynamic_gather sweep, pallas_spmv.py), and window_rows ∝ RCM bandwidth ∝
N^(2/3) — superlinear scaling (ROADMAP.md "The scatter tax").  Grouping
nodes into supernodes of BS=8 shrinks both factors: x is gathered per
BLOCK column (requests = block-nnz ≈ nnz·fill/64, windows live in block
space, 8x narrower), and the per-block 8×8 contraction runs as one fused
einsum at HBM bandwidth.

Ordering is the whole game (all numbers from the 2.1M sphere_cut):

* supernodes from RAW RCM consecutive-8 chunks: fill 12.6x, but x-permute
  plans trivial;
* pure geometric bricks keep fill at 11.4x but scramble the node order —
  the un-permute gather spans 160k positions and CANNOT be planned;
* the winner: spatial bricks → RCM on the brick quotient graph → nodes
  renumbered by (brick rank, member) → supernodes = consecutive 8s.
  Fill 10.6x, block-space gather spans ~10-20k (vs the scalar kernel's
  ~1.5M entry spans), and the permute/unpermute are identity reshapes.

The mesh must therefore be renumbered with ``supernode_order`` before
building the system (bench.py does this for BENCH_UNSTR_SPMV=supernode).

Role reference: the BSR layout of femutils/BSRFormat.h:104-336 — but
with TPU-chosen block clusters (spatial bricks) instead of per-node dof
blocks, and fill accepted to buy locality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bell import BellMatrix
from .pallas_spmv import PlannedGather

BS = 8  # supernode size: one VREG sublane column per supernode


def supernode_order(topo, coords: np.ndarray, bs: int = BS) -> np.ndarray:
    """Node permutation for supernode blocking: spatial bricks of ~bs
    nodes, brick quotient graph RCM, nodes ordered by (brick rank,
    member).  Returns perm with perm[new_id] = old_id (the convention of
    utils.ordering.rcm_order / renumber_mesh)."""
    from ..utils.ordering import rcm_order

    n, dim = coords.shape
    lo, hi = coords.min(0), coords.max(0)
    vol = float(np.prod(np.maximum(hi - lo, 1e-30)))
    edge = (bs * vol / max(n, 1)) ** (1.0 / dim)
    cell = np.floor((coords - lo) / max(edge, 1e-30)).astype(np.int64)
    dims = cell.max(0) + 1
    key = cell[:, 0]
    for d in range(1, dim):
        key = key * dims[d] + cell[:, d]
    _, brick = np.unique(key, return_inverse=True)
    nb = int(brick.max()) + 1

    # brick quotient graph (CSR) from the node adjacency
    rp, cc = topo.row_ptr.astype(np.int64), topo.csr_cols.astype(np.int64)
    rows = np.repeat(np.arange(n), np.diff(rp))
    bk = np.unique(brick[rows] * np.int64(nb) + brick[cc])
    br, bc = (bk // nb).astype(np.int64), (bk % nb).astype(np.int64)
    bptr = np.zeros(nb + 1, np.int64)
    np.add.at(bptr, br + 1, 1)
    np.cumsum(bptr, out=bptr)
    bperm = rcm_order(nb, bptr, bc)  # bperm[new_brick] = old_brick
    rank = np.empty(nb, np.int64)
    rank[bperm] = np.arange(nb)
    return np.lexsort((np.arange(n), rank[brick])).astype(np.int64)


class SupernodeSpmv:
    """y = A @ x with A re-blocked into BS×BS supernode blocks.

    Nodes MUST already be in supernode order (supernode_order +
    renumber_mesh): supernode i owns nodes [bs·i, bs·(i+1)), so the
    blocked x/y are plain reshapes.  Device pipeline per SpMV:

        xb   = pad(x).reshape(n_sup, bs)
        xg_r = PG_cols(xb[:, r])   r = 0..bs-1   # block-space gathers
        yp   = einsum('eij,je->ei', blocks, xg)  # HBM-bandwidth
        y    = PG_rows(yp[:, i])   i = 0..bs-1   # per-row-slot reduce

    Build once per matrix with ``build`` (host-side value conversion, a
    solve-setup cost like the AMG hierarchy); apply with ``__call__``
    (TPU window kernels) or ``emulate`` (numpy, CPU tests).
    """

    def __init__(self, n, n_sup, blocks, pg_cols, pg_rows, bcol, bptr,
                 brow):
        self.n = n
        self.n_sup = n_sup
        self.blocks = blocks      # (nnzb, BS, BS) jnp f32
        self.pg_cols = pg_cols    # xb column gather (block space)
        self.pg_rows = pg_rows    # per-row-slot block reduction
        # host copies for emulate()
        self._bcol = bcol
        self._bptr = bptr
        self._brow = brow

    @staticmethod
    def build(A: BellMatrix, bs: int = BS):
        """A: scalar BellMatrix whose node order is a supernode order.
        Returns None when a gather plan fails."""
        topo = A.topo
        n = topo.n_nodes
        n_sup = -(-n // bs)

        rp, cc = topo.row_ptr.astype(np.int64), topo.csr_cols.astype(np.int64)
        rows = np.repeat(np.arange(n), np.diff(rp))
        bkey = (rows // bs) * np.int64(n_sup) + cc // bs
        ub = np.unique(bkey)
        nnzb = len(ub)
        brow = (ub // n_sup).astype(np.int64)
        bcol = (ub % n_sup).astype(np.int64)
        bptr = np.zeros(n_sup + 1, np.int64)
        np.add.at(bptr, brow + 1, 1)
        np.cumsum(bptr, out=bptr)

        # block values: one host pass over the real BELL entries
        vals = np.asarray(A.values, np.float32).reshape(n, topo.width)
        valid = np.asarray(topo.ell_valid, bool).reshape(-1)
        er = np.repeat(np.arange(n), topo.width)[valid]
        ec = np.asarray(topo.ell_cols, np.int64).reshape(-1)[valid]
        ev = vals.reshape(-1)[valid]
        blocks = np.zeros((nnzb, bs, bs), np.float32)
        eb = np.searchsorted(ub, (er // bs) * np.int64(n_sup) + ec // bs)
        blocks[eb, er % bs, ec % bs] = ev

        g_cols = PlannedGather.build(
            bcol.reshape(-1, 1), np.ones((nnzb, 1), np.float32), wcap=0
        )
        g_rows = PlannedGather.build_csr(
            np.arange(nnzb, dtype=np.int64), bptr, wcap=8
        )
        if g_cols is None or g_rows is None:
            return None
        return SupernodeSpmv(
            n, n_sup, jnp.asarray(blocks), g_cols, g_rows, bcol, bptr, brow
        )

    def as_bf16(self) -> "SupernodeSpmv":
        """Preconditioner-grade copy: bf16 block storage (halves the block
        stream), f32 accumulation via preferred_element_type.  Use ONLY
        inside the V-cycle (smoother/residual) — the CG operator defines
        the solution and must stay f32."""
        return SupernodeSpmv(
            self.n, self.n_sup, self.blocks.astype(jnp.bfloat16),
            self.pg_cols, self.pg_rows, self._bcol, self._bptr, self._brow,
        )

    # -- application --------------------------------------------------------
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        bs = self.blocks.shape[1]
        xb = jnp.pad(x.astype(jnp.float32),
                     (0, self.n_sup * bs - self.n)).reshape(self.n_sup, bs)
        if os.environ.get("AFEM_SN_BATCH") == "0":
            # per-channel kernels: 16 pallas_calls each embedding its own
            # copy of the Mosaic MLIR — blew the remote-compile body limit
            # (HTTP 413) inside the PCG program at 1.9M nodes; kept for A/B
            xg = jnp.stack(
                [self.pg_cols(xb[:, r]) for r in range(bs)]
            )  # (bs, nnzb)
        else:
            xg = self.pg_cols.call_batched(xb.T)  # (bs, nnzb), ONE kernel
        yp = jnp.einsum(
            "eij,je->ei", self.blocks, xg.astype(self.blocks.dtype),
            preferred_element_type=jnp.float32,
        )  # (nnzb, bs), f32 accumulation even for bf16 blocks
        if os.environ.get("AFEM_SN_BATCH") == "0":
            yb = jnp.stack(
                [self.pg_rows(yp[:, i]) for i in range(bs)], axis=1
            )  # (n_sup, bs)
        else:
            yb = self.pg_rows.call_batched(yp.T).T  # (n_sup, bs)
        return yb.reshape(-1)[: self.n].astype(x.dtype)

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        return self(x)

    def emulate(self, x: np.ndarray) -> np.ndarray:
        """Numpy reference of the exact device pipeline."""
        bs = self.blocks.shape[1]
        xb = np.zeros(self.n_sup * bs, np.float64)
        xb[: self.n] = np.asarray(x)
        xb = xb.reshape(self.n_sup, bs)
        xg = xb[self._bcol]  # (nnzb, bs)
        yp = np.einsum("eij,ej->ei", np.asarray(self.blocks, np.float64), xg)
        yb = np.zeros((self.n_sup, bs))
        np.add.at(yb, self._brow, yp)
        return yb.reshape(-1)[: self.n]


def _sn_flatten(m):
    return (
        (m.blocks, m.pg_cols, m.pg_rows),
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
