"""Blocked (b×b) window-sweep SpMV (sparse/blocked.py).

CPU lane validates the full plan pipeline by numpy emulation against the
exact scipy product; the on-TPU lane checks the Mosaic kernels against
the same reference.  Role reference: femutils/BSRFormat.h:104-336 (block
storage amortizing per-entry cost — there CUDA index math, here the
window sweep).
"""

import numpy as np
import pytest

import jax

from arcanefem_tpu.mesh.generate import rect_tria_mesh
from arcanefem_tpu.sparse.blocked import BlockedGather
from arcanefem_tpu.sparse.topology import build_topology
from arcanefem_tpu.utils.ordering import rcm_order, renumber_mesh


def _csr(n=72, seed=0):
    """RCM-ordered FEM-graph CSR with random values (banded, realistic
    block fill)."""
    mesh = rect_tria_mesh(n, n)
    t0 = build_topology(mesh.n_nodes, mesh.cells)
    mesh = renumber_mesh(mesh, rcm_order(mesh.n_nodes, t0.row_ptr,
                                         t0.csr_cols))
    t = build_topology(mesh.n_nodes, mesh.cells)
    rng = np.random.RandomState(seed)
    data = rng.randn(len(t.csr_cols)).astype(np.float32)
    return t.csr_cols, t.row_ptr, data, mesh.n_nodes


@pytest.mark.parametrize("b,wcap", [(2, 8), (4, 8), (4, 16)])
def test_blocked_emulation_matches_scipy(b, wcap):
    import scipy.sparse as sp

    cols, indptr, data, n = _csr()
    g = BlockedGather.build_csr(cols, indptr, data, n, b=b, wcap=wcap)
    assert g is not None, "blocked plan must build on a banded mesh"
    A = sp.csr_matrix((data, cols, indptr), shape=(n, n))
    rng = np.random.RandomState(1)
    x = rng.randn(n).astype(np.float32)
    np.testing.assert_allclose(
        g.emulate(x), (A @ x.astype(np.float64)), rtol=2e-5, atol=1e-4
    )


def test_blocked_rectangular():
    """Coarse-side blocking on a rectangular (prolongator-like) map."""
    import scipy.sparse as sp

    cols, indptr, data, n = _csr()
    # fold columns 4:1 to get an (n, n//4) rectangular operator
    rc = cols // 4
    A = sp.csr_matrix((data, rc, indptr), shape=(n, n // 4 + 1))
    A.sum_duplicates()
    g = BlockedGather.build_csr(A.indices, A.indptr, A.data,
                                A.shape[1], b=2)
    assert g is not None
    x = np.random.RandomState(2).randn(A.shape[1]).astype(np.float32)
    np.testing.assert_allclose(
        g.emulate(x), A @ x.astype(np.float64), rtol=2e-5, atol=1e-4
    )


def test_blocked_pytree_roundtrip():
    cols, indptr, data, n = _csr(40)
    g = BlockedGather.build_csr(cols, indptr, data, n, b=4)
    leaves, treedef = jax.tree_util.tree_flatten(g)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    x = np.random.RandomState(3).randn(n).astype(np.float32)
    np.testing.assert_allclose(g.emulate(x), g2.emulate(x))


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs TPU hardware"
)
@pytest.mark.parametrize("b", [2, 4])
def test_blocked_kernel_matches_scipy_on_tpu(b):
    import scipy.sparse as sp

    cols, indptr, data, n = _csr()
    g = BlockedGather.build_csr(cols, indptr, data, n, b=b)
    assert g is not None
    A = sp.csr_matrix((data, cols, indptr), shape=(n, n))
    x = np.random.RandomState(4).randn(n).astype(np.float32)
    got = np.asarray(jax.jit(g.__call__)(x))
    np.testing.assert_allclose(
        got, A @ x.astype(np.float64), rtol=2e-4, atol=2e-4
    )
