"""Diagonal-coherent sorted window SpMV: plan geometry (CPU) + kernel (TPU).

Same gating as test_pallas_spmv.py: Mosaic kernels need real TPU hardware,
so CPU validates the host-side plan semantics.
"""

import numpy as np
import pytest

import jax

from arcanefem_tpu.mesh.generate import box_tetra_mesh, rect_tria_mesh
from arcanefem_tpu.sparse.pallas_spmv_diag import (
    LANE, SUB, TILE_ROWS, DiagBellSpmv, plan_diag,
)
from arcanefem_tpu.sparse.topology import build_topology
from arcanefem_tpu.utils.ordering import rcm_order, renumber_mesh


def _rcm_topo(mesh):
    t = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    mesh2 = renumber_mesh(mesh, rcm_order(mesh.n_nodes, t.row_ptr, t.csr_cols))
    return mesh2, build_topology(mesh2.n_nodes, mesh2.cells, pad_width_to=8)


@pytest.mark.parametrize("mesh_fn", [
    lambda: rect_tria_mesh(90, 90),
    lambda: box_tetra_mesh(22, 20, 18),
])
def test_diag_plan_reconstructs_columns(mesh_fn):
    mesh, topo = _rcm_topo(mesh_fn())
    plan = plan_diag(topo.ell_cols, topo.n_nodes - 1, block_rows=4096)
    assert plan is not None, "RCM mesh should be diagonal-coherent"
    n, W = topo.n_nodes, topo.width
    nb, R = plan.n_blocks, plan.block_rows
    qn = R // TILE_ROWS
    # reconstruction: col = (lo − SUB)·128 + 128·sublane + lcols
    rec = (
        plan.lcols.astype(np.int64)
        + (np.arange(SUB) * LANE)[None, None, :, None]
        + ((plan.lo.astype(np.int64) - SUB) * LANE)[:, None, None, None]
    )
    # undo slot-major tiling: (nb, W, qn, 8, 128) -> (nb*R, W)
    rec = rec.reshape(nb, W, qn, SUB, LANE).transpose(0, 2, 3, 4, 1)
    rec = rec.reshape(nb * R, W)[:n]
    np.testing.assert_array_equal(rec, topo.ell_cols)
    # probe reach: every diagonalized offset inside its tile's S chunks
    d128 = plan.lcols // LANE
    c0 = plan.c0.reshape(nb, -1, 1, 1)
    assert (d128 >= c0).all()
    assert (d128 < c0 + plan.n_probes).all()
    # window covers the last probe's sublanes
    assert (plan.c0 + plan.n_probes - 1 + SUB) .max() <= plan.window // LANE


def test_diag_plan_rejects_incoherent():
    """Random (unsorted, unordered) columns should exceed max_probes."""
    rng = np.random.RandomState(0)
    n, W = 8192, 8
    cols = rng.randint(0, n, size=(n, W)).astype(np.int32)
    assert plan_diag(cols, n - 1, block_rows=4096, max_probes=8) is None


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs real TPU"
)
def test_diag_kernel_matches_xla_on_tpu():
    import jax.numpy as jnp

    mesh, topo = _rcm_topo(box_tetra_mesh(22, 20, 18))
    sp = DiagBellSpmv(topo)
    assert sp.available
    rng = np.random.RandomState(0)
    vals = jnp.asarray(rng.rand(topo.n_nodes, topo.width).astype(np.float32))
    vals = vals * jnp.asarray(topo.ell_valid)
    x = jnp.asarray(rng.rand(topo.n_nodes).astype(np.float32))
    y = np.asarray(sp(vals, x))
    yref = np.asarray(jnp.sum(vals * x[jnp.asarray(topo.ell_cols)], axis=1))
    np.testing.assert_allclose(y, yref, rtol=1e-6, atol=1e-6)
