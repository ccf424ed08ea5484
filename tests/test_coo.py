"""Standalone COO format (sparse/coo.py) — the CooFormatMatrix role
(femutils/CooFormatMatrix.h:37-355) + testlab coo/coo-sorted strategies."""

import numpy as np
import jax.numpy as jnp

from arcanefem_tpu.mesh.generate import rect_tria_mesh
from arcanefem_tpu.ops import elements
from arcanefem_tpu.sparse.bell import assemble_bell
from arcanefem_tpu.sparse.coo import CooMatrix, coo_from_elements
from arcanefem_tpu.sparse.topology import build_topology


def _mesh_and_mats(n=8):
    mesh = rect_tria_mesh(n, n)
    coords = jnp.asarray(mesh.coords)
    ke = elements.stiffness_tria3(coords[jnp.asarray(mesh.cells["tria3"])])
    return mesh, {"tria3": ke}


def test_coo_from_elements_no_sparsity_needed():
    mesh, mats = _mesh_and_mats()
    coo = coo_from_elements(mesh.n_nodes, mesh.cells, mats)
    # duplicates kept: nnz_stored = sum nc * npc^2
    assert coo.nnz_stored == mesh.cells["tria3"].shape[0] * 9
    topo = build_topology(mesh.n_nodes, mesh.cells)
    ref = np.asarray(
        assemble_bell(topo, mats, block=1, dtype=np.float64).todense()
    )
    np.testing.assert_allclose(coo.todense(), ref, rtol=1e-12, atol=1e-14)


def test_coo_spmv_sums_duplicates():
    mesh, mats = _mesh_and_mats()
    coo = coo_from_elements(mesh.n_nodes, mesh.cells, mats)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(mesh.n_nodes))
    got = np.asarray(coo.spmv(x))
    want = coo.todense() @ np.asarray(x)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_coo_sorted_merges():
    mesh, mats = _mesh_and_mats()
    coo = coo_from_elements(mesh.n_nodes, mesh.cells, mats)
    s = coo.sorted()
    assert s.nnz_stored < coo.nnz_stored
    keys = np.asarray(s.rows, np.int64) * s.n + np.asarray(s.cols)
    assert np.all(np.diff(keys) > 0), "sorted COO keys must be unique+sorted"
    np.testing.assert_allclose(s.todense(), coo.todense(), rtol=1e-12,
                               atol=1e-14)


def test_coo_to_bell_translate():
    mesh, mats = _mesh_and_mats()
    topo = build_topology(mesh.n_nodes, mesh.cells)
    coo = coo_from_elements(mesh.n_nodes, mesh.cells, mats)
    A = coo.to_bell(topo)
    ref = assemble_bell(topo, mats, block=1, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(A.values), np.asarray(ref.values), rtol=1e-12, atol=1e-14
    )


def test_testlab_coo_strategies_cross_validate():
    from arcanefem_tpu.testlab import cross_validate

    mesh, _ = _mesh_and_mats(6)
    report = cross_validate(mesh)
    assert "coo" in report and "coo-sorted" in report
