"""Native C++ topology builder vs the NumPy reference implementation."""

import numpy as np
import pytest

from arcanefem_tpu.mesh.generate import box_tetra_mesh, rect_tria_mesh
from arcanefem_tpu.sparse.topology import build_topology
from arcanefem_tpu.utils.native import library


@pytest.mark.skipif(library() is None, reason="native library unavailable")
@pytest.mark.parametrize("mesh,pad", [
    (rect_tria_mesh(9, 7), 1),
    (box_tetra_mesh(5, 4, 3), 8),
])
def test_native_matches_numpy(mesh, pad):
    tn = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=pad, use_native=True)
    tp = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=pad, use_native=False)
    assert tn.width == tp.width and tn.nnz == tp.nnz
    np.testing.assert_array_equal(tn.ell_cols, tp.ell_cols)
    np.testing.assert_array_equal(tn.ell_valid, tp.ell_valid)
    np.testing.assert_array_equal(tn.row_ptr, tp.row_ptr)
    np.testing.assert_array_equal(tn.csr_cols, tp.csr_cols)
    np.testing.assert_array_equal(tn.csr_to_ell, tp.csr_to_ell)
    np.testing.assert_array_equal(tn.diag_slot, tp.diag_slot)
    for k in tn.slot_maps:
        np.testing.assert_array_equal(tn.slot_maps[k], tp.slot_maps[k])


@pytest.mark.skipif(library() is None, reason="native library unavailable")
def test_native_mixed_buckets():
    """Mixed tria+quad mesh (two buckets) through the native path."""
    from arcanefem_tpu.mesh.core import read_msh

    mesh = read_msh("/root/reference/meshes/msh/bar_hybrid_quad_tria.msh")
    tn = build_topology(mesh.n_nodes, mesh.cells, use_native=True)
    tp = build_topology(mesh.n_nodes, mesh.cells, use_native=False)
    assert tn.nnz == tp.nnz
    for k in tn.slot_maps:
        np.testing.assert_array_equal(tn.slot_maps[k], tp.slot_maps[k])
