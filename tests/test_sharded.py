"""Partition-invariance tests: sharded solve == single-device solve.

Mirrors the reference's MPI tests (`mpirun -n 2|4` on the same golden file,
modules/poisson/CMakeLists.txt:103-106): correctness of the distributed path
is verified by result invariance under partitioning, here on an 8-device
virtual CPU mesh (conftest.py sets xla_force_host_platform_device_count=8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcanefem_tpu.mesh.generate import box_tetra_mesh, rect_tria_mesh
from arcanefem_tpu.parallel.partition import build_sharded, partition_nodes_rcb
from arcanefem_tpu.parallel.sharded import (
    device_mesh,
    make_poisson_step,
    put_sharded,
    stacked_node_mask,
)
from arcanefem_tpu.fem.problem import FemProblem
from arcanefem_tpu.models.poisson import PoissonConfig, solve
from arcanefem_tpu.fem.bcs import BoundaryConditions, DirichletBC


def test_rcb_balance():
    coords = np.random.RandomState(0).rand(1000, 3)
    part = partition_nodes_rcb(coords, 8)
    counts = np.bincount(part, minlength=8)
    assert counts.min() >= 124 and counts.max() <= 126


def _single_device_poisson(mesh, f, groups, gvals):
    bcs = BoundaryConditions(
        dirichlet=[
            DirichletBC(surface=g, value=v) for g, v in zip(groups, gvals)
        ]
    )
    cfg = PoissonConfig(f=f, bcs=bcs)
    return solve(mesh, cfg, dtype=np.float64).u


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_poisson_partition_invariance_2d(n_dev):
    mesh = rect_tria_mesh(12, 9)
    ref = _single_device_poisson(mesh, 1.0, ["left", "right"], [0.0, 1.0])

    sp = build_sharded(mesh, n_dev)
    dmesh = device_mesh(n_dev)
    arrs = put_sharded(sp, dmesh, dtype=jnp.float64)
    nodes = np.concatenate(
        [mesh.group_nodes("left"), mesh.group_nodes("right")]
    )
    vals = np.concatenate(
        [np.zeros(len(mesh.group_nodes("left"))), np.ones(len(mesh.group_nodes("right")))]
    )
    mask, val = stacked_node_mask(sp, nodes, vals)
    step = make_poisson_step(sp, dmesh, rtol=1e-12, max_iter=2000)
    x, iters, res = step(arrs, 1.0, mask, val, 1.0e30)
    got = sp.scatter_global(np.asarray(x))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)


def test_poisson_partition_invariance_3d():
    mesh = box_tetra_mesh(5, 4, 3)
    ref = _single_device_poisson(mesh, 2.5, ["xmin", "xmax"], [0.0, 0.5])

    n_dev = 8
    sp = build_sharded(mesh, n_dev)
    dmesh = device_mesh(n_dev)
    arrs = put_sharded(sp, dmesh, dtype=jnp.float64)
    nodes = np.concatenate([mesh.group_nodes("xmin"), mesh.group_nodes("xmax")])
    vals = np.concatenate(
        [np.zeros(len(mesh.group_nodes("xmin"))), 0.5 * np.ones(len(mesh.group_nodes("xmax")))]
    )
    mask, val = stacked_node_mask(sp, nodes, vals)
    step = make_poisson_step(sp, dmesh, rtol=1e-12, max_iter=2000)
    x, iters, res = step(arrs, 2.5, mask, val, 1.0e30)
    got = sp.scatter_global(np.asarray(x))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)


def test_sharded_matrix_matches_dense():
    """Sharded assembly rows == single-topology assembly rows."""
    mesh = rect_tria_mesh(6, 5)
    prob = FemProblem(mesh, ndof=1, dtype=np.float64)
    from arcanefem_tpu.ops import elements

    A = prob.assemble_matrix(lambda ct, xyz: elements.stiffness(ct, xyz))
    dense_ref = np.asarray(A.todense())

    n_dev = 4
    sp = build_sharded(mesh, n_dev)
    from arcanefem_tpu.parallel.sharded import shard_assemble

    dense = np.zeros_like(dense_ref)
    for p in range(n_dev):
        vals = np.asarray(
            shard_assemble(
                {k: jnp.asarray(v[p]) for k, v in sp.cells_xyz.items()},
                {k: jnp.asarray(v[p]) for k, v in sp.slot_map.items()},
                sp.n_own_max,
                sp.width,
            )
        )
        k = sp.n_own[p]
        own = sp.owned_global[p, :k]
        # local x space -> global: [owned | halo]; reconstruct halo ids
        l2g = np.full(sp.n_own_max + sp.h_max, -1, np.int64)
        l2g[: len(own)] = own
        # halo global ids: nodes of local cells not owned
        touched = np.unique(
            np.concatenate(
                [
                    mesh.cells[name][sp.cell_offsets[name][p][sp.cell_offsets[name][p] >= 0]].ravel()
                    for name in mesh.cells
                ]
            )
        )
        halo = touched[sp.part[touched] != p]
        l2g[sp.n_own_max : sp.n_own_max + len(halo)] = halo
        for i in range(k):
            cols = sp.ell_cols[p, i]
            for w, c in enumerate(cols):
                g = l2g[c]
                if g >= 0:
                    dense[own[i], g] += vals[i, w]
    np.testing.assert_allclose(dense, dense_ref, rtol=1e-10, atol=1e-12)
