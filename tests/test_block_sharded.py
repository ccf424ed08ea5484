"""Partition invariance for sharded BLOCK systems (elasticity, b=2/3).

The reference runs elasticity's BSRFormat<2> under mpirun and checks the
same golden file at every rank count (modules/elasticity/CMakeLists.txt);
here the sharded block assembly + distributed PCG must reproduce the
single-device elasticity model solution on an 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcanefem_tpu.fem.bcs import BoundaryConditions, DirichletBC
from arcanefem_tpu.mesh.generate import box_tetra_mesh, rect_tria_mesh
from arcanefem_tpu.models.elasticity import ElasticityConfig, lame, solve
from arcanefem_tpu.parallel.block_sharded import (
    make_elasticity_step,
    stacked_dof_mask,
)
from arcanefem_tpu.parallel.partition import build_sharded
from arcanefem_tpu.parallel.sharded import device_mesh, put_sharded


def _single_device(mesh, E, nu, f, clamp):
    bcs = BoundaryConditions(
        dirichlet=[DirichletBC(surface=clamp, values=(0.0,) * mesh.dim)]
    )
    cfg = ElasticityConfig(E=E, nu=nu, f=f, bcs=bcs)
    cfg.solver.rtol = 1e-12
    cfg.solver.max_iter = 4000
    return solve(mesh, cfg, dtype=np.float64).u


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_elasticity_partition_invariance_2d(n_dev):
    mesh = rect_tria_mesh(10, 8)
    E, nu = 21.0e4, 0.28
    ref = _single_device(mesh, E, nu, (0.0, -1.0), "left")

    sp = build_sharded(mesh, n_dev)
    dmesh = device_mesh(n_dev)
    arrs = put_sharded(sp, dmesh, dtype=jnp.float64)
    clamp = mesh.group_nodes("left")
    mask, val = stacked_dof_mask(
        sp, 2, [(clamp, 0, 0.0), (clamp, 1, 0.0)]
    )
    lam, mu2 = lame(E, nu)
    step = make_elasticity_step(
        sp, dmesh, lam, mu2, rtol=1e-12, max_iter=4000, ndof=2
    )
    x, iters, res = step(
        arrs, jnp.asarray([0.0, -1.0]), jnp.asarray(mask), jnp.asarray(val),
        1.0e12,
    )
    got = sp.scatter_global(np.asarray(x))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-12)


def test_elasticity_partition_invariance_3d():
    mesh = box_tetra_mesh(5, 4, 3)
    E, nu = 21.0e4, 0.28
    ref = _single_device(mesh, E, nu, (0.0, 0.0, -1.0), "xmin")

    n_dev = 8
    sp = build_sharded(mesh, n_dev)
    dmesh = device_mesh(n_dev)
    arrs = put_sharded(sp, dmesh, dtype=jnp.float64)
    clamp = mesh.group_nodes("xmin")
    mask, val = stacked_dof_mask(
        sp, 3, [(clamp, c, 0.0) for c in range(3)]
    )
    lam, mu2 = lame(E, nu)
    step = make_elasticity_step(
        sp, dmesh, lam, mu2, rtol=1e-12, max_iter=4000, ndof=3
    )
    x, iters, res = step(
        arrs, jnp.asarray([0.0, 0.0, -1.0]), jnp.asarray(mask),
        jnp.asarray(val), 1.0e12,
    )
    got = sp.scatter_global(np.asarray(x))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-12)


def test_block_assembly_matches_single_topology():
    """Sharded block rows == single-topology block assembly rows."""
    from arcanefem_tpu.fem.problem import FemProblem
    from arcanefem_tpu.models.elasticity import element_blocks
    from arcanefem_tpu.parallel.block_sharded import shard_assemble_blocks

    mesh = rect_tria_mesh(6, 5)
    lam, mu2 = lame(1.0, 0.3)
    prob = FemProblem(mesh, ndof=2, dtype=np.float64)
    A = prob.assemble_matrix(lambda ct, xyz: element_blocks(ct, xyz, lam, mu2))
    dense_ref = np.asarray(A.todense())

    n_dev = 4
    sp = build_sharded(mesh, n_dev)
    n = mesh.n_nodes
    dense = np.zeros_like(dense_ref)
    for p in range(n_dev):
        vals = np.asarray(
            shard_assemble_blocks(
                {k: jnp.asarray(v[p]) for k, v in sp.cells_xyz.items()},
                {k: jnp.asarray(v[p]) for k, v in sp.slot_map.items()},
                sp.n_own_max, sp.width,
                lambda name, xyz: element_blocks(name, xyz, lam, mu2), 2,
            )
        )
        own = sp.owned_global[p, : sp.n_own[p]]
        l2g = np.concatenate([
            own,
            np.setdiff1d(np.arange(n), own, assume_unique=False),
        ])
        # rebuild local->global for halo columns exactly as partition.py
        halo = np.where(sp.part != p)[0]
        g2l = np.full(n, -1, np.int64)
        g2l[own] = np.arange(len(own))
        for i in range(sp.n_own[p]):
            gi = own[i]
            for w in range(sp.width):
                lc = sp.ell_cols[p, i, w]
                v = vals[i, w]
                if not np.any(v):
                    continue
                if lc < sp.n_own_max:
                    gj = sp.owned_global[p, lc]
                else:
                    continue  # halo columns checked via the solve tests
                if gj < 0:
                    continue
                dense[gi * 2 : gi * 2 + 2, gj * 2 : gj * 2 + 2] += v
    # owned-column blocks must match the single-topology assembly
    mask = np.zeros_like(dense_ref, bool)
    for p in range(n_dev):
        own = sp.owned_global[p, : sp.n_own[p]]
        for gi in own:
            for gj in own:
                mask[gi * 2 : gi * 2 + 2, gj * 2 : gj * 2 + 2] = True
    np.testing.assert_allclose(
        dense[mask], dense_ref[mask], rtol=1e-12, atol=1e-12
    )
