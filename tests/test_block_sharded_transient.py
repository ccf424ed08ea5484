"""Sharded transient elastodynamics: N-device Newmark trajectories must
match the single-device model (the reference's synchronize()-per-step MPI
loop, modules/elastodynamics/FemModule.cc:429+, validated by partition
invariance like its mpirun ctest entries)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcanefem_tpu.fem.bcs import BoundaryConditions, DirichletBC
from arcanefem_tpu.mesh.generate import rect_tria_mesh
from arcanefem_tpu.models.elastodynamics import (
    ElastodynamicsConfig,
    newmark_coefficients,
    solve,
)
from arcanefem_tpu.parallel.block_sharded import (
    make_elastodynamics_loop,
    stacked_dof_mask,
)
from arcanefem_tpu.parallel.partition import build_sharded
from arcanefem_tpu.parallel.sharded import device_mesh, put_sharded


@pytest.mark.parametrize("n_dev,etak", [(2, 0.0), (4, 0.0), (8, 0.02)])
def test_elastodynamics_partition_invariance(n_dev, etak):
    mesh = rect_tria_mesh(8, 6)
    cfg = ElastodynamicsConfig(
        tmax=0.4,
        dt=0.08,
        rho=1.0,
        E=2.0,
        nu=0.3,
        etam=0.01 if etak else 0.0,
        etak=etak,
        f=(0.0, -1.0),
        bcs=BoundaryConditions(
            dirichlet=[DirichletBC(surface="left", values=(0.0, 0.0))]
        ),
        penalty=1.0e12,
    )
    cfg.solver.rtol = 1e-12
    cfg.solver.max_iter = 4000
    ref = solve(mesh, cfg, dtype=np.float64)
    assert ref.steps == 5

    mu = cfg.E / (2 * (1 + cfg.nu))
    lam = cfg.E * cfg.nu / ((1 + cfg.nu) * (1 - 2 * cfg.nu))
    c, gamma, beta = newmark_coefficients(cfg, lam, mu)

    sp = build_sharded(mesh, n_dev)
    dmesh = device_mesh(n_dev)
    arrs = put_sharded(sp, dmesh, dtype=jnp.float64)
    clamp = mesh.group_nodes("left")
    mask, val = stacked_dof_mask(sp, 2, [(clamp, 0, 0.0), (clamp, 1, 0.0)])

    run = make_elastodynamics_loop(
        sp, dmesh, c, gamma, beta, cfg.dt, n_steps=ref.steps,
        rtol=1e-12, max_iter=4000, ndof=2,
    )
    U, V, A, iters = run(
        arrs, jnp.asarray([0.0, -1.0]), jnp.asarray(mask), jnp.asarray(val),
        1.0e12,
    )
    gU = sp.scatter_global(np.asarray(U))
    gV = sp.scatter_global(np.asarray(V))
    gA = sp.scatter_global(np.asarray(A))
    np.testing.assert_allclose(gU, ref.u, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(gV, ref.v, rtol=1e-6, atol=1e-11)
    np.testing.assert_allclose(gA, ref.a, rtol=1e-6, atol=1e-10)
    assert int(iters) > 0
