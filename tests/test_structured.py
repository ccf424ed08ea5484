"""Structured stencil path vs general BELL path (format cross-validation).

The reference cross-validates each sparse format against the legacy DOK
assembly on the same golden files (testlab FemModule.cc:484-485); here the
DIA stencil assembly must match the segment-sum BELL assembly exactly on
the same (jittered) geometry, and the PCG solutions must agree.
"""

import jax.numpy as jnp
import numpy as np

from arcanefem_tpu.mesh.structured import (
    StructuredBox,
    apply_penalty_dirichlet,
)
from arcanefem_tpu.fem.problem import FemProblem
from arcanefem_tpu.ops import elements
from arcanefem_tpu.solver.iterative import make_precond, pcg
from arcanefem_tpu.solver.linear_system import LinearSystem, SolverOptions


def test_stencil_matches_bell():
    box = StructuredBox(4, 3, 5)
    c3d = box.grid_coords(np.float64, jitter=0.2, seed=3)
    A = box.assemble_stiffness(jnp.asarray(c3d))
    dense_dia = A.todense()

    mesh = box.to_mesh(c3d)
    prob = FemProblem(mesh, ndof=1, dtype=np.float64)
    B = prob.assemble_matrix(lambda ct, xyz: elements.stiffness(ct, xyz))
    dense_bell = np.asarray(B.todense())

    np.testing.assert_allclose(dense_dia, dense_bell, rtol=1e-12, atol=1e-13)


def test_stencil_rhs_matches():
    box = StructuredBox(3, 4, 2)
    c3d = box.grid_coords(np.float64, jitter=0.15, seed=1)
    rhs_dia = np.asarray(box.source_rhs(jnp.asarray(c3d), 2.5))

    mesh = box.to_mesh(c3d)
    prob = FemProblem(mesh, ndof=1, dtype=np.float64)
    rhs_bell = np.asarray(prob.constant_source_rhs(2.5))
    np.testing.assert_allclose(rhs_dia, rhs_bell, rtol=1e-12, atol=1e-14)


def test_structured_poisson_solve_matches_general():
    box = StructuredBox(6, 5, 4)
    c3d = box.grid_coords(np.float64, jitter=0.1, seed=7)
    cj = jnp.asarray(c3d)

    A = box.assemble_stiffness(cj)
    rhs = box.source_rhs(cj, 1.0)
    mask = box.boundary_mask(("xmin", "xmax"))
    vals = np.zeros(box.n_nodes)
    vals[box.boundary_mask(("xmax",))] = 1.0
    A, rhs = apply_penalty_dirichlet(
        A, rhs, jnp.asarray(mask), jnp.asarray(vals), 1.0e30
    )
    d = A.diagonal()
    from arcanefem_tpu.solver.iterative import Precond

    M = Precond(data=(jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0),), kind="jacobi")
    x0 = jnp.asarray(np.where(mask, vals, 0.0))
    x, iters, res = pcg(A, jnp.asarray(rhs), M, x0, 1e-12, 0.0, 2000)

    # general path on the identical mesh/BCs
    mesh = box.to_mesh(c3d)
    prob = FemProblem(mesh, ndof=1, dtype=np.float64)
    B = prob.assemble_matrix(lambda ct, xyz: elements.stiffness(ct, xyz))
    sys2 = prob.new_system(B, SolverOptions(rtol=1e-12, max_iter=2000))
    sys2.rhs = prob.constant_source_rhs(1.0)
    prob.apply_dirichlet(sys2, np.where(box.boundary_mask(("xmin",)))[0], 0.0)
    prob.apply_dirichlet(sys2, np.where(box.boundary_mask(("xmax",)))[0], 1.0)
    ref, _info = sys2.solve()

    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-8, atol=1e-10)
