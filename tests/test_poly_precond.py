"""Chebyshev polynomial preconditioner (solver/poly.py) — the Aleph
poly/ainv/ic/ilu option role (AlephDoFLinearSystemFactory.axl:34-43)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arcanefem_tpu.mesh.generate import rect_tria_mesh
from arcanefem_tpu.ops import elements
from arcanefem_tpu.sparse.bell import assemble_bell
from arcanefem_tpu.sparse.topology import build_topology
from arcanefem_tpu.solver.iterative import pcg, make_precond
from arcanefem_tpu.solver.poly import build_chebyshev


def _poisson_system(n=24):
    mesh = rect_tria_mesh(n, n)
    topo = build_topology(mesh.n_nodes, mesh.cells)
    coords = jnp.asarray(mesh.coords)
    ke = elements.stiffness_tria3(coords[jnp.asarray(mesh.cells["tria3"])])
    A = assemble_bell(topo, {"tria3": ke}, block=1, dtype=np.float64)
    # penalty-pin the boundary so the system is SPD
    bnd = np.unique(
        np.concatenate(
            [f.reshape(-1) for g in mesh.face_groups.values() for f in g.values()]
        )
    )
    flat = np.asarray(A.values).reshape(-1).copy()
    flat[np.asarray(topo.diag_slot)[bnd]] = 1.0e12
    A = A.with_values(jnp.asarray(flat))
    rng = np.random.RandomState(1)
    b = jnp.asarray(rng.rand(mesh.n_nodes))
    return A, b


def test_chebyshev_is_linear_and_symmetric():
    A, b = _poisson_system(12)
    M = build_chebyshev(A, degree=3)
    n = b.shape[0]
    rng = np.random.RandomState(2)
    r = jnp.asarray(rng.rand(n))
    s = jnp.asarray(rng.rand(n))
    # linearity
    got = np.asarray(M.apply(2.5 * r + s))
    want = 2.5 * np.asarray(M.apply(r)) + np.asarray(M.apply(s))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # symmetry: <M r, s> == <r, M s>  (PCG requirement)
    a1 = float(jnp.vdot(M.apply(r), s))
    a2 = float(jnp.vdot(r, M.apply(s)))
    assert abs(a1 - a2) <= 1e-9 * max(abs(a1), 1.0)


def test_chebyshev_beats_jacobi_iterations():
    A, b = _poisson_system(24)
    x0 = jnp.zeros_like(b)
    Mj = make_precond(A, "jacobi")
    xj, kj, rj = pcg(A, b, Mj, x0, 1e-10, 0.0, 500)
    Mc = build_chebyshev(A, degree=3)
    xc, kc, rc = pcg(A, b, Mc, x0, 1e-10, 0.0, 500)
    assert float(rc) <= 1e-10 * 1.5
    assert int(kc) < int(kj), (int(kc), int(kj))
    np.testing.assert_allclose(np.asarray(xc), np.asarray(xj), rtol=1e-6)


def test_make_precond_poly_route():
    A, b = _poisson_system(12)
    M = make_precond(A, "poly")
    from arcanefem_tpu.solver.poly import ChebyshevPrecond

    assert isinstance(M, ChebyshevPrecond)
