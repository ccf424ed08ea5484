"""Manufactured-solution (MMS) convergence test for the transient heat module.

The reference ships no transient goldens (modules/heat has no check/ dir), so
correctness is established against an exact manufactured solution instead:

    T(x,y,t) = exp(-t)·sin(πx)·sin(πy)   on the unit square, T=0 on ∂Ω,
    source q = ∂T/∂t − ΔT = (2π² − 1)·T

With `mass_rhs="consistent"` (M·T_old/dt) the implicit-Euler P1 scheme is
O(h²) + O(dt); halving h and dt must cut the L2 error ~4×.  The reference's
own scheme (`mass_rhs="lumped"`, FemModule.cc:487-493) pairs a lumped RHS
with a consistent-LHS M/dt — kept as the default for parity; this test
pins down that its manufactured-source path runs and documents that its
error does NOT improve as dt→0 at fixed h (the inconsistency is upstream's,
not a rebuild bug).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from arcanefem_tpu.fem.bcs import BoundaryConditions, DirichletBC
from arcanefem_tpu.mesh.generate import rect_tria_mesh
from arcanefem_tpu.models.heat import HeatConfig, solve

PI = np.pi


def _mms_error(n, dt, mass_rhs, tmax=0.2):
    mesh = rect_tria_mesh(n, n)

    def q(x, y, z, t):
        return (2 * PI**2 - 1.0) * jnp.exp(-t) * jnp.sin(PI * x) * jnp.sin(PI * y)

    bcs = BoundaryConditions(
        dirichlet=[DirichletBC(surface=s, value=0.0)
                   for s in ("left", "right", "bottom", "top")]
    )
    cfg = HeatConfig(lam=1.0, qdot=q, dt=dt, tmax=tmax, bcs=bcs,
                     mass_rhs=mass_rhs)
    cfg.solver.rtol = 1e-12
    x, y = mesh.coords[:, 0], mesh.coords[:, 1]
    T0 = np.sin(PI * x) * np.sin(PI * y)
    r = solve(mesh, cfg, T0=T0)
    exact = np.exp(-r.steps * dt) * T0
    return float(np.sqrt(np.mean((r.T - exact) ** 2)))


def test_consistent_mass_second_order():
    e_coarse = _mms_error(8, 0.02, "consistent")
    e_fine = _mms_error(16, 0.01, "consistent")
    assert e_coarse < 1.2e-2
    # measured ratios 3.8-4.05; >3 guards the convergence order with margin
    assert e_coarse / e_fine > 3.0, (e_coarse, e_fine)


def test_consistent_mass_dt_robust():
    # at fixed h, shrinking dt must not blow the error up (it is h²-floored)
    e1 = _mms_error(16, 0.01, "consistent")
    e2 = _mms_error(16, 0.0025, "consistent")
    assert e2 < 1.5 * e1, (e1, e2)


def test_lumped_parity_path_runs():
    # the reference-parity scheme solves the same MMS to its (lower) accuracy
    e = _mms_error(16, 0.01, "lumped")
    assert np.isfinite(e) and e < 5e-2


def test_mass_rhs_validation():
    with pytest.raises(ValueError):
        _mms_error(8, 0.02, "bogus")
