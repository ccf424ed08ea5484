"""Passmo: general-element transient elastodynamics (the "full FEM" module).

TPU-native rebuild of reference modules/passmo (ElastodynamicModule.cc):
arbitrary cell types per mesh (tria3/quad4/tetra4/hexa8/penta6/pyramid5 —
mixed meshes bucket by type and vmap per bucket, SURVEY.md §7 hard part 6),
Gauss-quadrature isoparametric mass/stiffness (ops/quadrature.py replaces
GaussDoFsOnCells + CellFEMDispatcher + FemGaussQuadrature), per-region
material from the mesh <initialization> variables (Rho/Lambda/Mu), the
displacement-form Newmark scheme

    (M/(β·dt²) + K) d_{n+1} = M/(β·dt²)·u_pred + f
    u_pred = d + dt·v + dt²(0.5−β)·a
    a_{n+1} = (d_{n+1} − u_pred)/(β·dt²);  v_{n+1} = v_pred + dt·γ·a_{n+1}

(ElastodynamicModule.cc:900-1010 LHS, _assembleLinearRHS mass-predictor
terms, _updateNewmark :555-595), and Ux/Uy/Uz surface Dirichlet conditions.

The reference rebuilds the operator every `linop-nstep` steps
(ElastodynamicModule.cc:488-499); here the operator is frozen once (the
sparsity and coefficients are time-independent) and each step is RHS-only.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.bcs import BoundaryConditions, dtype_safe_penalty
from ..fem.problem import FemProblem
from ..fem.timer import PhaseTimer
from ..fem.transient import anchor_atol, freeze_bcs
from ..fem.validation import check_node_results
from ..mesh.core import Mesh
from ..ops import quadrature as Q
from ..solver.linear_system import SolverOptions, solve_finalized
from ..solver.iterative import make_precond


@dataclass
class PassmoConfig:
    analysis_type: str = "planestrain"
    start: float = 0.0
    tmax: float = 1.0
    dt: float = 0.1
    beta: float = 0.25
    gamma: float = 0.5
    # Generalized-alfa (Chung–Hulbert): the reference declares these options
    # (Elastodynamic.axl:476-483 alfam/alfaf/alfa_method) but fatals on use
    # ("Generalized-alfa will be done later", ElastodynamicModule.cc:1756);
    # implemented here: M a_{n+1-αm} + K d_{n+1-αf} = 0 in displacement form
    alfa_method: bool = False
    alfam: float = 0.0
    alfaf: float = 0.0
    ninteg: int = 2  # gauss-nint (Elastodynamic.axl:448)
    # material per cell group: name -> value (mesh <initialization>)
    rho: dict = field(default_factory=dict)
    lam: dict = field(default_factory=dict)
    mu: dict = field(default_factory=dict)
    bcs: BoundaryConditions = field(default_factory=BoundaryConditions)
    penalty: float = 1.0e30
    method: str = "Penalty"
    solver: SolverOptions = field(default_factory=SolverOptions)
    result_file: str | None = None
    result_epsilon: float = 1.0e-4  # _checkResultFile epsilon
    result_min_value: float = 1.0e-10


@dataclass
class PassmoResult:
    u: np.ndarray
    v: np.ndarray
    a: np.ndarray
    steps: int
    problem: FemProblem


def _per_cell(mesh: Mesh, group_values: dict, default: float = 0.0):
    """name->value group map to per-bucket (nc,) arrays (the reference's
    mesh-initialized cell variables m_rho/m_lambda/m_mu)."""
    out = {ct: np.full(c.shape[0], default) for ct, c in mesh.cells.items()}
    from .fourier import _rows_in_bucket

    for group, value in group_values.items():
        for ct, sel in mesh.cell_groups.get(group, {}).items():
            out[ct][_rows_in_bucket(mesh.cells[ct], sel)] = value
    if not group_values:
        return out
    return out


def solve(mesh: Mesh, cfg: PassmoConfig, dtype=np.float64,
          timer: PhaseTimer | None = None) -> PassmoResult:
    timer = timer or PhaseTimer(verbose=False)
    ndof = 3 if mesh.dim == 3 else 2
    beta, gamma, dt = cfg.beta, cfg.gamma, cfg.dt
    am, af = (cfg.alfam, cfg.alfaf) if cfg.alfa_method else (0.0, 0.0)
    dt2 = dt * dt
    cab = 1.0 / (beta * dt2)  # Newmark acceleration recovery factor
    cm = (1.0 - am) * cab  # mass LHS factor ((1-αm)/(β·dt²))

    with timer.phase("initialize"):
        prob = FemProblem(mesh, ndof=ndof, dtype=dtype)

    rho_c = _per_cell(mesh, cfg.rho)
    lam_c = _per_cell(mesh, cfg.lam)
    mu_c = _per_cell(mesh, cfg.mu)

    with timer.phase("lhs-matrix-assembly"):
        # persistent per-Gauss-point state, built ONCE and reused by both
        # matrices (and any stress recovery) — the GaussDoFsOnCells role,
        # ElastodynamicModule.cc:188-253
        from ..ops.gauss_state import GaussState

        coords_d = jnp.asarray(mesh.coords.astype(dtype))
        gstate = GaussState.build(mesh, coords_d, cfg.ninteg, ndof)
        Mm = prob.assemble_matrix(
            lambda ct, xyz: gstate.mass_blocks(
                ct, jnp.asarray(rho_c[ct])[None, :]
            )
        )
        Km = prob.assemble_matrix(
            lambda ct, xyz: gstate.stiffness_blocks(
                ct,
                jnp.asarray(lam_c[ct])[None, :],
                jnp.asarray(mu_c[ct])[None, :],
            )
        )
        A = Mm.with_values(cm * Mm.values + (1.0 - af) * Km.values)

    pen = dtype_safe_penalty(cfg.penalty, dtype)
    system = prob.new_system(A, cfg.solver)
    dir_mask = np.zeros(prob.n_dofs, bool)
    dir_gval = np.zeros(prob.n_dofs, np.float64)
    for bc in cfg.bcs.dirichlet:
        nodes = mesh.group_nodes(bc.surface)
        for comp, v in enumerate(bc.values or ()):
            if v is None or comp >= ndof:
                continue
            dofs = prob.dof_ids(nodes, comp)
            prob.apply_dirichlet(system, dofs, v, bc.method or cfg.method, pen)
            dir_mask[dofs] = True
            dir_gval[dofs] = v
    fbc = freeze_bcs(system)
    ns = None
    if cfg.solver.preconditioner == "amg":
        from ..solver.amg import rigid_body_modes

        ns = rigid_body_modes(mesh.coords, ndof)
    M_pre = make_precond(fbc.A, cfg.solver.preconditioner, nullspace=ns)

    @jax.jit
    def step(U, V, Acc):
        u_pred = U + dt * V + dt2 * (0.5 - beta) * Acc
        v_pred = V + dt * (1.0 - gamma) * Acc
        # M[(1-αm)/(β·dt²)·u_pred − αm·a_n] − αf·K·d_n; αm=αf=0 -> Newmark
        rhs = Mm.spmv(cm * u_pred - am * Acc) if am else Mm.spmv(cm * u_pred)
        if af:
            rhs = rhs - af * Km.spmv(U)
        return fbc.apply(rhs), u_pred, v_pred

    @jax.jit
    def update(dU, u_pred, v_pred):
        a_new = (dU - u_pred) * cab
        return dU, v_pred + dt * gamma * a_new, a_new

    # state starts at rest: the Dirichlet values enter through the penalty
    # rows of the first solve, not the initial state (the passmo module has
    # no startInit Dirichlet write, unlike elastodynamics)
    U = jnp.zeros(prob.n_dofs, dtype)
    V = jnp.zeros(prob.n_dofs, dtype)
    Acc = jnp.zeros(prob.n_dofs, dtype)

    t = cfg.start + dt
    steps = 0
    with timer.phase("time-loop"):
        while t <= cfg.tmax + 1e-12 * dt:
            rhs, u_pred, v_pred = step(U, V, Acc)
            x0 = fbc.warm_start(U)
            if steps == 0:
                # anchor later steps' absolute tolerance at step one's
                # initial residual (fem/transient.py::anchor_atol)
                opts = replace(
                    cfg.solver,
                    atol=max(cfg.solver.atol,
                             anchor_atol(fbc.A, M_pre, rhs, x0, cfg.solver.rtol)),
                )
            dU, info = solve_finalized(fbc.A, rhs, opts, x0=x0, precond=M_pre)
            U, V, Acc = update(dU, u_pred, v_pred)
            t += dt
            steps += 1

    u = prob.node_values(U)
    res = PassmoResult(
        u=u, v=prob.node_values(V), a=prob.node_values(Acc),
        steps=steps, problem=prob,
    )
    if cfg.result_file:
        with timer.phase("result-validation"):
            check_node_results(
                mesh.node_uids, u, cfg.result_file, cfg.result_epsilon,
                min_value=cfg.result_min_value,
            )
    return res


def config_from_case(case, check: bool = True) -> "PassmoConfig":
    """PassmoConfig from a parsed .arc case (Elastodynamic.axl surface)."""
    from ..fem.arc import opt_float, opt_text
    from ..fem.bcs import DirichletBC

    fem = case.fem
    bcs = BoundaryConditions()
    method = opt_text(fem, "enforce-Dirichlet-method", "Penalty")
    for d in fem.findall("dirichlet-surface-condition"):
        bcs.dirichlet.append(
            DirichletBC(
                surface=opt_text(d, "surface"),
                values=(
                    opt_float(d, "Ux"), opt_float(d, "Uy"), opt_float(d, "Uz")
                ),
                method=method,
            )
        )
    init = case.mesh_init
    cfg = PassmoConfig(
        analysis_type=opt_text(fem, "analysis-type", "planestrain"),
        start=opt_float(fem, "start", 0.0),
        tmax=opt_float(fem, "final-time", 1.0),
        dt=opt_float(fem, "deltat", 0.1),
        beta=opt_float(fem, "beta", 0.25),
        gamma=opt_float(fem, "gamma", 0.5),
        alfa_method=opt_text(fem, "alfa_method", "false").lower() == "true",
        alfam=opt_float(fem, "alfam", 0.0),
        alfaf=opt_float(fem, "alfaf", 0.0),
        ninteg=int(opt_float(fem, "gauss-nint", 2)),
        rho=dict(init.get("Rho", [])),
        lam=dict(init.get("Lambda", [])),
        mu=dict(init.get("Mu", [])),
        bcs=bcs,
        penalty=opt_float(fem, "penalty", 1.0e30),
        method=method,
        solver=case.solver,
        result_file=case.result_file if check else None,
    )
    return cfg


def _run_arc(case, mesh, dtype=np.float64, check: bool = True, timer=None):
    cfg = config_from_case(case, check=check)
    return solve(mesh, cfg, dtype=dtype, timer=timer)


def _register():
    from ..fem.runner import register

    register("Passmo")(_run_arc)


_register()
