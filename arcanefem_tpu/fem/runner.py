"""Case runner: codename -> model dispatch.

The reference builds one executable per module with an Arcane time loop
(modules/*/main.cc + <Name>.config); here each model registers a
``run(case, mesh, dtype)`` callable and `run_case` plays the role of the
ArcaneLauncher (SURVEY.md §3.1 call stack).
"""

from __future__ import annotations

from typing import Callable

from ..mesh.core import read_msh
from .arc import load_case

_REGISTRY: dict[str, Callable] = {}


def register(codename: str):
    def deco(fn):
        # case-insensitive: reference case files are inconsistent
        # (codename="aerodynamics" vs "Poisson")
        _REGISTRY[codename.lower()] = fn
        return fn

    return deco


def run_case(
    path: str,
    dtype=None,
    mesh_root: str | None = None,
    rcm: bool = False,
    spmv: str | None = None,
    verbose: bool = False,
    **kw,
):
    """Load an .arc case, read its mesh, dispatch to the registered model.

    rcm: bandwidth-reducing node renumbering (utils/ordering.py) — golden
    validation is uid-keyed, so results are invariant; required for the
    Pallas window SpMV on larger meshes.
    spmv: override the SpMV backend ("pallas" enables the TPU window
    kernel, sparse/pallas_spmv.py; silently falls back off-TPU).
    verbose: print `[ArcaneFem-Timer]` phase lines (the reference's
    per-phase wall-clock instrumentation, modules/poisson/FemModule.cc:28-39).
    """
    import numpy as np

    case = load_case(path, mesh_root=mesh_root)
    if spmv is not None:
        case.solver.spmv = spmv
    key = (case.codename or "").lower()
    if key not in _REGISTRY:
        # import model modules lazily so registration side-effects run
        from .. import models  # noqa: F401
        from ..models import _ALL  # triggers imports

        _ = _ALL
    if key not in _REGISTRY:
        raise KeyError(
            f"no model registered for codename '{case.codename}' "
            f"(have: {sorted(_REGISTRY)})"
        )
    mesh = read_msh(case.mesh_file)
    if rcm:
        from ..sparse.topology import build_topology
        from ..utils.ordering import rcm_order, renumber_mesh

        topo = build_topology(mesh.n_nodes, mesh.cells)
        mesh = renumber_mesh(
            mesh, rcm_order(mesh.n_nodes, topo.row_ptr, topo.csr_cols)
        )
    if verbose and "timer" not in kw:
        from .timer import PhaseTimer

        kw["timer"] = PhaseTimer(verbose=True)
    return _REGISTRY[key](case, mesh, dtype=dtype or np.float64, **kw)
