"""Checkpoint/resume for transient state pytrees.

The reference gets checkpointing from Arcane L0 (time-dependent state U,V,A
lives in .axl-declared variables, modules/elastodynamics/Fem.axl:9-27) but
no module enables it (SURVEY.md §5).  Here transient state is an explicit
pytree, so checkpointing is orbax-backed save/restore of
``{"t": t, "step": k, "state": {...arrays...}}`` — usable by any of the
transient models (heat, elastodynamics, soildynamics, passmo).

Falls back to ``numpy.savez`` when orbax is unavailable.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save(path: str, t: float, step: int, state: dict) -> None:
    """state: name -> array. Writes <path>/ (orbax) or <path>.npz."""
    arrays = {k: np.asarray(v) for k, v in state.items()}
    meta = {"t": float(t), "step": int(step), "keys": sorted(arrays)}
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, {"meta": meta, "state": arrays}, force=True)
    except Exception:
        np.savez(path + ".npz", __meta__=json.dumps(meta), **arrays)


def restore(path: str) -> tuple[float, int, dict]:
    """Returns (t, step, state dict of numpy arrays)."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.restore(os.path.abspath(path))
        meta = tree["meta"]
        return float(meta["t"]), int(meta["step"]), dict(tree["state"])
    except Exception:
        with np.load(path + ".npz", allow_pickle=False) as z:
            meta = json.loads(str(z["__meta__"]))
            state = {k: z[k] for k in meta["keys"]}
        return float(meta["t"]), int(meta["step"]), state
