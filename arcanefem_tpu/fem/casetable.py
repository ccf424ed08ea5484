"""Time-series case tables with linear interpolation.

Counterpart of the reference's ``readFileAsCaseTable`` + Arcane CaseTable
(femutils/FemUtils.cc:180-228): whitespace-separated floats, each row =
[time, v_1..v_ndim], linearly interpolated (CurveLinear) and clamped at the
ends.  Used for transient traction/double-couple loadings
(modules/elastodynamics/FemModule.cc:305-320, soildynamics data/*.txt).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass
class CaseTable:
    times: np.ndarray  # (T,) ascending
    values: np.ndarray  # (T, ndim)

    def value(self, t) -> jnp.ndarray:
        """(ndim,) linear interpolation at time t (jit-safe)."""
        ts = jnp.asarray(self.times)
        return jnp.stack(
            [jnp.interp(t, ts, jnp.asarray(self.values[:, j]))
             for j in range(self.values.shape[1])]
        )


def read_case_table(path: str, ndim: int) -> CaseTable:
    data = np.array(open(path).read().split(), dtype=np.float64)
    if len(data) % (ndim + 1) != 0:
        raise ValueError(
            f"{path}: {len(data)} values is not a multiple of {ndim + 1}"
        )
    rows = data.reshape(-1, ndim + 1)
    return CaseTable(times=rows[:, 0], values=rows[:, 1:])
