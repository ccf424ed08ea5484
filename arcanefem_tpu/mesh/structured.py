"""Structured-box FEM fast path: stencil assembly into a DIA matrix.

The TPU-native counterpart of the reference's benchmark pipeline (poisson 3D
CUDA BSR assembly, femutils/BSRFormat.h:786-932 + modules/testlab
benchmarking) for structured tetrahedral boxes: because the node graph of a
Kuhn-decomposed hex grid has a *fixed set of 15 index offsets*, both
assembly and SpMV can be written entirely with static slices, rolls and
elementwise math — no gather, no scatter, no atomics — which is the shape
XLA/TPU executes at HBM bandwidth (~700 GB/s measured on v5e, vs
~0.11 Gelem/s for XLA scatter/gather).

Geometry is general (arbitrary node coordinates on the structured topology,
e.g. jittered/graded grids): element matrices are computed per tet from real
coordinates with the same batched kernels as the unstructured path
(ops/elements.py), only the *scatter* is replaced by static slice-adds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import elements
from ..sparse.dia import DiaMatrix

# Kuhn 6-tet decomposition of the unit hex (must match generate.box_tetra_mesh)
_HEX_CORNERS = [  # grid deltas (di, dj, dk) of hex corners 0..7
    (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
]
_TETS = [
    (0, 1, 2, 6), (0, 2, 3, 6), (0, 3, 7, 6),
    (0, 7, 4, 6), (0, 4, 5, 6), (0, 5, 1, 6),
]


@dataclass
class StructuredBox:
    """(nx, ny, nz) hex grid, each split into 6 tets; nodes z-fastest."""

    nx: int
    ny: int
    nz: int
    lx: float = 1.0
    ly: float = 1.0
    lz: float = 1.0

    offsets: tuple = field(init=False)

    def __post_init__(self):
        self.sy = self.nz + 1
        self.sx = (self.ny + 1) * (self.nz + 1)
        offs = set()
        for tet in _TETS:
            for i in tet:
                for j in tet:
                    offs.add(self._lin(_HEX_CORNERS[j]) - self._lin(_HEX_CORNERS[i]))
        self.offsets = tuple(sorted(offs))

    def _lin(self, d) -> int:
        return d[0] * self.sx + d[1] * self.sy + d[2]

    @property
    def n_nodes(self) -> int:
        return (self.nx + 1) * (self.ny + 1) * (self.nz + 1)

    @property
    def n_cells(self) -> int:
        return 6 * self.nx * self.ny * self.nz

    def grid_coords(self, dtype=np.float32, jitter: float = 0.0, seed: int = 0):
        """(nx+1, ny+1, nz+1, 3) node coordinates; optional interior jitter
        (fraction of local spacing) so assembled values are non-trivial."""
        xs = np.linspace(0, self.lx, self.nx + 1)
        ys = np.linspace(0, self.ly, self.ny + 1)
        zs = np.linspace(0, self.lz, self.nz + 1)
        X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
        c = np.stack([X, Y, Z], axis=-1)
        if jitter > 0:
            rng = np.random.RandomState(seed)
            h = np.array(
                [self.lx / self.nx, self.ly / self.ny, self.lz / self.nz]
            )
            d = (rng.rand(*c.shape) - 0.5) * 2 * jitter * h
            d[0, :, :] = d[-1, :, :] = 0.0
            d[:, 0, :] = d[:, -1, :] = 0.0
            d[:, :, 0] = d[:, :, -1] = 0.0
            c = c + d
        return c.astype(dtype)

    # -- device-side assembly (jit-safe) -------------------------------------

    def _corner_xyz(self, coords3d: jnp.ndarray, corner: int) -> jnp.ndarray:
        di, dj, dk = _HEX_CORNERS[corner]
        return coords3d[
            di : di + self.nx, dj : dj + self.ny, dk : dk + self.nz
        ].reshape(-1, 3)

    def assemble_stiffness(self, coords3d: jnp.ndarray, backend: str = "auto") -> DiaMatrix:
        """Stencil assembly: batched tet kernels + static slice-adds.

        Mirrors the math of BSRFormat::assembleBilinear(computeElementMatrix
        Tetra4) with the scatter replaced by 96 static slice-adds grouped by
        the 15 stencil offsets.

        backend: "auto" uses the Pallas plane-streaming kernel on TPU/f32
        (mesh/pallas_stencil.py, ~6x faster — XLA materializes every padded
        term in HBM), the XLA slice-add path otherwise.
        """
        if backend == "auto":
            import jax

            if (
                jax.devices()[0].platform == "tpu"
                and coords3d.dtype == jnp.float32
            ):
                from .pallas_stencil import assemble_stiffness_pallas

                return assemble_stiffness_pallas(self, coords3d)
        from ..ops.geometry import tetra4_gradients, tetra4_volume

        nx, ny, nz = self.nx, self.ny, self.nz
        dtype = coords3d.dtype
        shp = (nx + 1, ny + 1, nz + 1)
        bands = {d: jnp.zeros(shp, dtype) for d in self.offsets}

        for tet in _TETS:
            xyz = jnp.stack(
                [self._corner_xyz(coords3d, c) for c in tet], axis=1
            )  # (nhex, 4, 3)
            # per-entry contributions from gradients directly: never
            # materialize the (nhex, 4, 4) element tensor — each (a, b)
            # entry is one fused elementwise pass into its band slice
            vol = tetra4_volume(xyz)
            gx, gy, gz = tetra4_gradients(xyz)  # (nhex, 4) each
            for a, ca in enumerate(tet):
                di, dj, dk = _HEX_CORNERS[ca]
                la = self._lin(_HEX_CORNERS[ca])
                for b, cb in enumerate(tet):
                    d = self._lin(_HEX_CORNERS[cb]) - la
                    contrib = vol * (
                        gx[:, a] * gx[:, b]
                        + gy[:, a] * gy[:, b]
                        + gz[:, a] * gz[:, b]
                    )
                    bands[d] = bands[d].at[
                        di : di + nx, dj : dj + ny, dk : dk + nz
                    ].add(contrib.reshape(nx, ny, nz))

        stacked = jnp.stack(
            [bands[d].reshape(-1) for d in self.offsets], axis=0
        )
        return DiaMatrix(bands=stacked, offsets=self.offsets)

    def source_rhs(self, coords3d: jnp.ndarray, f) -> jnp.ndarray:
        """rhs[node] += f * vol / 4 per incident tet (constant source)."""
        nx, ny, nz = self.nx, self.ny, self.nz
        rhs = jnp.zeros((nx + 1, ny + 1, nz + 1), coords3d.dtype)
        for tet in _TETS:
            xyz = jnp.stack(
                [self._corner_xyz(coords3d, c) for c in tet], axis=1
            )
            contrib = (f * elements.tetra4_volume(xyz) / 4.0).reshape(nx, ny, nz)
            for ca in tet:
                di, dj, dk = _HEX_CORNERS[ca]
                rhs = rhs.at[di : di + nx, dj : dj + ny, dk : dk + nz].add(contrib)
        return rhs.reshape(-1)

    # -- boundary handling ----------------------------------------------------

    def boundary_mask(self, planes=("xmin", "xmax")) -> np.ndarray:
        """(n_nodes,) bool mask of nodes on the named box faces."""
        m = np.zeros((self.nx + 1, self.ny + 1, self.nz + 1), bool)
        sel = {
            "xmin": (0, slice(None), slice(None)),
            "xmax": (-1, slice(None), slice(None)),
            "ymin": (slice(None), 0, slice(None)),
            "ymax": (slice(None), -1, slice(None)),
            "zmin": (slice(None), slice(None), 0),
            "zmax": (slice(None), slice(None), -1),
        }
        for p in planes:
            m[sel[p]] = True
        return m.reshape(-1)

    def to_mesh(self, coords3d: np.ndarray | None = None):
        """Equivalent unstructured Mesh (for cross-validation tests)."""
        from .generate import box_tetra_mesh
        from .core import Mesh

        mesh = box_tetra_mesh(self.nx, self.ny, self.nz, self.lx, self.ly, self.lz)
        if coords3d is not None:
            mesh.coords = np.asarray(coords3d, np.float64).reshape(-1, 3)
        return mesh


def apply_penalty_dirichlet(
    A: DiaMatrix, rhs: jnp.ndarray, mask: jnp.ndarray, values: jnp.ndarray,
    penalty: float,
) -> tuple[DiaMatrix, jnp.ndarray]:
    """Penalty Dirichlet on a DIA matrix: diag := P, rhs := P*g (masked).

    The HypreDoFLinearSystem.cc:356-382 _applyForcedValuesToLhs role.
    """
    d0 = A.offsets.index(0)
    bands = A.bands.at[d0].set(
        jnp.where(mask, jnp.asarray(penalty, A.bands.dtype), A.bands[d0])
    )
    rhs = jnp.where(mask, penalty * values, rhs)
    return A.with_bands(bands), rhs
