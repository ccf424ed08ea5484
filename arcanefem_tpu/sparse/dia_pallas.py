"""Fused Pallas SpMV for structured-box DIA matrices.

XLA executes the 15-offset roll SpMV at ~70 GB/s effective (each roll is a
materialized concat; nothing fuses), which makes it the dominant cost of
the multigrid V-cycle (~44 ms/iteration at 11.4M DoF).  This kernel streams
one output x-plane per grid step: a 3-plane window of x is DMA'd to VMEM
and all 15 shifted multiply-adds happen on-chip — one HBM pass over the
bands, x and y (~1.2 ms at 11.4M DoF).

Layout: planes are padded to (8·k sublanes, 128·k lanes) with one ghost
row on each side of y; ghost values are arbitrary because the band values
reaching them are zero by construction (no cell couples across the domain
boundary).  Vectors stay unpadded outside; pad/unpad passes are fused by
XLA around the kernel call.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..mesh.structured import StructuredBox

LANE = 128


def offsets3d(box: StructuredBox) -> tuple:
    """Linear offsets -> (dx, dy, dz) grid deltas with each in {-1,0,1}."""
    out = []
    for off in box.offsets:
        found = None
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                dz = off - dx * box.sx - dy * box.sy
                if -1 <= dz <= 1:
                    found = (dx, dy, dz)
        if found is None:
            raise ValueError(f"offset {off} is not a unit stencil delta")
        out.append(found)
    return tuple(out)


def _pads(box: StructuredBox):
    nyp2 = -(-(box.ny + 3) // 8) * 8  # ny+1 real rows + 1 ghost each side
    nzp = -(-(box.nz + 3) // LANE) * LANE  # nz+1 real + 1 ghost each side
    return nyp2, nzp


def _acc_Ax(offs3, nyp2, nzp, bands_ref, win_ref):
    from jax.experimental.pallas import tpu as pltpu

    acc = jnp.zeros((nyp2, nzp), jnp.float32)
    for k, (dx, dy, dz) in enumerate(offs3):
        # (Ax)[j, l] += band[j, l] * x[i+dx, j+dy, l+dz]; rolls wrap into
        # ghost/pad rows and lanes whose band values are zero
        shifted = win_ref[1 + dx]
        if dy:
            shifted = pltpu.roll(shifted, (-dy) % nyp2, 0)
        if dz:
            shifted = pltpu.roll(shifted, (-dz) % nzp, 1)
        acc = acc + bands_ref[k, 0] * shifted
    return acc


@partial(jax.jit, static_argnames=("key",))
def _spmv(bands_p, xpad, key):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nxp, nyp2, nzp, ny, nz, offs3 = key
    D = len(offs3)

    def body(bands_ref, x_hbm, y_ref, win_ref, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i, 3)], win_ref, sem)
        cp.start()
        cp.wait()
        y_ref[0] = _acc_Ax(offs3, nyp2, nzp, bands_ref, win_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nxp,),
        in_specs=[
            pl.BlockSpec((D, 1, nyp2, nzp), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, nyp2, nzp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, nyp2, nzp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((nxp, nyp2, nzp), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(bands_p, xpad)


@partial(jax.jit, static_argnames=("key", "mode", "omega"))
def _sweep(bands_p, invd_p, xpad, bpad, key, mode, omega=0.0):
    """mode 'jacobi': out = x + ω·invd·(b − A x); 'residual': out = b − A x.

    One fused HBM pass — the MG smoother/residual otherwise costs an SpMV
    plus separate axpy passes.  ω is static (a solver config constant).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nxp, nyp2, nzp, ny, nz, offs3 = key
    D = len(offs3)

    def body(bands_ref, invd_ref, b_ref, x_hbm, y_ref, win_ref, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i, 3)], win_ref, sem)
        cp.start()
        cp.wait()
        r = b_ref[0] - _acc_Ax(offs3, nyp2, nzp, bands_ref, win_ref)
        if mode == "jacobi":
            y_ref[0] = win_ref[1] + omega * invd_ref[0] * r
        else:
            y_ref[0] = r

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nxp,),
        in_specs=[
            pl.BlockSpec((D, 1, nyp2, nzp), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nyp2, nzp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nyp2, nzp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, nyp2, nzp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, nyp2, nzp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((nxp, nyp2, nzp), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(bands_p, invd_p, bpad, xpad)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["bands_p"],
    meta_fields=["nx", "ny", "nz", "offs3", "offsets"],
)
@dataclass
class DiaStencilMatrix:
    """DiaMatrix drop-in whose spmv runs the fused plane kernel.

    bands_p: (D, nx+1, nyp2, nzp) zero-padded band planes (real rows/cols
    at offset 1 in y and z).
    """

    bands_p: jnp.ndarray
    nx: int
    ny: int
    nz: int
    offs3: tuple
    offsets: tuple

    @property
    def n_dofs(self) -> int:
        return (self.nx + 1) * (self.ny + 1) * (self.nz + 1)

    def _key(self):
        nyp2, nzp = self.bands_p.shape[2], self.bands_p.shape[3]
        return (self.nx + 1, nyp2, nzp, self.ny, self.nz, self.offs3)

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        nx, ny, nz = self.nx, self.ny, self.nz
        nyp2, nzp = self.bands_p.shape[2], self.bands_p.shape[3]
        x3 = x.reshape(nx + 1, ny + 1, nz + 1).astype(jnp.float32)
        xpad = jnp.pad(
            x3,
            ((1, 1), (1, nyp2 - ny - 2), (1, nzp - nz - 2)),
        )
        y = _spmv(self.bands_p, xpad, self._key())
        return y[:, 1 : ny + 2, 1 : nz + 2].reshape(-1).astype(x.dtype)

    def diagonal(self) -> jnp.ndarray:
        d0 = self.offsets.index(0)
        ny, nz = self.ny, self.nz
        return self.bands_p[d0][:, 1 : ny + 2, 1 : nz + 2].reshape(-1)

    # -- fused multigrid kernels (one HBM pass each) -------------------------

    def _pad_vec(self, x: jnp.ndarray) -> jnp.ndarray:
        nx, ny, nz = self.nx, self.ny, self.nz
        nyp2, nzp = self.bands_p.shape[2], self.bands_p.shape[3]
        x3 = x.reshape(nx + 1, ny + 1, nz + 1).astype(jnp.float32)
        return jnp.pad(x3, ((1, 1), (1, nyp2 - ny - 2), (1, nzp - nz - 2)))

    def _pad_plane(self, x: jnp.ndarray) -> jnp.ndarray:
        """Like _pad_vec but without the x ghost planes (per-plane inputs)."""
        nx, ny, nz = self.nx, self.ny, self.nz
        nyp2, nzp = self.bands_p.shape[2], self.bands_p.shape[3]
        x3 = x.reshape(nx + 1, ny + 1, nz + 1).astype(jnp.float32)
        return jnp.pad(x3, ((0, 0), (1, nyp2 - ny - 2), (1, nzp - nz - 2)))

    def _unpad(self, y: jnp.ndarray, dtype) -> jnp.ndarray:
        ny, nz = self.ny, self.nz
        return y[:, 1 : ny + 2, 1 : nz + 2].reshape(-1).astype(dtype)

    def _invd_p(self) -> jnp.ndarray:
        d0 = self.bands_p[self.offsets.index(0)]
        return jnp.where(d0 != 0, 1.0 / jnp.where(d0 == 0, 1.0, d0), 0.0)

    def jacobi_sweep(self, x: jnp.ndarray, b: jnp.ndarray, omega: float) -> jnp.ndarray:
        """x + ω·D⁻¹·(b − A x) in one kernel pass."""
        y = _sweep(
            self.bands_p, self._invd_p(), self._pad_vec(x),
            self._pad_plane(b), self._key(), "jacobi", float(omega),
        )
        return self._unpad(y, x.dtype)

    def residual(self, b: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """b − A x in one kernel pass."""
        y = _sweep(
            self.bands_p, self._invd_p(), self._pad_vec(x),
            self._pad_plane(b), self._key(), "residual",
        )
        return self._unpad(y, x.dtype)

    def with_bands_p(self, bands_p) -> "DiaStencilMatrix":
        return DiaStencilMatrix(
            bands_p=bands_p, nx=self.nx, ny=self.ny, nz=self.nz,
            offs3=self.offs3, offsets=self.offsets,
        )


# --- padded-vector plane kernels (zero pad/unpad inside the MG-PCG loop) ---
#
# Vectors live in the same plane layout as the bands: (nx+1, nyp2, nzp) f32
# with real data at [:, 1:ny+2, 1:nz+2] and ZERO pads.  Every kernel below
# preserves the zero-pad invariant (band pads are zero, so output pads are
# exact zeros), which makes dot products over the padded arrays exact and
# lets the whole MG-PCG iteration run without a single pad/unpad pass.
#
# The 3-plane x window is expressed as three block views with clamped index
# maps instead of a manual DMA: Pallas double-buffers each view, so the
# window fetch overlaps compute.  Clamping is safe because every band value
# that would read across the x boundary is zero by construction.


def _padded_specs(key):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nxp, nyp2, nzp, offs3 = key
    D = len(offs3)

    def xview(delta):
        return pl.BlockSpec(
            (1, nyp2, nzp),
            lambda i, d=delta: (jnp.clip(i + d, 0, nxp - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    # bands are x-major (nx+1, D, nyp2, nzp): the assembly kernel's
    # natural output order, so no transpose is ever materialized
    band_spec = pl.BlockSpec(
        (1, D, nyp2, nzp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    plane_spec = pl.BlockSpec(
        (1, nyp2, nzp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return band_spec, plane_spec, xview


def _acc_Ax_views(offs3, nyp2, nzp, bands_ref, xviews):
    from jax.experimental.pallas import tpu as pltpu

    acc = jnp.zeros((nyp2, nzp), jnp.float32)
    for k, (dx, dy, dz) in enumerate(offs3):
        shifted = xviews[dx + 1][0]
        if dy:
            shifted = pltpu.roll(shifted, (-dy) % nyp2, 0)
        if dz:
            shifted = pltpu.roll(shifted, (-dz) % nzp, 1)
        # bands may be bf16 (mixed-precision V-cycle): promote per band,
        # accumulate in f32 — a no-op cast on the f32 path
        acc = acc + bands_ref[0, k].astype(jnp.float32) * shifted
    return acc


@partial(jax.jit, static_argnames=("key",))
def _spmv_p(bands_p, xp, key):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nxp, nyp2, nzp, offs3 = key
    band_spec, plane_spec, xview = _padded_specs(key)

    def body(bands_ref, xm, xc, xq, y_ref):
        y_ref[0] = _acc_Ax_views(offs3, nyp2, nzp, bands_ref, (xm, xc, xq))

    return pl.pallas_call(
        body,
        grid=(nxp,),
        in_specs=[band_spec, xview(-1), xview(0), xview(1)],
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct((nxp, nyp2, nzp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(bands_p, xp, xp, xp)


@partial(jax.jit, static_argnames=("key", "omega"))
def _jacobi_p(bands_p, invd_p, bp, xp, key, omega):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nxp, nyp2, nzp, offs3 = key
    band_spec, plane_spec, xview = _padded_specs(key)

    def body(bands_ref, invd_ref, b_ref, xm, xc, xq, y_ref):
        r = b_ref[0] - _acc_Ax_views(offs3, nyp2, nzp, bands_ref, (xm, xc, xq))
        y_ref[0] = xc[0] + omega * invd_ref[0] * r

    return pl.pallas_call(
        body,
        grid=(nxp,),
        in_specs=[band_spec, plane_spec, plane_spec, xview(-1), xview(0), xview(1)],
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct((nxp, nyp2, nzp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(bands_p, invd_p, bp, xp, xp, xp)


@partial(jax.jit, static_argnames=("key",))
def _residual_p(bands_p, maskmul_p, bp, xp, key):
    """(b − A x) ⊙ maskmul — the masked V-cycle residual in one pass."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nxp, nyp2, nzp, offs3 = key
    band_spec, plane_spec, xview = _padded_specs(key)

    def body(bands_ref, mm_ref, b_ref, xm, xc, xq, y_ref):
        r = b_ref[0] - _acc_Ax_views(offs3, nyp2, nzp, bands_ref, (xm, xc, xq))
        y_ref[0] = r * mm_ref[0]

    return pl.pallas_call(
        body,
        grid=(nxp,),
        in_specs=[band_spec, plane_spec, plane_spec, xview(-1), xview(0), xview(1)],
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct((nxp, nyp2, nzp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(bands_p, maskmul_p, bp, xp, xp, xp)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["bands_p"],
    meta_fields=["nx", "ny", "nz", "offs3", "offsets"],
)
@dataclass
class DiaPlaneMatrixP:
    """Plane-layout DIA operator over PADDED vectors (zero-copy MG-PCG).

    bands_p is x-major (nx+1, D, nyp2, nzp) — the Pallas assembly kernel's
    native output order (mesh/pallas_stencil.assemble_system_pallas) so no
    transpose is materialized.  spmv/jacobi_sweep/residual take and return
    (nx+1, nyp2, nzp) padded vectors directly — no pad/unpad per call.
    Use pad_vec/unpad_vec once at solve entry/exit.
    """

    bands_p: jnp.ndarray
    nx: int
    ny: int
    nz: int
    offs3: tuple
    offsets: tuple

    @property
    def n_dofs(self) -> int:
        return (self.nx + 1) * (self.ny + 1) * (self.nz + 1)

    def _key(self):
        return (self.nx + 1, self.bands_p.shape[2], self.bands_p.shape[3], self.offs3)

    # -- layout shuttles (entry/exit only) -----------------------------------

    def pad_vec(self, x: jnp.ndarray) -> jnp.ndarray:
        nx, ny, nz = self.nx, self.ny, self.nz
        nyp2, nzp = self.bands_p.shape[2], self.bands_p.shape[3]
        x3 = x.reshape(nx + 1, ny + 1, nz + 1).astype(jnp.float32)
        return jnp.pad(x3, ((0, 0), (1, nyp2 - ny - 2), (1, nzp - nz - 2)))

    def unpad_vec(self, xp: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
        ny, nz = self.ny, self.nz
        return xp[:, 1 : ny + 2, 1 : nz + 2].reshape(-1).astype(dtype)

    def diagonal_p(self) -> jnp.ndarray:
        return self.bands_p[:, self.offsets.index(0)].astype(jnp.float32)

    def astype_bands(self, dtype) -> "DiaPlaneMatrixP":
        """Band-dtype cast (e.g. bf16 for the mixed-precision V-cycle —
        kernels promote per band and accumulate in f32)."""
        return DiaPlaneMatrixP(
            bands_p=self.bands_p.astype(dtype), nx=self.nx, ny=self.ny,
            nz=self.nz, offs3=self.offs3, offsets=self.offsets,
        )

    def inv_diagonal_p(self) -> jnp.ndarray:
        d = self.diagonal_p()
        return jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)

    # -- padded kernels -------------------------------------------------------

    def spmv(self, xp: jnp.ndarray) -> jnp.ndarray:
        return _spmv_p(self.bands_p, xp, self._key())

    def jacobi_sweep(
        self, xp: jnp.ndarray, bp: jnp.ndarray, invd_p: jnp.ndarray, omega: float
    ) -> jnp.ndarray:
        return _jacobi_p(self.bands_p, invd_p, bp, xp, self._key(), float(omega))

    def residual(
        self, bp: jnp.ndarray, xp: jnp.ndarray, maskmul_p: jnp.ndarray
    ) -> jnp.ndarray:
        return _residual_p(self.bands_p, maskmul_p, bp, xp, self._key())


def pad_host_vec(box: StructuredBox, x_flat) -> "np.ndarray":
    """Host-side pad of a flat (n_nodes,) vector into the plane layout."""
    import numpy as np

    nyp2, nzp = _pads(box)
    x3 = np.asarray(x_flat, np.float32).reshape(box.nx + 1, box.ny + 1, box.nz + 1)
    return np.pad(x3, ((0, 0), (1, nyp2 - box.ny - 2), (1, nzp - box.nz - 2)))


def to_plane_matrix(A, box: StructuredBox) -> DiaPlaneMatrixP:
    """Pad a DiaMatrix's bands into the x-major padded plane layout.

    One transpose pass; prefer mesh/pallas_stencil.assemble_plane_pallas,
    which emits this layout directly from assembly.
    """
    s = to_stencil_matrix(A, box)
    return DiaPlaneMatrixP(
        bands_p=jnp.moveaxis(s.bands_p, 0, 1), nx=box.nx, ny=box.ny, nz=box.nz,
        offs3=s.offs3, offsets=s.offsets,
    )


def to_stencil_matrix(A, box: StructuredBox) -> DiaStencilMatrix:
    """Pad a DiaMatrix's bands into the plane layout (one-time)."""
    nyp2, nzp = _pads(box)
    D = A.bands.shape[0]
    b3 = A.bands.reshape(D, box.nx + 1, box.ny + 1, box.nz + 1)
    bands_p = jnp.pad(
        b3.astype(jnp.float32),
        ((0, 0), (0, 0), (1, nyp2 - box.ny - 2), (1, nzp - box.nz - 2)),
    )
    return DiaStencilMatrix(
        bands_p=bands_p, nx=box.nx, ny=box.ny, nz=box.nz,
        offs3=offsets3d(box), offsets=box.offsets,
    )
