"""Pallas stencil assembly for structured Kuhn-tet boxes.

XLA executes the 96 slice-add stencil assembly (mesh/structured.py) at
~300 ms for 224³ because every padded contribution term is materialized in
HBM.  This kernel streams the box one output node-plane at a time: per grid
step it DMAs three coordinate planes into VMEM, computes all tet geometry
and the 96 (tet, a, b) contributions on-chip, and writes one finished
(15, ny+1, nzp) band plane — a single HBM pass over inputs and outputs.

Layout: z is padded to a lane multiple (nzp); x gets one ghost plane on
each side so every output plane sees both adjacent hex planes (ghost hexes
are degenerate — zero volume — and are guarded to contribute exactly zero).

Only used on TPU; `assemble_stiffness_pallas` falls back to the XLA path
elsewhere.  Bit-compatible with StructuredBox.assemble_stiffness up to
f32 addition order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .structured import _HEX_CORNERS, _TETS, StructuredBox

LANE = 128


def _plane_kernel(box: StructuredBox, nzp: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = box.nx, box.ny, box.nz
    d_index = {d: i for i, d in enumerate(box.offsets)}

    def body(cp_hbm, out_ref, win_ref, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(cp_hbm.at[pl.ds(i, 3)], win_ref, sem)
        cp.start()
        cp.wait()

        out_ref[...] = jnp.zeros_like(out_ref)

        # corner plane extractor: hex plane h (0: below node plane i, 1: at)
        # window layout: (xplane, component, y, z) with z on lanes
        def corner(h, c, comp):
            di, dj, dk = _HEX_CORNERS[c]
            return win_ref[h + di, comp, dj : dj + ny, dk : dk + nz]

        for h in (0, 1):
            for tet in _TETS:
                # gather the 4 corners' coordinates as (ny, nz) planes
                X = [corner(h, c, 0) for c in tet]
                Y = [corner(h, c, 1) for c in tet]
                Z = [corner(h, c, 2) for c in tet]
                v0x, v0y, v0z = X[1] - X[0], Y[1] - Y[0], Z[1] - Z[0]
                v1x, v1y, v1z = X[2] - X[0], Y[2] - Y[0], Z[2] - Z[0]
                v2x, v2y, v2z = X[3] - X[0], Y[3] - Y[0], Z[3] - Z[0]
                # 6V = v0 . (v1 x v2); ghost hexes are degenerate -> 0
                cxx = v1y * v2z - v1z * v2y
                cyy = v1z * v2x - v1x * v2z
                czz = v1x * v2y - v1y * v2x
                v6 = v0x * cxx + v0y * cyy + v0z * czz
                av6 = jnp.abs(v6)
                inv = jnp.where(av6 > 1e-30, 1.0 / jnp.where(av6 > 1e-30, av6, 1.0), 0.0)
                vol = av6 / 6.0

                # P1 gradients: cofactor pattern (ops/geometry.py comp()),
                # same unsigned-|6V| convention as tetra4_gradients
                def comp(u, w):
                    c0 = u[1] * (w[3] - w[2]) + u[2] * (w[1] - w[3]) + u[3] * (w[2] - w[1])
                    c1 = u[0] * (w[2] - w[3]) + u[2] * (w[3] - w[0]) + u[3] * (w[0] - w[2])
                    c2 = u[0] * (w[3] - w[1]) + u[1] * (w[0] - w[3]) + u[3] * (w[1] - w[0])
                    c3 = u[0] * (w[1] - w[2]) + u[1] * (w[2] - w[0]) + u[2] * (w[0] - w[1])
                    return (c0, c1, c2, c3)

                gx = comp(Y, Z)
                gy = comp(Z, X)
                gz = comp(X, Y)

                for a, ca in enumerate(tet):
                    dia, dja, dka = _HEX_CORNERS[ca]
                    if dia != 1 - h:
                        continue  # this corner's row is not on plane i
                    la = box._lin(_HEX_CORNERS[ca])
                    for b, cb in enumerate(tet):
                        d = box._lin(_HEX_CORNERS[cb]) - la
                        contrib = (vol * inv * inv) * (
                            gx[a] * gx[b] + gy[a] * gy[b] + gz[a] * gz[b]
                        )
                        di = d_index[d]
                        cur = out_ref[di, dja : dja + ny, dka : dka + nz]
                        out_ref[di, dja : dja + ny, dka : dka + nz] = cur + contrib

    return body


@partial(jax.jit, static_argnames=("key",))
def _run(cp, key):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, nyp8, nzp, ndiag = key
    body_box = _run._boxes[key]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nx + 1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, ndiag, nyp8, nzp), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, 3, nyp8, nzp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(cp_hbm, out_ref, win_ref, sem):
        _plane_kernel(body_box, nzp)(cp_hbm, out_ref.at[0], win_ref, sem)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx + 1, ndiag, nyp8, nzp), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(cp)


_run._boxes = {}


def assemble_stiffness_pallas(box: StructuredBox, coords3d: jnp.ndarray):
    """DiaMatrix-compatible stiffness assembly via the plane kernel.

    coords3d: (nx+1, ny+1, nz+1, 3) f32.  Returns a DiaMatrix like
    StructuredBox.assemble_stiffness.
    """
    from ..sparse.dia import DiaMatrix

    nx, ny, nz = box.nx, box.ny, box.nz
    nyp8 = -(-(ny + 1) // 8) * 8  # full (8, 128) f32 tiles
    nzp = -(-(nz + 1) // LANE) * LANE
    ndiag = len(box.offsets)

    # ghost x-planes (duplicated edges -> degenerate hexes -> zero), y/z
    # padding to full tiles, components moved ahead of (y, z)
    cp = jnp.pad(
        coords3d.astype(jnp.float32),
        ((1, 1), (0, nyp8 - (ny + 1)), (0, nzp - (nz + 1)), (0, 0)),
        mode="edge",
    )
    cp = jnp.moveaxis(cp, 3, 1)  # (nx+3, 3, nyp8, nzp)
    key = (nx, nyp8, nzp, ndiag)
    _run._boxes[key] = box
    out = _run(cp, key)  # (nx+1, ndiag, nyp8, nzp)
    bands = jnp.moveaxis(out[:, :, : ny + 1, : nz + 1], 1, 0).reshape(ndiag, -1)
    return DiaMatrix(bands=bands, offsets=box.offsets)
