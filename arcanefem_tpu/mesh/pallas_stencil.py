"""Pallas stencil assembly for structured Kuhn-tet boxes.

XLA executes the 96 slice-add stencil assembly (mesh/structured.py) at
~300 ms for 224³ because every padded contribution term is materialized in
HBM.  This kernel streams the box one output node-plane at a time: per grid
step three coordinate-plane block views (auto-pipelined, double-buffered by
Pallas) land in VMEM, all tet geometry and the 96 (tet, a, b) contributions
are computed on-chip, and one finished (15, ny+1, nzp) band plane is
written — a single HBM pass over inputs and outputs.

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


def _plane_kernel(box: StructuredBox, nzp: int, off: int = 0,
                  with_rhs: bool = False, bc=None):
    """off: y/z offset of the output's real region (1 = dia_pallas plane
    layout with ghost row/lane 0).  with_rhs: accumulate Σ vol/4 per node
    into an extra channel after the bands (constant-source RHS quadrature,
    the source_rhs role fused into assembly).  bc=(penalty, f): also apply
    penalty Dirichlet in-kernel — diag := penalty and rhs := penalty·g on
    masked rows, rhs := f·Σvol/4 elsewhere (mask and penalty·g·mask planes
    come in as two extra inputs) — the whole
    assemble+RHS+apply_penalty_dirichlet pipeline in one HBM pass."""
    nx, ny, nz = box.nx, box.ny, box.nz
    d_index = {d: i for i, d in enumerate(box.offsets)}
    ndiag = len(box.offsets)

    def body(*refs):
        if bc is not None:
            c0, c1, c2, mask_ref, pg_ref, out_ref, rhs_ref = refs
        elif with_rhs:
            c0, c1, c2, out_ref, rhs_ref = refs
        else:
            (c0, c1, c2, out_ref), rhs_ref = refs, None
        _body((c0, c1, c2), out_ref, rhs_ref)
        if bc is not None:
            penalty, f = bc
            m = mask_ref[0]  # 1.0 on Dirichlet rows, 0.0 elsewhere/pads
            free = 1.0 - m
            d0 = d_index[0]
            out_ref[d0] = out_ref[d0] * free + penalty * m
            # pg = penalty·g·mask precomputed host-side (zero pads)
            rhs_ref[0] = rhs_ref[0] * (f * free) + pg_ref[0]

    def _body(win, out_ref, rhs_ref):
        from jax.experimental.pallas import tpu as pltpu

        out_ref[...] = jnp.zeros_like(out_ref)
        if rhs_ref is not None:
            rhs_ref[...] = jnp.zeros_like(rhs_ref)

        nyp, nzp_ = out_ref.shape[-2], out_ref.shape[-1]

        def rolled(p, dj, dk):
            # aligned shift: rolled(p, dj, dk)[y, z] = p[y+dj, z+dk].
            # Wrapped rows/lanes only ever carry zeros (edge-padded coords
            # make pad hexes degenerate), so no masking is needed.
            if dj:
                p = pltpu.roll(p, (-dj) % nyp, 0)
            if dk:
                p = pltpu.roll(p, (-dk) % nzp_, 1)
            return p

        def corner_shift(p, dj, dk):
            # like rolled() but CLAMPED at the far edge: the wrapped last
            # row/lane would pair real row-0 coords with pad coords and
            # fabricate a non-degenerate hex whose contribution then wraps
            # into real output rows — clamping reinstates the edge-pad
            # duplicate there, keeping every pad hex degenerate
            import jax.lax as lax

            q = p
            if dj:
                q = pltpu.roll(q, (-dj) % nyp, 0)
                iy = lax.broadcasted_iota(jnp.int32, (nyp, nzp_), 0)
                q = jnp.where(iy >= nyp - dj, p, q)
            if dk:
                q2 = pltpu.roll(q, (-dk) % nzp_, 1)
                iz = lax.broadcasted_iota(jnp.int32, (nyp, nzp_), 1)
                q = jnp.where(iz >= nzp_ - dk, q, q2)
            return q

        # corner plane extractor: hex plane h (0: below node plane i, 1: at)
        # win: three auto-pipelined coordinate-plane views (1, 3, y, z),
        # z on lanes.  Full ALIGNED planes + rolls — no strided sub-tile
        # slices anywhere (those cost ~40x bandwidth in lane shuffles).
        cache = {}

        def corner(h, c, comp):
            di, dj, dk = _HEX_CORNERS[c]
            key = (h + di, dj, dk, comp)
            if key not in cache:
                cache[key] = corner_shift(win[h + di][0, comp], dj, dk)
            return cache[key]

        for h in (0, 1):
            for tet in _TETS:
                # the 4 corners' coordinates as full (nyp, nzp) planes
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

                scale = vol * inv * inv
                for a, ca in enumerate(tet):
                    dia, dja, dka = _HEX_CORNERS[ca]
                    if dia != 1 - h:
                        continue  # this corner's row is not on plane i
                    la = box._lin(_HEX_CORNERS[ca])
                    ty, tz = off + dja, off + dka
                    for b, cb in enumerate(tet):
                        d = box._lin(_HEX_CORNERS[cb]) - la
                        contrib = scale * (
                            gx[a] * gx[b] + gy[a] * gy[b] + gz[a] * gz[b]
                        )
                        di = d_index[d]
                        # place hex (y,z) onto node row (y+ty, z+tz): roll
                        # toward higher indices by (ty, tz), aligned add
                        out_ref[di] = out_ref[di] + rolled(contrib, -ty, -tz)
                    if with_rhs:
                        rhs_ref[0] = rhs_ref[0] + rolled(vol * 0.25, -ty, -tz)

    return body


@partial(jax.jit, static_argnames=("key",))
def _run(cp, key, *bc_planes):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, nyp8, nzp, ndiag, off, with_rhs, bc = key
    body_box = _run._boxes[key]

    # coordinate window = three views of cp at x-offsets 0/1/2 (cp has one
    # ghost plane each side, so i+2 <= nx+2 is always in bounds)
    def cview(delta):
        return pl.BlockSpec(
            (1, 3, nyp8, nzp), lambda i, d=delta: (i + d, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    plane_spec = pl.BlockSpec(
        (1, nyp8, nzp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [cview(0), cview(1), cview(2)]
    n_in = 3
    if bc is not None:
        in_specs += [plane_spec, plane_spec]
        n_in = 5

    band_spec = pl.BlockSpec(
        (1, ndiag, nyp8, nzp), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    band_shape = jax.ShapeDtypeStruct((nx + 1, ndiag, nyp8, nzp), jnp.float32)
    if with_rhs:
        # RHS is a SEPARATE output (not an extra band channel): bands keep
        # exactly `ndiag` channels so every downstream BlockSpec divides
        out_specs = (band_spec, plane_spec)
        out_shape = (
            band_shape,
            jax.ShapeDtypeStruct((nx + 1, nyp8, nzp), jnp.float32),
        )
    else:
        out_specs, out_shape = band_spec, band_shape

    def kernel(*refs):
        # refs: c0,c1,c2 [+ mask, pg] + bands [+ rhs]; strip the bands
        # block's leading dim
        _plane_kernel(body_box, nzp, off, with_rhs, bc)(
            *refs[:n_in], refs[n_in].at[0], *refs[n_in + 1 :]
        )

    return pl.pallas_call(
        kernel,
        grid=(nx + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(cp, cp, cp, *bc_planes)


_run._boxes = {}


def _coord_planes(box: StructuredBox, coords3d, nyp, nzp):
    """Pad coords: ghost x-planes (duplicated edges -> degenerate hexes ->
    zero), y/z to full tiles, components moved ahead of (y, z)."""
    ny, nz = box.ny, box.nz
    cp = jnp.pad(
        coords3d.astype(jnp.float32),
        ((1, 1), (0, nyp - (ny + 1)), (0, nzp - (nz + 1)), (0, 0)),
        mode="edge",
    )
    return jnp.moveaxis(cp, 3, 1)  # (nx+3, 3, nyp, nzp)


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

    cp = _coord_planes(box, coords3d, nyp8, nzp)
    key = (nx, nyp8, nzp, ndiag, 0, False, None)
    _run._boxes[key] = box
    out = _run(cp, key)  # (nx+1, ndiag, nyp8, nzp)
    bands = jnp.moveaxis(out[:, :, : ny + 1, : nz + 1], 1, 0).reshape(ndiag, -1)
    return DiaMatrix(bands=bands, offsets=box.offsets)


def assemble_system_pallas(
    box: StructuredBox,
    coords3d: jnp.ndarray,
    mask_p: jnp.ndarray | None = None,
    pg_p: jnp.ndarray | None = None,
    penalty: float = 0.0,
    f: float = 1.0,
):
    """Fused assemble + RHS + penalty Dirichlet, straight into the padded
    plane layout — ONE HBM pass for the whole stationary-system build
    (assembly, modules/poisson FemModule._doStationarySolve pipeline).

    mask_p: padded (nx+1, nyp2, nzp) f32 plane, 1.0 on Dirichlet rows;
    pg_p: padded penalty·g·mask plane.  When mask_p is None only
    (matrix, Σvol/4) quadrature is produced — the raw per-node volume
    quadrature WITHOUT the f source factor or any BC (callers multiply
    by f themselves; path currently unused by the bench/model pipelines).

    Returns (mat, rhs_p): mat is a sparse.dia_pallas.DiaPlaneMatrixP
    (bands straight in the x-major plane layout), rhs_p the padded RHS
    plane (or Σvol/4 when no BC requested) — a separate kernel output.
    """
    from ..sparse.dia_pallas import DiaPlaneMatrixP, _pads, offsets3d

    nx, ny, nz = box.nx, box.ny, box.nz
    nyp2, nzp = _pads(box)
    ndiag = len(box.offsets)

    cp = _coord_planes(box, coords3d, nyp2, nzp)
    bc = (float(penalty), float(f)) if mask_p is not None else None
    key = (nx, nyp2, nzp, ndiag, 1, True, bc)
    _run._boxes[key] = box
    planes = (mask_p, pg_p) if bc is not None else ()
    bands, rhs_p = _run(cp, key, *planes)  # (nx+1, ndiag, nyp2, nzp), plane
    mat = DiaPlaneMatrixP(
        bands_p=bands, nx=nx, ny=ny, nz=nz,
        offs3=offsets3d(box), offsets=box.offsets,
    )
    return mat, rhs_p
