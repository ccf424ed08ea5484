"""Padded-plane-layout MG-PCG path (sparse/dia_pallas.py DiaPlaneMatrixP +
solver/multigrid.py MGPrecondP) — the bench.py TPU fast path.

The Pallas kernels are TPU-only (validated here when a TPU is attached;
exactness vs the XLA DIA path was also verified on v5e: spmv and MG apply
bit-identical, jacobi sweep ~1e-7 relative).  On CPU we check that bench's
dispatch keeps working and the padded helpers round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arcanefem_tpu.mesh.structured import StructuredBox, apply_penalty_dirichlet

on_tpu = jax.devices()[0].platform == "tpu"


@pytest.mark.skipif(not on_tpu, reason="needs real TPU")
def test_padded_kernels_match_xla():
    from arcanefem_tpu.sparse.dia_pallas import to_plane_matrix

    box = StructuredBox(16, 12, 20)
    c3 = jnp.asarray(box.grid_coords(np.float32, jitter=0.1))
    A = box.assemble_stiffness(c3, backend="xla")
    mask = jnp.asarray(box.boundary_mask(("xmin", "xmax")))
    rhs = box.source_rhs(c3, 1.0)
    A, rhs = apply_penalty_dirichlet(
        A, rhs, mask, jnp.zeros(box.n_nodes, jnp.float32), 1e12
    )
    P = to_plane_matrix(A, box)
    x = jnp.asarray(np.random.RandomState(1).rand(box.n_nodes).astype(np.float32))
    xp = P.pad_vec(x)

    y_ref = np.asarray(A.spmv(x))
    yp = P.spmv(xp)
    np.testing.assert_array_equal(np.asarray(P.unpad_vec(yp)), y_ref)
    # zero-pad invariant: pads of the output are exact zeros
    yp_np = np.asarray(yp)
    m = np.zeros(yp_np.shape, bool)
    m[:, 1 : box.ny + 2, 1 : box.nz + 2] = True
    assert np.abs(yp_np[~m]).max() == 0.0

    invd_p = P.inv_diagonal_p()
    bp = P.pad_vec(rhs)
    sw = np.asarray(P.unpad_vec(P.jacobi_sweep(xp, bp, invd_p, 0.8)))
    d = np.asarray(A.diagonal())
    invd = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0)
    sw_ref = np.asarray(x) + 0.8 * invd * (np.asarray(rhs) - y_ref)
    assert np.abs(sw - sw_ref).max() <= 1e-6 * np.abs(sw_ref).max()

    mm = P.pad_vec(1.0 - jnp.asarray(mask, jnp.float32))
    r = np.asarray(P.unpad_vec(P.residual(bp, xp, mm)))
    r_ref = (np.asarray(rhs) - y_ref) * (1.0 - np.asarray(mask))
    np.testing.assert_array_equal(r, r_ref)


@pytest.mark.skipif(not on_tpu, reason="needs real TPU")
def test_padded_mg_apply_matches_stencil_mg():
    from arcanefem_tpu.solver.multigrid import build_mg, build_mg_padded
    from arcanefem_tpu.sparse.dia_pallas import to_plane_matrix

    box = StructuredBox(16, 12, 20)
    c3 = jnp.asarray(box.grid_coords(np.float32, jitter=0.1))
    mask = box.boundary_mask(("xmin", "xmax"))
    A = box.assemble_stiffness(c3, backend="xla")
    P = to_plane_matrix(A, box)
    M0 = build_mg(box, c3, mask, 1e12, use_stencil_spmv=True, min_size=4)
    M1 = build_mg_padded(box, c3, mask, 1e12, min_size=4)
    rv = jnp.asarray(np.random.RandomState(2).rand(box.n_nodes).astype(np.float32))
    z0 = np.asarray(M0.apply(rv))
    z1 = np.asarray(P.unpad_vec(M1.apply(P.pad_vec(rv))))
    np.testing.assert_array_equal(z0, z1)


def test_pad_roundtrip_cpu():
    """pad_vec/unpad_vec round-trip and zero pads (layout logic, any backend)."""
    from arcanefem_tpu.sparse.dia import DiaMatrix
    from arcanefem_tpu.sparse.dia_pallas import DiaPlaneMatrixP, _pads, offsets3d

    box = StructuredBox(5, 6, 7)
    c3 = jnp.asarray(box.grid_coords(np.float32))
    A = box.assemble_stiffness(c3, backend="xla")
    nyp2, nzp = _pads(box)
    D = A.bands.shape[0]
    b3 = A.bands.reshape(D, box.nx + 1, box.ny + 1, box.nz + 1)
    bands_p = jnp.pad(
        b3.astype(jnp.float32),
        ((0, 0), (0, 0), (1, nyp2 - box.ny - 2), (1, nzp - box.nz - 2)),
    )
    P = DiaPlaneMatrixP(
        bands_p=jnp.moveaxis(bands_p, 0, 1),  # x-major layout
        nx=box.nx, ny=box.ny, nz=box.nz,
        offs3=offsets3d(box), offsets=box.offsets,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(box.n_nodes).astype(np.float32))
    xp = P.pad_vec(x)
    assert xp.shape == (box.nx + 1, nyp2, nzp)
    np.testing.assert_array_equal(np.asarray(P.unpad_vec(xp)), np.asarray(x))
    m = np.zeros(xp.shape, bool)
    m[:, 1 : box.ny + 2, 1 : box.nz + 2] = True
    assert np.abs(np.asarray(xp)[~m]).max() == 0.0
    # inv diagonal has zero pads too (so smooth0's elementwise keeps pads zero)
    assert np.abs(np.asarray(P.inv_diagonal_p())[~m]).max() == 0.0
