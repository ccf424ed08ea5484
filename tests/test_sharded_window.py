"""Sharded window-kernel SpMV: plan geometry, kernel-semantics emulation,
and partition-invariant AMG-PCG through make_window_amg_step.

The TPU Mosaic kernel itself cannot run on CPU; these tests validate every
array the kernel consumes — the virtual window encoding (decode-assert),
the per-shard lcols/lo/vals tiling via a numpy sweep emulation mirroring
sparse/pallas_spmv._make_kernel, and the full sharded solve plumbing (the
gather form of the identical entries).  Reference role: the distributed
Hypre solve, femutils/HypreDoFLinearSystem.cc:264-303,686-742.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcanefem_tpu.mesh.generate import box_tetra_mesh
from arcanefem_tpu.parallel.partition import build_sharded
from arcanefem_tpu.parallel.sharded import device_mesh, put_sharded, stacked_node_mask
from arcanefem_tpu.parallel.sharded_amg import build_sharded_amg, put_sharded_amg
from arcanefem_tpu.parallel.sharded_window import (
    LANE,
    build_sharded_window_plan,
    make_window_amg_step,
    put_sharded_window,
)
from arcanefem_tpu.solver.amg import build_amg
from arcanefem_tpu.solver.iterative import pcg

from test_sharded_amg import PEN, _global_system


def test_plan_geometry_and_decode():
    """Uniform static key across shards; decode-assert inside build passed;
    windows stay inside their shard's local x region."""
    mesh = box_tetra_mesh(7, 6, 5)
    for n_dev in (2, 8):
        sp = build_sharded(mesh, n_dev)
        swp = build_sharded_window_plan(sp)
        assert swp is not None
        P = sp.n_parts
        G, slot_rows, nb = swp.key
        assert swp.lcols.shape == (P, nb, G, LANE)
        assert swp.lo.shape == (P, nb, len(slot_rows))
        L = sp.n_own_max + sp.h_max
        # every window fits in the (padded) local x
        assert swp.need_rows * LANE >= L
        assert (swp.lo + np.asarray(slot_rows)[None, None, :]).max() \
            <= swp.need_rows


def _emulate_shard_sweep(swp, p, values_p, x_loc):
    """Numpy mirror of the Mosaic kernel for shard p: per-block window DMA
    + virtual-index sweep (sparse/pallas_spmv._make_kernel semantics)."""
    G, slot_rows, nb = swp.key
    S = len(slot_rows)
    offs = np.concatenate([[0], np.cumsum(slot_rows)])
    R = G * LANE // swp.width
    w = np.zeros((nb * R, swp.width), np.float64)
    w[: swp.n_rows] = values_p
    vals = w.reshape(nb, G, LANE)
    rows = max(swp.need_rows, -(-len(x_loc) // LANE))
    tp = np.zeros(rows * LANE)
    tp[: len(x_loc)] = x_loc
    tp = tp.reshape(rows, LANE)
    out = np.zeros((nb, G, LANE))
    for b in range(nb):
        win = np.zeros((offs[-1], LANE))
        for s in range(S):
            lo = swp.lo[p, b, s]
            win[offs[s]: offs[s + 1]] = tp[lo: lo + slot_rows[s]]
        idx = swp.lcols[p, b].astype(np.int64)  # (G, LANE) virtual
        out[b] = vals[b] * win.reshape(-1)[idx]
    return out.reshape(nb * R, swp.width).sum(axis=1)[: swp.n_rows]


@pytest.mark.parametrize("n_dev", [2, 8])
def test_emulated_shard_sweep_matches_gather(n_dev):
    """Per-shard window sweep (numpy, kernel semantics) == the gather form
    Σ_w values·x_loc[ell_cols] for random values on EVERY shard — the
    encoding the Mosaic kernel consumes is exactly equivalent to the shard
    topology.  (Matrix-level correctness of the gather form is covered by
    test_window_amg_partition_invariance.)"""
    mesh = box_tetra_mesh(6, 5, 4)
    sp = build_sharded(mesh, n_dev)
    swp = build_sharded_window_plan(sp)
    assert swp is not None
    rng = np.random.RandomState(0)
    L = sp.n_own_max + sp.h_max
    for p in range(sp.n_parts):
        vals_p = rng.randn(sp.n_own_max, sp.width)
        x_loc = rng.rand(L)
        want = (vals_p * x_loc[sp.ell_cols[p]]).sum(axis=1)
        got = _emulate_shard_sweep(swp, p, vals_p, x_loc)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_window_amg_partition_invariance(n_dev):
    """make_window_amg_step == single-device AMG-PCG solution (the gather
    form of the plan entries on CPU; the Mosaic kernel on TPU)."""
    mesh = box_tetra_mesh(7, 6, 5)
    A, rhs, x0, nodes, vals = _global_system(mesh)
    amg = build_amg(A, coarse_size=40)
    ref, ref_iters, _ = pcg(A, rhs, amg, x0, 1e-12, 0.0, 300)
    ref = np.asarray(ref)

    sp = build_sharded(mesh, n_dev)
    swp = build_sharded_window_plan(sp)
    assert swp is not None
    dmesh = device_mesh(n_dev)
    arrs = put_sharded(sp, dmesh, dtype=jnp.float64)
    samg = build_sharded_amg(sp, amg)
    samg_arrs = put_sharded_amg(samg, dmesh, np.float64)
    wnd_arrs = put_sharded_window(swp, dmesh)
    mask, val = stacked_node_mask(sp, nodes, vals)

    step = make_window_amg_step(sp, dmesh, samg, swp, rtol=1e-12,
                                max_iter=300)
    x, iters, res = step(
        arrs, samg_arrs, wnd_arrs, samg.inner, 1.0, jnp.asarray(mask),
        jnp.asarray(val), PEN,
    )
    got = sp.scatter_global(np.asarray(x))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-10)
    assert int(iters) <= ref_iters + 3
