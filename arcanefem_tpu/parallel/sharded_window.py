"""Sharded window-kernel SpMV: the fast Mosaic fine-operator under shard_map.

The reference's distributed solve is fast *and* distributed (Hypre CSR SpMV
under MPI, femutils/HypreDoFLinearSystem.cc:264-303,686-742); the TPU
counterpart must run the window `dynamic_gather` sweep
(sparse/pallas_spmv.py) inside ``shard_map``, not the slow XLA gather.

Approach — one plan, uniform per shard:

* every shard's local x-space is ``[owned (N_own_max) | halo (H_max)]``
  (partition.py), so all shards share one length ``L``;
* plan windows over the VIRTUALLY CONCATENATED column space: shard p's
  local columns are offset by ``p·stride`` with the stride rounded up to
  whole 128-lane rows, so window row-groups never mix shards;
* rows per shard are padded to a multiple of the block size, so plan
  blocks align with shard boundaries and every shard gets the SAME number
  of blocks with the SAME static ``(G, slot_rows)`` — the one static key a
  traced-once shard_map kernel needs;
* per-block window starts are rebased to shard-local rows; the plan arrays
  ride as shard-sharded pytree DATA (never closures — HLO-literal capture
  overflows remote compile at scale).

On non-TPU backends the same entries run as the XLA gather form (the
decode of the plan is asserted equal to the shard topology at build time),
so the CPU dryrun validates the plan's column encoding end-to-end while
hardware runs the Mosaic kernel proper.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.pallas_spmv import (
    LANE,
    _adaptive_block_rows,
    _products,
    plan_windows_from_cols,
)
from .partition import ShardedProblem
from .sharded import AXIS, shard_halo_x, shard_pcg
from .sharded_amg import ShardedAMG, fine_vcycle


@dataclass
class ShardedWindowPlan:
    """Per-shard window-plan arrays with one shared static key."""

    lcols: np.ndarray  # (P, nb, G, LANE) int32 virtual window indices
    lo: np.ndarray  # (P, nb, S) int32 shard-LOCAL window start row-groups
    key: tuple  # (G, slot_rows, nb) — static, identical for every shard
    n_rows: int  # owned rows per shard (N_own_max)
    width: int
    need_rows: int  # local-x pad target in 128-lane rows
    window_rows: int  # sum(slot_rows): per-block VMEM window height


def build_sharded_window_plan(
    sp: ShardedProblem, block_rows: int | None = None,
    max_window: int = 128 * 1024,
) -> ShardedWindowPlan | None:
    """Plan the per-shard window sweep over sp.ell_cols; None if any
    shard's windows exceed the VMEM budget (caller keeps the XLA gather)."""
    P, N, W = sp.ell_cols.shape
    L = N + sp.h_max  # local x length, uniform (partition.py layout)
    stride_rows = -(-L // LANE)  # whole 128-rows per shard region
    R = block_rows or _adaptive_block_rows(W)
    if (R * W) % LANE:
        return None
    n_pad = -(-N // R) * R
    cols = np.full((P, n_pad, W), N - 1, np.int64)
    cols[:, :N] = sp.ell_cols  # pad entries already point at their own row
    cols += (np.arange(P, dtype=np.int64) * stride_rows * LANE)[:, None, None]
    plan = plan_windows_from_cols(
        cols.reshape(P * n_pad, W).astype(np.int32),
        pad_target=0, block_rows=R, max_window=max_window,
    )
    if plan is None:
        return None
    nb_per = n_pad // R
    assert plan.n_blocks == P * nb_per
    S = len(plan.slot_rows)
    lo = plan.lo.reshape(P, nb_per, S).astype(np.int64)
    lo -= (np.arange(P, dtype=np.int64) * stride_rows)[:, None, None]
    assert lo.min() >= 0, "window crossed its shard boundary"
    need_rows = int((lo + np.asarray(plan.slot_rows)[None, None, :]).max())
    need_rows = max(need_rows, stride_rows)
    # decode-check: the virtual encoding must reproduce the shard topology
    dec = plan.global_cols().reshape(P, n_pad, W)[:, :N]
    dec -= (np.arange(P) * stride_rows * LANE)[:, None, None]
    assert np.array_equal(dec, np.asarray(sp.ell_cols, np.int64)), (
        "window plan decode mismatch"
    )
    return ShardedWindowPlan(
        lcols=plan.lcols.reshape(P, nb_per, *plan.lcols.shape[1:]),
        lo=lo.astype(np.int32),
        key=(plan.lcols.shape[1], plan.slot_rows, nb_per),
        n_rows=N, width=W, need_rows=need_rows,
        window_rows=sum(plan.slot_rows),
    )


def put_sharded_window(swp: ShardedWindowPlan, mesh: jax.sharding.Mesh):
    shard = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(AXIS))
    return {
        "lcols": jax.device_put(swp.lcols, shard),
        "lo": jax.device_put(swp.lo, shard),
    }


def shard_window_spmv(values, x_loc, lcols, lo, key, width, n_rows,
                      need_rows):
    """One shard's y = Σ_w values[r,w]·x_loc[cols[r,w]] via the Mosaic
    window sweep (f32 kernel; cast back to the operand dtype)."""
    G, slot_rows, nb = key
    R = G * LANE // width
    w = values.astype(jnp.float32)
    if nb * R != n_rows:
        w = jnp.pad(w, ((0, nb * R - n_rows), (0, 0)))
    vals_tiled = w.reshape(nb, G, LANE)
    tp = x_loc.astype(jnp.float32)
    rows = max(need_rows, -(-tp.shape[0] // LANE))
    tp = jnp.pad(tp, (0, rows * LANE - tp.shape[0])).reshape(rows, LANE)
    prods = _products(vals_tiled, lcols, lo, tp, key)
    return prods.reshape(nb * R, width).sum(axis=1)[:n_rows].astype(
        values.dtype
    )


def make_window_amg_step(
    sp: ShardedProblem,
    mesh: jax.sharding.Mesh,
    samg: ShardedAMG,
    swp: ShardedWindowPlan,
    rtol: float = 1.0e-7,
    atol: float = 0.0,
    max_iter: int = 200,
):
    """Sharded AMG-PCG with the window-kernel fine SpMV.

    Same calling convention as sharded_amg.make_poisson_amg_step plus the
    plan arrays:  step(arrs, samg_arrs, wnd_arrs, inner, f, forced_mask,
    forced_val, penalty).  Off-TPU the fine operator runs the identical
    entries as an XLA gather (plan encoding checked at build time), so the
    multichip dryrun exercises this path on virtual CPU devices.
    """
    from .sharded import shard_assemble, shard_source_rhs

    n_own_max, width = sp.n_own_max, sp.width
    n1, omega0, nu = samg.n1, samg.omega0, samg.nu
    key, need_rows = swp.key, swp.need_rows
    use_kernel = jax.default_backend() == "tpu"
    pspec = jax.sharding.PartitionSpec(AXIS)
    repl = jax.sharding.PartitionSpec()

    def shard_fn(
        cells_xyz, slot_map, rhs_map, ell_cols, diag_slot,
        send_idx, halo_src, inv_diag0, pcols0, pvals0, lcols, lo, inner,
        f, forced_mask, forced_val, penalty,
    ):
        (cells_xyz, slot_map, rhs_map, ell_cols, diag_slot, send_idx,
         halo_src, inv_diag0, pcols0, pvals0, lcols, lo, forced_mask,
         forced_val) = jax.tree.map(
            lambda a: a[0],
            (cells_xyz, slot_map, rhs_map, ell_cols, diag_slot, send_idx,
             halo_src, inv_diag0, pcols0, pvals0, lcols, lo, forced_mask,
             forced_val),
        )
        values = shard_assemble(cells_xyz, slot_map, n_own_max, width)
        rhs = shard_source_rhs(cells_xyz, rhs_map, n_own_max, f)

        flat = values.reshape(-1)
        dvals = jnp.where(forced_mask, penalty, flat[diag_slot])
        values = flat.at[diag_slot].set(dvals).reshape(n_own_max, width)
        rhs = jnp.where(forced_mask, penalty * forced_val, rhs)
        x0 = jnp.where(forced_mask, forced_val, 0.0).astype(rhs.dtype)

        def spmv(x):
            x_loc = shard_halo_x(x, send_idx, halo_src)
            if use_kernel:
                return shard_window_spmv(
                    values, x_loc, lcols, lo, key, width, n_own_max,
                    need_rows,
                )
            return jnp.sum(values * x_loc[ell_cols], axis=1)

        def vcycle(r):
            return fine_vcycle(spmv, inv_diag0, pcols0, pvals0, inner,
                               n1, omega0, nu, r)

        x, iters, res = shard_pcg(spmv, vcycle, rhs, x0, rtol, atol,
                                  max_iter)
        return x[None], iters, res

    smapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            {k: pspec for k in sp.cells_xyz},
            {k: pspec for k in sp.slot_map},
            {k: pspec for k in sp.rhs_map},
            pspec, pspec, pspec, pspec,
            pspec, pspec, pspec, pspec, pspec, repl,
            repl, pspec, pspec, repl,
        ),
        out_specs=(pspec, repl, repl),
        check_vma=False,
    )

    @jax.jit
    def step(arrs, samg_arrs, wnd_arrs, inner, f, forced_mask, forced_val,
             penalty):
        return smapped(
            arrs["cells_xyz"], arrs["slot_map"], arrs["rhs_map"],
            arrs["ell_cols"], arrs["diag_slot"], arrs["send_idx"],
            arrs["halo_src"], samg_arrs["inv_diag0"], samg_arrs["pcols0"],
            samg_arrs["pvals0"], wnd_arrs["lcols"], wnd_arrs["lo"], inner,
            f, forced_mask, forced_val, penalty,
        )

    return step
