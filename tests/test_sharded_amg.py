"""Distributed unstructured AMG-PCG: partition invariance + convergence.

The Hypre discipline (HypreDoFLinearSystem.cc:686-742 under MPI): the
N-device AMG-preconditioned solve must reproduce the single-device solution
and converge in far fewer iterations than Jacobi-PCG.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcanefem_tpu.fem.problem import FemProblem
from arcanefem_tpu.mesh.generate import box_tetra_mesh
from arcanefem_tpu.ops import elements
from arcanefem_tpu.parallel.partition import build_sharded
from arcanefem_tpu.parallel.sharded import (
    device_mesh,
    make_poisson_step,
    put_sharded,
    stacked_node_mask,
)
from arcanefem_tpu.parallel.sharded_amg import (
    build_sharded_amg,
    make_poisson_amg_step,
    put_sharded_amg,
)
from arcanefem_tpu.solver.amg import build_amg
from arcanefem_tpu.solver.iterative import pcg, Precond


PEN = 1.0e12


def _global_system(mesh, f=1.0):
    """Globally assembled penalized system matching the sharded step."""
    prob = FemProblem(mesh, ndof=1, dtype=np.float64)
    A = prob.assemble_matrix(lambda ct, xyz: elements.stiffness(ct, xyz))
    rhs = prob.constant_source_rhs(f)
    xmin = mesh.group_nodes("xmin")
    xmax = mesh.group_nodes("xmax")
    nodes = np.concatenate([xmin, xmax])
    vals = np.concatenate([np.zeros(len(xmin)), np.ones(len(xmax))])
    d = A.diagonal()
    d = d.at[jnp.asarray(nodes)].set(PEN)
    flat = A.values.reshape(-1, 1, 1)
    flat = flat.at[jnp.asarray(A.topo.diag_slot)].set(d[:, None, None])
    A = A.with_values(flat.reshape(A.values.shape))
    rhs = rhs.at[jnp.asarray(nodes)].set(PEN * jnp.asarray(vals))
    x0 = jnp.zeros_like(rhs).at[jnp.asarray(nodes)].set(jnp.asarray(vals))
    return A, rhs, x0, nodes, vals


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_amg_partition_invariance(n_dev):
    mesh = box_tetra_mesh(7, 6, 5)
    A, rhs, x0, nodes, vals = _global_system(mesh)
    amg = build_amg(A, coarse_size=40)
    ref, ref_iters, _ = pcg(A, rhs, amg, x0, 1e-12, 0.0, 300)
    ref = np.asarray(ref)

    sp = build_sharded(mesh, n_dev)
    dmesh = device_mesh(n_dev)
    arrs = put_sharded(sp, dmesh, dtype=jnp.float64)
    samg = build_sharded_amg(sp, amg)
    samg_arrs = put_sharded_amg(samg, dmesh, np.float64)
    mask, val = stacked_node_mask(sp, nodes, vals)

    step = make_poisson_amg_step(sp, dmesh, samg, rtol=1e-12, max_iter=300)
    x, iters, res = step(
        arrs, samg_arrs, samg.inner, 1.0, jnp.asarray(mask),
        jnp.asarray(val), PEN,
    )
    got = sp.scatter_global(np.asarray(x))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-10)

    # AMG must beat Jacobi by a wide margin (same sharded pipeline)
    jstep = make_poisson_step(sp, dmesh, rtol=1e-12, max_iter=2000)
    _, jiters, _ = jstep(arrs, 1.0, mask, val, PEN)
    assert int(iters) * 2 <= int(jiters), (
        f"AMG {int(iters)} iters vs Jacobi {int(jiters)}"
    )


def test_sharded_vcycle_matches_host_vcycle():
    """One distributed V-cycle == the host AMGPrecond apply (same hierarchy,
    fine level sharded vs single-array)."""
    mesh = box_tetra_mesh(5, 4, 4)
    A, rhs, x0, nodes, vals = _global_system(mesh)
    amg = build_amg(A, coarse_size=30)
    r = np.random.RandomState(3).rand(A.topo.n_nodes)
    want = np.asarray(amg.apply(jnp.asarray(r)))

    n_dev = 4
    sp = build_sharded(mesh, n_dev)
    dmesh = device_mesh(n_dev)
    arrs = put_sharded(sp, dmesh, dtype=jnp.float64)
    samg = build_sharded_amg(sp, amg)
    samg_arrs = put_sharded_amg(samg, dmesh, np.float64)

    # drive the V-cycle through a 1-iteration PCG with rtol 0: x1 = alpha*M r
    # is awkward; instead call the precond directly via a tiny shard_map
    from arcanefem_tpu.parallel.sharded import AXIS, shard_assemble, shard_spmv

    n_own_max, width = sp.n_own_max, sp.width
    pspec = jax.sharding.PartitionSpec(AXIS)
    repl = jax.sharding.PartitionSpec()

    rsh = np.zeros((n_dev, n_own_max))
    for p in range(n_dev):
        k = sp.n_own[p]
        rsh[p, :k] = r[sp.owned_global[p, :k]]

    mask, val = stacked_node_mask(sp, nodes, vals)

    def shard_fn(cells_xyz, slot_map, ell_cols, diag_slot, send_idx,
                 halo_src, inv_diag0, pcols0, pvals0, inner, forced_mask,
                 rloc):
        (cells_xyz, slot_map, ell_cols, diag_slot, send_idx, halo_src,
         inv_diag0, pcols0, pvals0, forced_mask, rloc) = jax.tree.map(
            lambda a: a[0],
            (cells_xyz, slot_map, ell_cols, diag_slot, send_idx, halo_src,
             inv_diag0, pcols0, pvals0, forced_mask, rloc),
        )
        values = shard_assemble(cells_xyz, slot_map, n_own_max, width)
        flat = values.reshape(-1)
        dvals = jnp.where(forced_mask, PEN, flat[diag_slot])
        values = flat.at[diag_slot].set(dvals).reshape(n_own_max, width)

        def spmv(x):
            return shard_spmv(values, ell_cols, x, send_idx, halo_src)

        om = jnp.asarray(samg.omega0, rloc.dtype)
        x = om * inv_diag0 * rloc
        for _ in range(samg.nu - 1):
            x = x + om * inv_diag0 * (rloc - spmv(x))
        rr = rloc - spmv(x)
        rc_part = jax.ops.segment_sum(
            (pvals0 * rr[:, None]).reshape(-1), pcols0.reshape(-1),
            num_segments=samg.n1 + 1,
        )[:-1]
        rc = jax.lax.psum(rc_part, AXIS)
        xc = inner.apply(rc)
        x = x + jnp.einsum("nw,nw->n", pvals0, xc[pcols0])
        for _ in range(samg.nu):
            x = x + om * inv_diag0 * (rloc - spmv(x))
        return x[None]

    smapped = jax.shard_map(
        shard_fn, mesh=dmesh,
        in_specs=({k: pspec for k in sp.cells_xyz},
                  {k: pspec for k in sp.slot_map},
                  pspec, pspec, pspec, pspec, pspec, pspec, pspec,
                  repl, pspec, pspec),
        out_specs=pspec,
        check_vma=False,
    )
    x = smapped(
        arrs["cells_xyz"], arrs["slot_map"], arrs["ell_cols"],
        arrs["diag_slot"], arrs["send_idx"], arrs["halo_src"],
        samg_arrs["inv_diag0"], samg_arrs["pcols0"], samg_arrs["pvals0"],
        samg.inner, jnp.asarray(mask), jnp.asarray(rsh),
    )
    got = sp.scatter_global(np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
