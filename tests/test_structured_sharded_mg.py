"""Sharded multigrid x-slab path: partition invariance vs 1-chip reference.

Mirrors test_structured_sharded.py: the sharded MG-PCG must reproduce the
Jacobi-PCG reference solution of the same penalized system (golden-style
invariance, the reference's mpirun -n N ctest discipline).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcanefem_tpu.mesh.structured import StructuredBox, apply_penalty_dirichlet
from arcanefem_tpu.parallel.structured_mg import (
    make_structured_mg_step,
    mg_slab_coords,
    mg_slab_masks,
    plan_mg_slabs,
)
from arcanefem_tpu.parallel.structured_sharded import (
    gather_global,
    slab_mask_values,
)
from arcanefem_tpu.solver.iterative import Precond, pcg


def _reference(box, c3d, mask, gv):
    A = box.assemble_stiffness(c3d)
    rhs = box.source_rhs(c3d, 2.0)
    A, rhs = apply_penalty_dirichlet(
        A, rhs, jnp.asarray(mask), jnp.asarray(gv), 1e12
    )
    d = A.diagonal()
    M = Precond(
        data=(jnp.where(d != 0, 1 / jnp.where(d == 0, 1, d), 0.0),),
        kind="jacobi",
    )
    x0 = jnp.asarray(np.where(mask, gv, 0.0))
    x, _, _ = pcg(A, rhs, M, x0, 1e-11, 0.0, 3000)
    return np.asarray(x)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_mg_matches_reference(n_dev):
    box = StructuredBox(16, 8, 6)
    c3d = jnp.asarray(box.grid_coords(np.float64, jitter=0.1))
    mask = box.boundary_mask(("xmin", "xmax"))
    gv = np.zeros(box.n_nodes)
    gv[box.boundary_mask(("xmax",))] = 1.0
    ref = _reference(box, c3d, mask, gv)

    plan = plan_mg_slabs(box, n_dev, min_size=2)
    assert len(plan.levels) >= 2, "hierarchy must actually coarsen"
    devs = jax.devices()[:n_dev]
    mesh = jax.sharding.Mesh(np.array(devs), ("xslabs",))
    shard = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("xslabs"))

    cs = tuple(
        jax.device_put(jnp.asarray(c), shard)
        for c in mg_slab_coords(plan, np.asarray(c3d))
    )
    ms = tuple(
        jax.device_put(jnp.asarray(m), shard) for m in mg_slab_masks(plan)
    )
    _, vs = slab_mask_values(plan.fine, mask, gv)
    vs = jax.device_put(jnp.asarray(vs), shard)

    step = make_structured_mg_step(plan, mesh, rtol=1e-11, max_iter=200)
    x, iters, res = step(cs, ms, vs, 2.0)
    got = gather_global(plan.fine, np.asarray(x))
    assert int(iters) < 60, f"MG-PCG should converge fast, took {int(iters)}"
    np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-10)


def test_mg_plan_levels():
    plan = plan_mg_slabs(StructuredBox(32, 16, 16), 4, min_size=2)
    assert [lv.box.nx for lv in plan.levels] == [32, 16, 8, 4]
    assert [lv.px for lv in plan.levels] == [8, 4, 2, 1]
