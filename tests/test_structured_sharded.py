"""Sharded structured path: x-slab decomposition partition invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcanefem_tpu.mesh.structured import StructuredBox, apply_penalty_dirichlet
from arcanefem_tpu.parallel.structured_sharded import (
    gather_global,
    make_structured_step,
    plan_slabs,
    slab_coords,
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


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_structured_slab_invariance(n_dev):
    box = StructuredBox(16, 6, 5)
    c3d = jnp.asarray(box.grid_coords(np.float64, jitter=0.1))
    mask = box.boundary_mask(("xmin", "xmax"))
    gv = np.zeros(box.n_nodes)
    gv[box.boundary_mask(("xmax",))] = 1.0
    ref = _reference(box, c3d, mask, gv)

    plan = plan_slabs(box, n_dev)
    devs = jax.devices()[:n_dev]
    mesh = jax.sharding.Mesh(np.array(devs), ("xslabs",))
    shard = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("xslabs"))

    cs = jax.device_put(slab_coords(plan, np.asarray(c3d)), shard)
    ms, vs = slab_mask_values(plan, mask, gv)
    ms = jax.device_put(jnp.asarray(ms), shard)
    vs = jax.device_put(jnp.asarray(vs), shard)

    step = make_structured_step(plan, mesh, rtol=1e-11, max_iter=3000)
    x, iters, res = step(cs, ms, vs, 2.0)
    got = gather_global(plan, np.asarray(x))
    np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-10)
