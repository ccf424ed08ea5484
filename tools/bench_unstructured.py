"""Unstructured sphere_cut SpMV / assembly / solve bench harness.

Builds (and caches to /tmp) an RCM-ordered refined Delaunay tetra mesh of
the reference's sphere_cut geometry, then measures the Pallas window SpMV
against the XLA gather fallback, and optionally the full AMG-PCG solve.

Usage: python tools/bench_unstructured.py [--h 5] [--refine 1] [--solve]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcanefem_tpu.utils.cache import CACHE_DIR


def load_mesh(h: float, refine: int, cache_dir=CACHE_DIR):
    os.makedirs(cache_dir, exist_ok=True)
    tag = f"sphere_cut_v2_h{h:g}_r{refine}"  # v2: BCC lattice + adaptive-diagonal refinement
    path = os.path.join(cache_dir, tag + ".npz")
    from arcanefem_tpu.mesh.core import Mesh

    if os.path.exists(path):
        z = np.load(path)
        mesh = Mesh(
            coords=z["coords"], node_uids=z["uids"],
            cells={"tetra4": z["tets"]}, dim=3,
            face_groups={
                "Cut": {"tria3": z["cut"]},
                "sphere": {"tria3": z["sphere"]},
            },
        )
        return mesh
    from arcanefem_tpu.mesh.unstructured import (
        refine_tetra, sphere_cut_tetra_mesh,
    )

    t0 = time.time()
    mesh = sphere_cut_tetra_mesh(h=h)
    for _ in range(refine):
        mesh = refine_tetra(mesh)
    print(f"[mesh] built {mesh.n_nodes} nodes / {mesh.n_cells} tets "
          f"in {time.time()-t0:.1f}s", flush=True)
    # RCM order before caching
    from arcanefem_tpu.sparse.topology import build_topology
    from arcanefem_tpu.utils.ordering import rcm_order, renumber_mesh

    t0 = time.time()
    topo = build_topology(mesh.n_nodes, mesh.cells)
    perm = rcm_order(mesh.n_nodes, topo.row_ptr, topo.csr_cols)
    mesh = renumber_mesh(mesh, perm)
    print(f"[mesh] rcm in {time.time()-t0:.1f}s", flush=True)
    np.savez(
        path, coords=mesh.coords, uids=mesh.node_uids,
        tets=mesh.cells["tetra4"],
        cut=mesh.face_groups["Cut"]["tria3"],
        sphere=mesh.face_groups["sphere"]["tria3"],
    )
    return mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=5.0)
    ap.add_argument("--refine", type=int, default=1)
    ap.add_argument("--block-rows", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--solve", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    mesh = load_mesh(args.h, args.refine)
    print(f"[mesh] {mesh.n_nodes} nodes, {mesh.n_cells} tets", flush=True)

    from arcanefem_tpu.sparse.topology import build_topology

    t0 = time.time()
    topo = build_topology(mesh.n_nodes, mesh.cells)
    print(f"[topo] W={topo.width} nnz={topo.nnz} "
          f"pad-overhead={topo.n_slots/topo.nnz:.2f}x ({time.time()-t0:.1f}s)",
          flush=True)

    from arcanefem_tpu.sparse.pallas_spmv import plan_windows

    t0 = time.time()
    plan = plan_windows(topo, block_rows=args.block_rows)
    if plan is None:
        print("[plan] NONE — planner failed")
    else:
        print(f"[plan] S={len(plan.slot_rows)} slot_rows={plan.slot_rows} "
              f"V_tot={plan.window} nb={plan.n_blocks} "
              f"({time.time()-t0:.1f}s)", flush=True)

    import jax
    import jax.numpy as jnp

    # assemble Poisson stiffness values (XLA segment-sum; assembly timing
    # is measured separately in the full bench)
    from arcanefem_tpu.ops import elements

    coords = jnp.asarray(mesh.coords.astype(np.float32))
    conn = jnp.asarray(mesh.cells["tetra4"])

    # slot_map rides as a jit ARGUMENT: closure capture turns the 28M-entry
    # map into an HLO literal, which cost a 466 s remote compile
    slot_map = jnp.asarray(topo.slot_maps["tetra4"].reshape(-1))

    @jax.jit
    def assemble(c, cn, sm):
        ke = elements.stiffness_tetra4(c[cn])
        return jax.ops.segment_sum(
            ke.reshape(-1), sm, num_segments=topo.n_slots
        ).reshape(topo.n_nodes, topo.width)

    t0 = time.time()
    vals = assemble(coords, conn, slot_map)
    vals.block_until_ready()
    print(f"[assemble] segment-sum {time.time()-t0:.1f}s (incl compile)",
          flush=True)

    x = jnp.asarray(np.random.RandomState(0).rand(mesh.n_nodes).astype(np.float32))
    ecols = jnp.asarray(topo.ell_cols)

    @jax.jit
    def spmv_xla(v, xx):
        return jnp.sum(v * xx[ecols], axis=1)

    y_ref = spmv_xla(vals, x)
    y_ref.block_until_ready()
    t0 = time.time()
    for _ in range(3):
        y_ref = spmv_xla(vals, x)
    y_ref.block_until_ready()
    dt_xla = (time.time() - t0) / 3
    print(f"[xla] spmv {dt_xla*1e3:.1f} ms "
          f"({topo.n_slots/dt_xla/1e9:.2f} Gelem/s)", flush=True)

    if plan is not None and not args.no_pallas:
        from arcanefem_tpu.sparse.pallas_spmv import PallasBellSpmv

        sp = PallasBellSpmv(topo, block_rows=args.block_rows)
        t0 = time.time()
        y = sp(vals, x)
        y.block_until_ready()
        print(f"[pallas] first call {time.time()-t0:.1f}s (incl compile)",
              flush=True)
        err = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
        print(f"[pallas] rel err vs xla: {err:.2e}", flush=True)
        t0 = time.time()
        for _ in range(args.iters):
            y = sp(vals, x)
        y.block_until_ready()
        dt = (time.time() - t0) / args.iters
        bytes_touched = topo.n_slots * 8  # values + lcols (f32/int32)
        print(f"[pallas] spmv {dt*1e3:.2f} ms "
              f"({topo.n_slots/dt/1e9:.2f} Gelem/s, "
              f"{bytes_touched/dt/1e9:.0f} GB/s, {dt_xla/dt:.1f}x over xla)",
              flush=True)

    if args.solve:
        run_solve(mesh, topo)


def run_solve(mesh, topo):
    """Full Poisson Dirichlet solve with AMG-PCG, timed."""
    from arcanefem_tpu.fem.bcs import BoundaryConditions, DirichletBC
    from arcanefem_tpu.models import poisson
    from arcanefem_tpu.solver.linear_system import SolverOptions

    bcs = BoundaryConditions(
        dirichlet=[DirichletBC("Cut", 0.0), DirichletBC("sphere", 1.0)]
    )
    cfg = poisson.PoissonConfig(
        f=1.0, bcs=bcs,
        solver=SolverOptions(rtol=1e-8, preconditioner="amg", spmv="pallas"),
    )
    t0 = time.time()
    r = poisson.solve(mesh, cfg)
    t_first = time.time() - t0
    t0 = time.time()
    r = poisson.solve(mesh, cfg)
    t_second = time.time() - t0
    print(f"[solve] first {t_first:.1f}s warm {t_second:.1f}s "
          f"iters={r.iterations}", flush=True)


if __name__ == "__main__":
    main()
