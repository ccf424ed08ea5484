"""Probe the lane-major tetra assembler at benchmark scale on TPU.

Usage: python tools/probe_assembly.py [--h 5] [--refine 2] [--check]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=5.0)
    ap.add_argument("--refine", type=int, default=2)
    ap.add_argument("--check", action="store_true",
                    help="verify against the element-centric path (small)")
    args = ap.parse_args()

    from tools.bench_unstructured import load_mesh

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arcanefem_tpu.ops.lane_assembly import TetraLaneAssembler
    from arcanefem_tpu.sparse.topology import build_topology

    mesh = load_mesh(args.h, args.refine)
    print(f"[mesh] {mesh.n_nodes:,} nodes / {mesh.n_cells:,} tets", flush=True)
    t0 = time.time()
    topo = build_topology(mesh.n_nodes, mesh.cells)
    print(f"[topo] W={topo.width} ({time.time()-t0:.1f}s)", flush=True)

    coords = jnp.asarray(mesh.coords.astype(np.float32))
    t0 = time.time()
    asm = TetraLaneAssembler(topo, mesh.cells["tetra4"])
    print(f"[plan] {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    vals = asm(coords)
    s = float(jnp.sum(vals))
    print(f"[first] {time.time()-t0:.1f}s sum={s:.6g}", flush=True)

    def run(reps):
        t0 = time.time()
        for _ in range(reps):
            v = asm(coords)
        _ = float(jnp.sum(v))
        return time.time() - t0

    t1 = min(run(1) for _ in range(2))
    t2 = min(run(4) for _ in range(2))
    dt = max((t2 - t1) / 3, 1e-9)
    print(f"[asm] {dt*1e3:.1f} ms -> {mesh.n_nodes/dt/1e6:.1f} MDoF/s",
          flush=True)

    if args.check:
        from arcanefem_tpu.ops import elements

        conn = jnp.asarray(mesh.cells["tetra4"])
        ke = elements.stiffness_tetra4(coords[conn])
        ref = jax.ops.segment_sum(
            ke.reshape(-1),
            jnp.asarray(topo.slot_maps["tetra4"].reshape(-1)),
            num_segments=topo.n_slots,
        ).reshape(topo.n_nodes, topo.width)
        err = float(jnp.max(jnp.abs(vals - ref)))
        print(f"[check] max abs err vs element path: {err:.3g}", flush=True)


if __name__ == "__main__":
    main()
