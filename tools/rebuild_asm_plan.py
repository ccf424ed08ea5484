"""Regenerate the window-assembler plan pickle for the default bench key.

Run after any change that invalidates cached TetraLaneAssembler objects
(e.g. the 2026-08-20 corner-major coords-plan change) so the driver's
bench run never pays the rebuild (the BENCH_r03 failure mode).  Builds
with the SAME lambda + validate as bench.py and overwrites the cache.

Usage: python tools/rebuild_asm_plan.py [h] [refine]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import bench
    from arcanefem_tpu.mesh.core import Mesh
    from arcanefem_tpu.ops.lane_assembly import TetraLaneAssembler
    from arcanefem_tpu.utils.cache import CACHE_DIR

    h = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    refine = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    platform = jax.devices()[0].platform
    key = f"sphere_cut_v3_h{h:g}_r{refine}"
    z = np.load(os.path.join(CACHE_DIR, key + "_snmesh.npz"))
    mesh = Mesh(coords=z["coords"], node_uids=z["uids"],
                cells={"tetra4": z["tets"]}, dim=3,
                face_groups={"Cut": {"tria3": z["cut"]},
                             "sphere": {"tria3": z["sphere"]}})
    topo = bench._load_topology(mesh, key + "_sn")
    plan_path = os.path.join(
        CACHE_DIR, f"asmplan_{key}_sn_window_{platform}_v2.pkl")
    # drop the stale pickle so _pickle_cache rebuilds
    if os.path.exists(plan_path):
        os.unlink(plan_path)
    t0 = time.time()
    asm, cached = bench._pickle_cache(
        plan_path,
        lambda: TetraLaneAssembler(topo, mesh.cells["tetra4"],
                                   reduce="window"),
        "assembler plan (window)",
        validate=lambda a: (a.reducer_kind == "window"
                            and not getattr(a, "compact", False)
                            and getattr(a, "coords_order", "cell")
                            == "corner"),
    )
    print(f"rebuilt in {time.time()-t0:.0f}s -> {plan_path} "
          f"(order={getattr(asm, 'coords_order', 'cell')})", flush=True)


if __name__ == "__main__":
    main()
