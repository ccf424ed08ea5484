"""Phase-level timing of the window-gather tetra assembly on TPU.

The bench measures assembly end-to-end (1.69s at 1.9M, q6_asmwin); this
probe splits it into its three device phases so the next optimization
targets the right one:

  1. coords gather      — 3 window sweeps over the (4nc, 1) plan (132M
                          gathers; each node's coord re-streamed
                          ~cells-per-node times by the direct sweep)
  2. ke10 + transpose   — elementwise cofactor math (10, nc) + the
                          cell-major HBM transpose feeding the reducer
  3. reducer            — the SortedEntryAssembler split window gather
                          (176M entries -> 27.9M BELL slots)

`--compact` A/Bs the per-block distinct-source pre-gather
(AFEM_ASM_COMPACT=1) on the same mesh.  Reuses every bench cache
(mesh, sn order, topology, assembler-plan pickles).

Usage: python tools/probe_asm_phases.py [--h 5] [--refine 2] [--compact]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=(1, 3)):
    """Two-rep-count slope timing with host-fetch completion forcing."""
    import jax.numpy as jnp

    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))

    def run(r):
        t0 = time.time()
        for _ in range(r):
            o = fn(*args)
        _ = float(jnp.sum(o[0] if isinstance(o, tuple) else o))
        return time.time() - t0

    r1, r2 = reps
    t1 = min(run(r1) for _ in range(2))
    t2 = min(run(r2) for _ in range(2))
    return (t2 - t1) / (r2 - r1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=5.0)
    ap.add_argument("--refine", type=int, default=2)
    ap.add_argument("--compact", action="store_true")
    args = ap.parse_args()
    if args.compact:
        os.environ["AFEM_ASM_COMPACT"] = "1"
    os.environ.setdefault("BENCH_UNSTR_H", str(args.h))
    os.environ.setdefault("BENCH_UNSTR_REFINE", str(args.refine))

    import jax
    import jax.numpy as jnp

    import bench
    from bench import CACHE_DIR, _load_topology, _pickle_cache, log

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(bench.__file__),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform == "tpu", "probe needs the TPU"

    # -- mesh + sn order + topology, via the bench caches ------------------
    from arcanefem_tpu.mesh.core import Mesh

    h, refine = args.h, args.refine
    key = f"sphere_cut_v3_h{h:g}_r{refine}"
    snpath = os.path.join(CACHE_DIR, key + "_snmesh.npz")
    if not os.path.exists(snpath):
        sys.exit(f"missing sn-mesh cache {snpath}; run bench.py first")
    z = np.load(snpath)
    mesh = Mesh(
        coords=z["coords"], node_uids=z["uids"],
        cells={"tetra4": z["tets"]}, dim=3,
        face_groups={"Cut": {"tria3": z["cut"]},
                     "sphere": {"tria3": z["sphere"]}},
    )
    key += "_sn"
    topo = _load_topology(mesh, key)
    log(f"[probe] {mesh.n_nodes:,} nodes, {mesh.n_cells:,} tets, "
        f"nnz={topo.nnz:,}")

    from arcanefem_tpu.ops.lane_assembly import TetraLaneAssembler

    suffix = "_c" if args.compact else ""
    asm, _ = _pickle_cache(
        os.path.join(CACHE_DIR, f"asmplan_{key}_window{suffix}_tpu_v2.pkl"),
        lambda: TetraLaneAssembler(topo, mesh.cells["tetra4"],
                                   reduce="window"),
        f"assembler plan (window{suffix})",
        validate=lambda a: (a.reducer_kind == "window"
                            and getattr(a, "compact", False) == args.compact),
    )
    if asm.reducer_kind != "window":
        sys.exit("window reducer unavailable on this mesh")
    coords = jnp.asarray(mesh.coords.astype(np.float32))
    nc = asm.n_cells

    # -- full pipeline ------------------------------------------------------
    t = timed(lambda c: asm(c), coords)
    log(f"[probe] full assembly        {t*1e3:9.1f} ms")

    # -- phase 1: coords gather ---------------------------------------------
    @jax.jit
    def coords_gather(g, c):
        return g(c[:, 0]), g(c[:, 1]), g(c[:, 2])

    t1 = timed(lambda g, c: coords_gather(g, c), asm.gather, coords)
    log(f"[probe] coords gather (3x)   {t1*1e3:9.1f} ms")

    @jax.jit
    def coords_gather_batched(g, c):
        return g.call_batched(c.T)

    try:
        tb = timed(lambda g, c: coords_gather_batched(g, c),
                   asm.gather, coords)
        log(f"[probe] coords batched       {tb*1e3:9.1f} ms")
    except Exception as e:  # pragma: no cover - probe-only
        log(f"[probe] coords batched       FAILED: {e}")

    # -- phase 2: ke10 + transpose (gathered coords as inputs) --------------
    xg = coords_gather(asm.gather, coords)

    @jax.jit
    def ke_flat(xg, yg, zg):
        x = [xg.reshape(-1, 4).T[i] for i in range(4)]
        y = [yg.reshape(-1, 4).T[i] for i in range(4)]
        z = [zg.reshape(-1, 4).T[i] for i in range(4)]
        ax, ay, az = x[1] - x[0], y[1] - y[0], z[1] - z[0]
        bx, by, bz = x[2] - x[0], y[2] - y[0], z[2] - z[0]
        cx, cy, cz = x[3] - x[0], y[3] - y[0], z[3] - z[0]
        v6 = (ax * (by * cz - bz * cy) + ay * (bz * cx - bx * cz)
              + az * (bx * cy - by * cx))
        inv = 1.0 / jnp.abs(v6)

        def comp(u, w):
            return [
                u[1] * (w[3] - w[2]) + u[2] * (w[1] - w[3])
                + u[3] * (w[2] - w[1]),
                u[0] * (w[2] - w[3]) + u[2] * (w[3] - w[0])
                + u[3] * (w[0] - w[2]),
                u[0] * (w[3] - w[1]) + u[1] * (w[0] - w[3])
                + u[3] * (w[1] - w[0]),
                u[0] * (w[1] - w[2]) + u[1] * (w[2] - w[0])
                + u[2] * (w[0] - w[1]),
            ]

        dx, dy, dz = comp(y, z), comp(z, x), comp(x, y)
        scale = inv / 6.0
        ke10 = jnp.stack([
            (dx[i] * dx[j] + dy[i] * dy[j] + dz[i] * dz[j]) * scale
            for i in range(4) for j in range(i, 4)
        ])
        return ke10.T.reshape(-1)

    t2 = timed(lambda a, b, c: ke_flat(a, b, c), *xg)
    log(f"[probe] ke10 + transpose     {t2*1e3:9.1f} ms")

    # same math, lane-major output (no cell-major transpose): the delta
    # is the transpose cost a lane-major reducer entry_map would remove
    @jax.jit
    def ke_lane(xg, yg, zg):
        return ke_flat.__wrapped__(xg, yg, zg).reshape(-1, 10).T

    try:
        t2b = timed(lambda a, b, c: ke_lane(a, b, c), *xg)
        log(f"[probe] ke10 (lane-major)    {t2b*1e3:9.1f} ms"
            f"  (transpose cost ~{(t2-t2b)*1e3:.1f} ms)")
    except Exception as e:  # pragma: no cover - probe-only
        log(f"[probe] ke10 (lane-major)    FAILED: {e}")

    # -- phase 3: reducer -----------------------------------------------------
    table = ke_flat(*xg)
    del xg

    @jax.jit
    def reduce(r, t):
        return r(t)

    t3 = timed(lambda r, t: reduce(r, t), asm.reducer, table)
    log(f"[probe] reducer              {t3*1e3:9.1f} ms")
    log(f"[probe] phase sum {((t1+t2+t3))*1e3:.1f} ms vs full {t*1e3:.1f} ms"
        f"  (XLA fusion across phases accounts for the gap)")


if __name__ == "__main__":
    main()
