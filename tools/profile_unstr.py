"""Per-component timing of the unstructured AMG-PCG iteration.

Decomposes bench.py's unstructured primary (sphere_cut, default 1.9M DoF)
into its per-iteration pieces so the next optimization target is measured,
not guessed: fine-level SpMV, per-level SpMVs, transfer down/up (level 0),
Chebyshev fine smoother, one full V-cycle, and the solve's own ms/iter.

Expected decomposition at 1.9M (window kernel, cheb2 V(1,1)): a PCG
iteration spends 5 fine SpMVs (1 Krylov A·p + 4 in the V-cycle: 1 in the
pre-smooth, 1 level residual, 2 in the post-smooth), so ~5x the fine SpMV
plus transfers + coarse levels + dots should reconcile with the measured
ms/iter; whatever gap remains is layout/dispatch overhead.

Measurement pattern (proven through the axon tunnel, tools/profile_iter.py):
each probe is ONE jit taking (k, operator pytrees, vector) and running a
`lax.fori_loop` whose body applies the component; k is a dynamic bound so
t(k2)-t(k1) cancels setup and host RTT.  Operators ride as jit ARGUMENTS
(closure literals overflow remote-compile at this size, HTTP 413).

Run from the repo root AFTER bench.py has primed the /tmp caches:
    python tools/profile_unstr.py            # default bench config
Honors the same env knobs as bench.py (BENCH_UNSTR_SPMV, BENCH_AMG_*).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcanefem_tpu.utils.cache import CACHE_DIR


def main():
    import bench  # reuse the bench loaders/caches; import has no side effects

    jax = bench._setup_jax()
    import jax.numpy as jnp
    from jax import lax

    if jax.devices()[0].platform != "tpu":
        print("needs the TPU backend", file=sys.stderr)
        sys.exit(1)

    # ---- replicate the bench system exactly (cheap: all /tmp-cached) ----
    from arcanefem_tpu.solver.amg import build_amg
    from arcanefem_tpu.sparse.bell import BellMatrix
    from arcanefem_tpu.sparse.pallas_spmv import as_pallas_matrix
    from arcanefem_tpu.ops.lane_assembly import TetraLaneAssembler
    from arcanefem_tpu.mesh.core import Mesh
    from arcanefem_tpu.sparse.supernode import supernode_order
    from arcanefem_tpu.utils.ordering import renumber_mesh

    h = float(os.environ.get("BENCH_UNSTR_H", "5"))
    refine = int(os.environ.get("BENCH_UNSTR_REFINE", "2"))
    mesh = bench._load_sphere_cut(h, refine)
    key = f"sphere_cut_v3_h{h:g}_r{refine}"
    spmv_mode = os.environ.get("BENCH_UNSTR_SPMV", "window")
    if spmv_mode == "compact":
        os.environ["AFEM_SPMV"] = "compact"
    if os.environ.get("BENCH_UNSTR_ORDER", "sn") != "rcm":
        snpath = os.path.join(CACHE_DIR, key + "_snmesh.npz")
        if os.path.exists(snpath):
            z = np.load(snpath)
            mesh = Mesh(coords=z["coords"], node_uids=z["uids"],
                        cells={"tetra4": z["tets"]}, dim=3,
                        face_groups={"Cut": {"tria3": z["cut"]},
                                     "sphere": {"tria3": z["sphere"]}})
        else:
            topo_rcm = bench._load_topology(mesh, key)
            mesh = renumber_mesh(mesh, supernode_order(topo_rcm, mesh.coords))
        key += "_sn"
    topo = bench._load_topology(mesh, key)
    n, W = topo.n_nodes, topo.width
    print(f"[prof] {n:,} nodes, W={W}, nnz={topo.nnz:,}", flush=True)

    coords = jnp.asarray(mesh.coords.astype(np.float32))
    asm = TetraLaneAssembler(topo, mesh.cells["tetra4"])
    vals = np.asarray(asm(coords))

    penalty = 1.0e12
    cut = np.unique(mesh.face_groups["Cut"]["tria3"])
    sph = np.unique(mesh.face_groups["sphere"]["tria3"])
    mask = np.zeros(n, bool)
    mask[cut] = True
    mask[sph] = True
    flat = vals.reshape(-1).copy()
    flat[np.asarray(topo.diag_slot)[mask]] = penalty
    A = BellMatrix(
        values=jnp.asarray(flat.reshape(n, W, 1, 1).astype(jnp.float32)),
        topo=topo, block=1, cols=jnp.asarray(topo.ell_cols),
    )

    amg_smoother = os.environ.get("BENCH_AMG_SMOOTHER", "chebyshev")
    _cd = os.environ.get("BENCH_AMG_CHEB_DEG", "2")
    amg_cheb = tuple(int(x) for x in _cd.split(",")) if "," in _cd else int(_cd)
    amg_theta = float(os.environ.get("BENCH_AMG_THETA", "0.03"))
    amg_compact = os.environ.get("AFEM_SPMV") == "compact"
    amg_path = os.path.join(
        CACHE_DIR,
        f"amg_{key}_{amg_smoother}{str(amg_cheb).replace(' ', '')}"
        f"_t{amg_theta:g}_tpu_p{penalty:g}"
        f"{'_compact' if amg_compact else ''}_v2.pkl")
    M, cached = bench._pickle_cache(
        amg_path,
        lambda: build_amg(A, smoother=amg_smoother, cheb_deg=amg_cheb,
                          theta=amg_theta),
        "AMG hierarchy")
    print(f"[prof] AMG levels={[m.topo.n_nodes for m in M.mats]} "
          f"(cached={cached})", flush=True)
    Ap = M.mats[0] if hasattr(M.mats[0], "gather") else as_pallas_matrix(A)

    x0 = jnp.asarray(np.random.RandomState(0).rand(n).astype(np.float32))

    # ---- slope-timed probes: jit(k, pytrees..., v) -> scalar ----
    def probe(name, fn, *ops, k1=2, k2=8, v=x0):
        """fn(ops..., v) -> vector of v's shape; timed via fori_loop slope."""
        @jax.jit
        def run(k, ops, v):
            def body(_, x):
                y = fn(ops, x)
                # renormalize so k repeats can't overflow f32
                return y / (jnp.linalg.norm(y) + 1e-30)
            return jnp.sum(lax.fori_loop(0, k, body, v))

        _ = float(run(k1, ops, v))  # compile+first
        def t(k):
            t0 = time.time()
            _ = float(run(k, ops, v))
            return time.time() - t0
        t1 = min(t(k1) for _ in range(3))
        t2 = min(t(k2) for _ in range(3))
        ms = (t2 - t1) / (k2 - k1) * 1e3
        print(f"[prof] {name:<28s} {ms:8.2f} ms", flush=True)
        return ms

    r = {}
    r["fine_spmv"] = probe("fine SpMV (A·p)", lambda o, x: o[0].spmv(x), Ap)
    for l in range(1, len(M.mats)):
        nl = M.mats[l].topo.n_nodes
        vl = jnp.asarray(np.random.RandomState(l).rand(nl).astype(np.float32))
        r[f"spmv_l{l}"] = probe(
            f"level-{l} SpMV (n={nl:,})",
            lambda o, x: o[0].spmv(x), M.mats[l], v=vl)
    # transfers at level 0 (down: fine->coarse then back up so the loop
    # state keeps the fine shape; reported as down+up PAIR)
    r["transfer_pair_l0"] = probe(
        "transfer down+up (level 0)",
        lambda o, x: o[0]._transfer_up(0, o[0]._transfer_down(0, x)), M)
    r["cheb_smooth_l0"] = probe(
        "cheb fine smoother (x=None)",
        lambda o, x: o[0]._smooth_cheb(0, x), M)
    r["vcycle"] = probe("full V-cycle apply", lambda o, x: o[0].apply(x), M,
                        k1=1, k2=4)
    # compensated dot (the PCG's per-iteration scalar work, 3x per iter)
    from arcanefem_tpu.solver.iterative import precise_dot
    r["precise_dot"] = probe(
        "compensated dot (pair)",
        lambda o, x: x * (precise_dot(x, x) / (precise_dot(x, x) + 1.0)),
        Ap, k1=4, k2=16)

    deg = M._deg(0) if hasattr(M, "_deg") else 2
    model = (2 * deg + 1) * r["fine_spmv"] + r["transfer_pair_l0"] + sum(
        v for k_, v in r.items() if k_.startswith("spmv_l"))
    print(f"[prof] model ms/iter ≈ (2·deg+1)·fine + transfers + coarse = "
          f"{model:.1f} ms (deg={deg}; excludes dots/axpys)", flush=True)
    print({k_: round(v_, 2) for k_, v_ in r.items()})


if __name__ == "__main__":
    main()
