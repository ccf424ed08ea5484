"""A/B the blocked (b×b) window SpMV against the scalar compact sweep on
the REAL cached bench topology (1.9M sphere_cut by default).

Usage: python tools/probe_blocked.py [topo_npz] [b,wcap ...]
Defaults: .cache/afem_meshes/topo_sphere_cut_v3_h5_r2_sn.npz, arms
"2,8 4,8 4,16".  Random values (sweep cost is value-independent); each
arm parity-checks against the scalar XLA BELL product on a small slice.

Writes one JSON line per arm to stdout and
.cache/queue_results/probe_blocked.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOPO = sys.argv[1] if len(sys.argv) > 1 else \
    ".cache/afem_meshes/topo_sphere_cut_v3_h5_r2_sn.npz"
ARMS = [tuple(int(v) for v in a.split(",")) for a in sys.argv[2:]] or \
    [(2, 8), (4, 8), (4, 16)]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    z = np.load(TOPO)
    n = int(z["n_nodes"])
    rp, cc = z["row_ptr"], z["csr_cols"]
    rng = np.random.RandomState(0)
    data = rng.rand(len(cc)).astype(np.float32) - 0.5
    x_np = rng.rand(n).astype(np.float32)
    x = jnp.asarray(x_np)
    print(f"n={n:,} nnz={len(cc):,}", flush=True)

    # scipy reference on a slice for parity
    import scipy.sparse as sp

    A = sp.csr_matrix((data.astype(np.float64), cc, rp), shape=(n, n))
    y_ref = A @ x_np.astype(np.float64)
    print("scipy ref done", flush=True)

    out_path = ".cache/queue_results/probe_blocked.jsonl"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    results = []

    # the bench's in-solve timing idiom, shared (utils/timing.py) — the
    # old chained form disagreed with the solve by 40% (VERDICT r4 #3);
    # AFEM_PROBE_CHAINED=1 reproduces it for harness-diagnosis only
    from arcanefem_tpu.utils.timing import time_op, time_op_chained

    chained = os.environ.get("AFEM_PROBE_CHAINED") == "1"

    def timed(fn, x0):
        y = fn(x0)
        _ = float(jnp.sum(y))
        print("  compiled+first done", flush=True)
        if chained:
            return time_op_chained(fn, x0), y
        return time_op(fn, x0, reps=5, outer=2), y

    # baseline: the scalar compact sweep (the current bench default)
    from arcanefem_tpu.sparse.bell import BellMatrix
    from arcanefem_tpu.sparse.pallas_spmv import as_pallas_matrix
    from arcanefem_tpu.sparse.topology import Topology

    topo = Topology(
        n_nodes=n, width=int(z["width"]), ell_cols=z["ell_cols"],
        ell_valid=z["ell_valid"], row_ptr=rp, csr_cols=cc,
        csr_to_ell=z["csr_to_ell"], diag_slot=z["diag_slot"],
        slot_maps={},
    )
    vals_ell = np.zeros(n * int(z["width"]), np.float32)
    vals_ell[z["csr_to_ell"]] = data
    os.environ.setdefault("AFEM_SPMV", "compact")
    t0 = time.time()
    Abell = as_pallas_matrix(BellMatrix(
        values=jnp.asarray(vals_ell.reshape(n, int(z["width"]), 1, 1)),
        topo=topo, block=1, cols=jnp.asarray(z["ell_cols"]),
    ))
    build_s = time.time() - t0
    print(f"scalar compact built {build_s:.0f}s", flush=True)
    # the operator must ride as a jit ARGUMENT (pytree) — closing over
    # it turns plan arrays into HLO literals and overflows remote-compile
    # (HTTP 413 at 1.9M, measured)
    spf = jax.jit(lambda op, xx: op.spmv(xx))
    ms, y = timed(lambda xx: spf(Abell, xx), x)
    err = float(np.max(np.abs(np.asarray(y) - y_ref))
                / max(np.max(np.abs(y_ref)), 1e-30))
    rec = {"arm": "scalar_compact", "ms": round(ms * 1e3, 3),
           "build_s": round(build_s, 1), "rel_err": err}
    print(json.dumps(rec), flush=True)
    results.append(rec)

    from arcanefem_tpu.sparse.blocked import BlockedGather

    for b, wcap in ARMS:
        t0 = time.time()
        g = BlockedGather.build_csr(cc, rp, data, n, b=b, wcap=wcap)
        build_s = time.time() - t0
        if g is None:
            rec = {"arm": f"block{b}_w{wcap}", "ms": None,
                   "build_s": round(build_s, 1), "note": "no plan"}
        else:
            gf = jax.jit(lambda gg, xx: gg(xx))
            ms, y = timed(lambda xx: gf(g, xx), x)
            err = float(np.max(np.abs(np.asarray(y) - y_ref))
                        / max(np.max(np.abs(y_ref)), 1e-30))
            hbm_mb = sum(
                a.nbytes for a in jax.tree_util.tree_leaves(g)
            ) / 1e6
            rec = {"arm": f"block{b}_w{wcap}", "ms": round(ms * 1e3, 3),
                   "build_s": round(build_s, 1), "rel_err": err,
                   "plan_mb": round(hbm_mb, 1)}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    with open(out_path, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
