"""Stage-level timing of the PRODUCTION fine SpMV (the bench default).

The solve's fine operator is M.mats[0] — a _PlannedMat whose gather is
built by build_amg's to_bell: PlannedGather.build(cols, vals,
compact=True), i.e. (at W=25 > wcap=16) the nested chain

  [pre]    W=1 compact column pre-gather over per-block distinct cols
  [main]   the compact-window subrow sweep (weights = matrix values)
  [sub]    per-row subrow sums (near-perfect windows)

This probe builds that exact gather from a cached topology + random
values, times the full apply and each leg separately (shared bench
idiom, utils/timing.py), and prints the plan-model lane units per leg so
measured ms can be checked against the sweep cost model.

Usage: python tools/probe_compact_stages.py [topo_npz]
Writes .cache/queue_results/probe_compact_stages.jsonl
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOPO = sys.argv[1] if len(sys.argv) > 1 else \
    ".cache/afem_meshes/topo_sphere_cut_v3_h5_r2_sn.npz"


def legs_of(g):
    """Flatten a (nested) ChainedGather into its PlannedGather legs."""
    from arcanefem_tpu.sparse.pallas_spmv import ChainedGather

    if isinstance(g, ChainedGather):
        return legs_of(g.stage1) + legs_of(g.stage2)
    return [g]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arcanefem_tpu.sparse.pallas_spmv import PlannedGather
    from arcanefem_tpu.utils.timing import time_op

    z = np.load(TOPO)
    n, W = int(z["n_nodes"]), int(z["width"])
    valid = np.asarray(z["ell_valid"], bool).reshape(n, W)
    cols = np.where(valid, z["ell_cols"].reshape(n, W), 0)
    rng = np.random.RandomState(0)
    vals = (rng.rand(n, W).astype(np.float32) - 0.5) * valid
    x = jnp.asarray(rng.rand(n).astype(np.float32))
    print(f"n={n:,} W={W} nnz={int(valid.sum()):,}", flush=True)

    t0 = time.time()
    wcap = int(os.environ.get("AFEM_SPMV_WCAP", "16"))
    g = PlannedGather.build(cols, vals, compact=True, wcap=wcap)
    print(f"plan built {time.time()-t0:.0f}s", flush=True)
    legs = legs_of(g)
    for i, leg in enumerate(legs):
        if hasattr(leg, "band"):  # BandedRowSum (banded stage-2)
            b = leg.band
            print(f"leg{i}: BANDSUM K={b.key[0]} G={b.key[1]} "
                  f"nb={b.key[2]} tiles={b.n_tiles} W2={leg.W2} "
                  f"units={b.key[2]*b.key[1]*b.key[0]/1e6:.1f}M",
                  flush=True)
            continue
        if hasattr(leg, "n_narrow"):  # BandedGather
            K, G, nb = leg.key
            wdesc = ""
            if leg.wide is not None:
                Gw, srw, nbw = leg.wide.key
                wdesc = (f" wide(nb={nbw} G={Gw} VL={sum(srw)} "
                         f"lane_units={nbw*Gw*sum(srw)/1e6:.1f}M)")
            print(f"leg{i}: BAND K={K} G={G} nb={nb} "
                  f"narrow={leg.n_narrow}/{leg.n_tiles} "
                  f"narrow_units={nb*G*K/1e6:.1f}M{wdesc}", flush=True)
            continue
        G, sr, nb = leg.key
        print(f"leg{i}: nb={nb} G={G} VL={sum(sr)} slots={len(sr)} "
              f"W={leg.width} rows={leg.n_rows} "
              f"unit={leg.vals_tiled is None} "
              f"lane_units={nb*G*sum(sr)/1e6:.1f}M", flush=True)

    recs = []

    def rec(name, ms, **kw):
        r = {"stage": name, "ms": round(ms * 1e3, 3), **kw}
        print(json.dumps(r), flush=True)
        recs.append(r)

    f_apply = jax.jit(lambda gg, v: gg(v))
    # hardware parity gate before timing: the chain must be the same
    # linear map as the direct ELL product
    y = np.asarray(f_apply(g, x))
    x_np = np.asarray(x)
    ref = (vals * x_np[cols]).sum(axis=1)
    err = float(np.max(np.abs(y - ref)) / (np.max(np.abs(ref)) + 1e-30))
    print(f"parity vs ELL product: rel_err={err:.2e}", flush=True)
    assert err < 1e-5, "chain output mismatch"
    rec("full", time_op(f_apply, g, x))
    inp = x
    for i, leg in enumerate(legs):
        rec(f"leg{i}", time_op(f_apply, leg, inp))
        inp = f_apply(leg, inp)

    out_path = ".cache/queue_results/probe_compact_stages.jsonl"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
