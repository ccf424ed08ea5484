"""Stage-level timing of the SCALAR compact SpMV (the bench default).

The champion fine SpMV (CompactBellSpmv) is three pieces:

  pre     — stage-1 compact column pre-gather  xc = x[uniq]  (ChainedGather
            or plain W=1 PlannedGather over the per-block distinct cols)
  main    — the compact-window main sweep (_products over window-local
            indices; windows = per-block uniq runs)
  rowsum  — prods (nb, G, 128) -> y rows; W=25 does NOT divide 128, so
            this is the generic reshape(nb*R, W).sum(1) whose tiled
            relayout may pad 25 -> 128 lanes (a ~1 GB-class HBM cost if
            XLA materializes it — this probe decides whether it does)

All timings use the shared bench idiom (utils/timing.py::time_op), so
they are comparable with the in-solve SpMV number (VERDICT r4 weak #3).

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


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arcanefem_tpu.sparse.bell import BellMatrix
    from arcanefem_tpu.sparse.pallas_spmv import (
        CompactBellSpmv,
        _products,
        as_pallas_matrix,
    )
    from arcanefem_tpu.sparse.topology import Topology
    from arcanefem_tpu.utils.timing import time_op

    z = np.load(TOPO)
    n, W = int(z["n_nodes"]), int(z["width"])
    topo = Topology(
        n_nodes=n, width=W, ell_cols=z["ell_cols"],
        ell_valid=z["ell_valid"], row_ptr=z["row_ptr"],
        csr_cols=z["csr_cols"], csr_to_ell=z["csr_to_ell"],
        diag_slot=z["diag_slot"], slot_maps={},
    )
    rng = np.random.RandomState(0)
    vals_ell = np.where(
        np.asarray(topo.ell_valid, bool).reshape(-1),
        rng.rand(n * W).astype(np.float32) - 0.5, 0.0,
    )
    x = jnp.asarray(rng.rand(n).astype(np.float32))
    os.environ["AFEM_SPMV"] = "compact"
    t0 = time.time()
    sp = CompactBellSpmv(topo)
    assert sp.available
    print(f"plan built {time.time()-t0:.0f}s", flush=True)
    p = sp.plan2
    R, nb = p.block_rows, p.n_blocks
    G = R * W // 128
    print(f"main: nb={nb} G={G} VL={sum(p.slot_rows)} "
          f"slots={p.slot_rows} "
          f"lane_units={nb*G*sum(p.slot_rows)/1e6:.1f}M", flush=True)
    pg1 = sp._pg1
    if hasattr(pg1, "stage1"):
        for nm, st in (("pre.stage1", pg1.stage1), ("pre.stage2",
                                                    pg1.stage2)):
            Gk, sr, nbk = st.key
            print(f"{nm}: nb={nbk} G={Gk} VL={sum(sr)} "
                  f"lane_units={nbk*Gk*sum(sr)/1e6:.1f}M", flush=True)
    else:
        Gk, sr, nbk = pg1.key
        print(f"pre: nb={nbk} G={Gk} VL={sum(sr)} "
              f"lane_units={nbk*Gk*sum(sr)/1e6:.1f}M", flush=True)

    vals = jnp.asarray(vals_ell.reshape(n, W))
    A = as_pallas_matrix(BellMatrix(
        values=vals.reshape(n, W, 1, 1), topo=topo, block=1,
        cols=jnp.asarray(topo.ell_cols),
    ))
    recs = []

    def rec(name, ms, **kw):
        r = {"stage": name, "ms": round(ms * 1e3, 3), **kw}
        print(json.dumps(r), flush=True)
        recs.append(r)

    # full operator, exactly as the solve runs it
    f_full = jax.jit(lambda m, v: m.spmv(v))
    rec("full_spmv", time_op(f_full, A, x))

    # stage 1 alone: the compact pre-gather
    f_pre = jax.jit(lambda g, v: g(v))
    rec("pre", time_op(f_pre, pg1, x))
    xc = f_pre(pg1, x)
    if hasattr(pg1, "stage1"):
        rec("pre.stage1", time_op(f_pre, pg1.stage1, x))

    # main sweep alone (products only, no row sum): feed the compact table
    need = p.need_rows * 128
    n_c = -(-max(int(xc.shape[0]), need) // 128) * 128
    xcp = jnp.pad(xc, (0, n_c - xc.shape[0])).reshape(n_c // 128, 128)
    vt = jnp.pad(vals, ((0, nb * R - n), (0, 0))).reshape(nb, G, 128)
    key2 = (G, p.slot_rows, nb)
    lc2, lo2 = jnp.asarray(p.lcols), jnp.asarray(p.lo)
    f_main = jax.jit(lambda v, lc, lo, xx: _products(v, lc, lo, xx, key2),
                     static_argnames=())
    rec("main_products", time_op(f_main, vt, lc2, lo2, xcp))
    prods = f_main(vt, lc2, lo2, xcp)

    # row-sum alone from the products layout
    f_rs = jax.jit(lambda pr: pr.reshape(nb * R, W).sum(axis=1)[:n])
    rec("rowsum", time_op(f_rs, prods))

    # row-sum via a W->32 lane-padded MXU contraction candidate:
    # reshape (nb, G*128) -> rows of 25 do not align; instead measure the
    # padded-width variant cost model: pad prods rows to Wp=32 on the HOST
    # layout is not representable post-hoc — measured separately if the
    # relayout shows up in `rowsum`.

    out_path = ".cache/queue_results/probe_compact_stages.jsonl"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
