"""Stage-level timing of the blocked SpMV on the cached 1.9M topology.

Attributes BlockedGather's per-apply cost to its pipeline stages so the
next layout fix targets the right one:

  front   — channel split (Ncb, b) transpose
  stage0  — compact pre-gather, b channels (pre.call_batched)
  stage2  — the blocked main sweep (_products_b_unit)
  einsum  — channel-sum vals multiply + lane-selection row sums
  stage3  — subrow sums (stage3.call_batched)

Usage: python tools/probe_blocked_stages.py [b] [wcap]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
WCAP = int(sys.argv[2]) if len(sys.argv) > 2 else 8
TOPO = ".cache/afem_meshes/topo_sphere_cut_v3_h5_r2_sn.npz"


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arcanefem_tpu.sparse.blocked import BlockedGather
    from arcanefem_tpu.sparse.pallas_spmv import LANE, _products_b_unit

    z = np.load(TOPO)
    n = int(z["n_nodes"])
    rp, cc = z["row_ptr"], z["csr_cols"]
    rng = np.random.RandomState(0)
    data = rng.rand(len(cc)).astype(np.float32) - 0.5
    t0 = time.time()
    g = BlockedGather.build_csr(cc, rp, data, n, b=B, wcap=WCAP)
    print(f"build {time.time()-t0:.0f}s  key2={g.key2}  "
          f"stage0_key={g.pre.key if hasattr(g.pre, 'key') else 'chained'}",
          flush=True)
    G, slot_rows, nb = g.key2
    print(f"main sweep: nb={nb} G={G} VL={sum(slot_rows)} "
          f"slot_rows={slot_rows} lane_units={nb*G*sum(slot_rows)/1e6:.1f}M",
          flush=True)
    s3 = g.stage3
    s3k = getattr(s3, "key", None)
    if s3k is None and hasattr(s3, "stage1"):
        print("stage3 is chained")
        s3k = s3.stage1.key
    print(f"stage3: key={s3k}", flush=True)

    x = jnp.asarray(rng.rand(n).astype(np.float32))

    def timed(label, fn, *args):
        f = jax.jit(fn)
        y = f(*args)
        _ = float(jnp.sum(y))

        def series(reps):
            t0 = time.time()
            for _ in range(reps):
                y = f(*args)
            _ = float(jnp.sum(y))
            return time.time() - t0

        t1 = min(series(4) for _ in range(3))
        t2 = min(series(20) for _ in range(3))
        ms = (t2 - t1) / 16.0 * 1e3
        print(f"{label:8s} {ms:8.3f} ms", flush=True)
        return y

    b, wcap = g.b, g.wcap
    Ncb = -(-g.n_cols // b)

    def front(gg, xx):
        xf = xx.astype(jnp.float32)
        return jnp.pad(xf, (0, Ncb * b - gg.n_cols)).reshape(Ncb, b).T

    xn = timed("front", front, g, x)

    def stage0(gg, xnn):
        return gg.pre.call_batched(xnn)

    xc = timed("stage0", stage0, g, xn)

    need = g.need_rows2 * LANE
    n_c = -(-max(int(xc.shape[1]), need) // LANE) * LANE
    xs = jnp.pad(xc, ((0, 0), (0, n_c - xc.shape[1])))
    xs = xs.reshape(b, n_c // LANE, LANE)

    def stage2(gg, xss):
        return _products_b_unit(gg.lcols2, gg.lo2, xss, gg.key2)

    prods = timed("stage2", stage2, g, xs)

    def einsums(gg, pr):
        part = jnp.einsum("ncgl,nrcgl->nrgl", pr, gg.vals_tiled,
                          preferred_element_type=jnp.float32)
        k = LANE // wcap
        sel = jnp.asarray(np.repeat(np.eye(k, dtype=np.float32), wcap, 0))
        s = jnp.einsum("nrgl,lk->nrgk", part, sel,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        R = G * LANE // wcap
        return s.reshape(nb, b, R).transpose(1, 0, 2).reshape(b, nb * R)

    subs_t = timed("einsum", einsums, g, prods)

    def stage3(gg, st):
        return gg.stage3.call_batched(st)

    timed("stage3", stage3, g, subs_t)

    def full(gg, xx):
        return gg(xx)

    timed("full", full, g, x)


if __name__ == "__main__":
    main()
