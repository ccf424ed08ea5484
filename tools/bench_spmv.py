"""Time general-mesh SpMV backends on TPU: XLA gather vs window vs diag.

Usage: python tools/bench_spmv.py [N]  (box_tetra_mesh(N,N,N), RCM-ordered)
Reports ms per SpMV (slope-timed over rep counts to cancel host RTT) and
validates all backends bit-match each other within f32 tolerance.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arcanefem_tpu.mesh.generate import box_tetra_mesh
    from arcanefem_tpu.sparse.pallas_spmv import PallasBellSpmv
    from arcanefem_tpu.sparse.pallas_spmv_diag import DiagBellSpmv
    from arcanefem_tpu.sparse.topology import build_topology
    from arcanefem_tpu.utils.ordering import rcm_order, renumber_mesh

    mesh = box_tetra_mesh(n, n, n)
    t = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    mesh = renumber_mesh(mesh, rcm_order(mesh.n_nodes, t.row_ptr, t.csr_cols))
    topo = build_topology(mesh.n_nodes, mesh.cells, pad_width_to=8)
    N, W = topo.n_nodes, topo.width
    print(f"nodes={N:,} width={W}", flush=True)

    rng = np.random.RandomState(0)
    vals = jnp.asarray(rng.rand(N, W).astype(np.float32)) * jnp.asarray(
        topo.ell_valid
    )
    x = jnp.asarray(rng.rand(N).astype(np.float32))
    cols = jnp.asarray(topo.ell_cols)

    def timed(name, fn):
        f = jax.jit(lambda v, xx: fn(v, xx))
        y = f(vals, x)
        _ = float(jnp.sum(y))  # force

        def series(reps):
            # chain to defeat cross-step fusion: feed y's first element back
            t0 = time.time()
            out = x
            for _ in range(reps):
                out = f(vals, out)
            _ = float(jnp.sum(out))
            return time.time() - t0

        t1 = min(series(5) for _ in range(3))
        t2 = min(series(25) for _ in range(3))
        ms = (t2 - t1) / 20 * 1e3
        gbs = (vals.nbytes + cols.nbytes + 8 * N) / (ms * 1e-3) / 1e9
        print(f"{name:8s} {ms:8.3f} ms/spmv  ~{gbs:6.1f} GB/s", flush=True)
        return np.asarray(y)

    y_ref = timed("xla", lambda v, xx: jnp.sum(v * xx[cols], axis=1))

    win = PallasBellSpmv(topo)
    print(f"window available={win.available}")
    if win.available:
        y = timed("window", win)
        np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)

    dia = DiagBellSpmv(topo)
    print(f"diag available={dia.available}" +
          (f" S={dia.plan.n_probes} mean={float(dia.plan.scnt.mean()):.1f}"
           f" win={dia.plan.window}" if dia.available else ""))
    if dia.available:
        y = timed("diag", dia)
        np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


if __name__ == "__main__":
    main()
