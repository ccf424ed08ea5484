"""Probe the AMG hierarchy's per-level shapes and each Pallas op standalone.

Builds the 300k-node sphere_cut Poisson system, sets up SA-AMG, prints
level sizes / ELL widths / transfer widths, then compiles and times each
PlannedGather / Pallas SpMV in isolation to find which kernel shapes are
safe on v5e (the fused V-cycle OOM'd in scoped VMEM at G=544).

Usage: python tools/probe_amg_ops.py [--refine 1] [--no-ops]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_unstructured import load_mesh  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=5.0)
    ap.add_argument("--refine", type=int, default=1)
    ap.add_argument("--no-ops", action="store_true")
    ap.add_argument("--solve", action="store_true",
                    help="time the PCG solve with the prebuilt hierarchy")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache"
    )
    import jax.numpy as jnp

    mesh = load_mesh(args.h, args.refine)
    print(f"[mesh] {mesh.n_nodes} nodes", flush=True)

    from arcanefem_tpu.fem.bcs import dtype_safe_penalty
    from arcanefem_tpu.fem.problem import FemProblem
    from arcanefem_tpu.ops import elements
    from arcanefem_tpu.solver.linear_system import SolverOptions

    t0 = time.time()
    prob = FemProblem(mesh, ndof=1, dtype=np.float32)
    A0 = prob.assemble_matrix(lambda ct, xyz: elements.stiffness(ct, xyz))
    system = prob.new_system(A0, SolverOptions())
    system.rhs = prob.constant_source_rhs(1.0)
    pen = dtype_safe_penalty(1.0e30, np.float32)
    prob.apply_dirichlet(system, prob.group_dofs("Cut"), 0.0, "Penalty", pen)
    prob.apply_dirichlet(system, prob.group_dofs("sphere"), 1.0, "Penalty", pen)
    A, b = system.finalized()
    A.values.block_until_ready()
    print(f"[assemble+bc] {time.time()-t0:.1f}s", flush=True)

    from arcanefem_tpu.solver.amg import build_amg

    t0 = time.time()
    M = build_amg(A)
    print(f"[amg setup] {time.time()-t0:.1f}s", flush=True)

    for l, m in enumerate(M.mats):
        t = m.topo
        kind = type(m).__name__
        print(
            f"  L{l}: n={t.n_nodes} W={t.width} kind={kind}",
            flush=True,
        )
        for name, arr in (("pcols", M.pcols), ("ptcols", M.ptcols)):
            if l < len(arr):
                a = np.asarray(arr[l])
                print(
                    f"      {name}[{l}]: shape={a.shape} "
                    f"planned={'p' if (M.p_apply if name=='pcols' else M.pt_apply)[l] is not None else '-'}",
                    flush=True,
                )

    if args.solve:
        from arcanefem_tpu.sparse.pallas_spmv import as_pallas_matrix
        from arcanefem_tpu.solver.iterative import pcg

        Ap = as_pallas_matrix(A)
        x0 = jnp.zeros_like(b)
        t0 = time.time()
        x, k, r = pcg(Ap, b, M, x0, 1e-8, 0.0, 500, use_precise_dot=True)
        s = float(jnp.sum(x))
        print(f"[pcg] compile+first {time.time()-t0:.1f}s "
              f"iters={int(k)} res={float(r):.1e} sum={s:.3f}", flush=True)
        for rep in range(2):
            t0 = time.time()
            x, k, r = pcg(Ap, b, M, x0, 1e-8, 0.0, 500, use_precise_dot=True)
            _ = float(jnp.sum(x))
            dt = time.time() - t0
            print(f"[pcg] warm {dt:.2f}s ({dt/max(int(k),1)*1e3:.1f} ms/iter,"
                  f" {int(k)} iters)", flush=True)
        return

    if args.no_ops:
        return

    # exercise each planned op standalone
    def force(x):
        return float(jnp.sum(x))

    for name, ops, tbl_sizes in (
        ("p_apply", M.p_apply, [m.topo.n_nodes for m in M.mats[1:]] + [M.coarse_inv.shape[0]]),
        ("pt_apply", M.pt_apply, [m.topo.n_nodes for m in M.mats]),
    ):
        for l, g in enumerate(ops):
            if g is None:
                continue
            tbl = jnp.asarray(
                np.random.RandomState(l).rand(tbl_sizes[l]).astype(np.float32)
            )
            t0 = time.time()
            try:
                y = g(tbl)
                force(y)
            except Exception as e:
                print(f"  {name}[{l}] FAILED: {type(e).__name__}: {e}",
                      flush=True)
                continue
            t1 = time.time()
            for _ in range(10):
                y = g(tbl)
            force(y)
            dt = (time.time() - t1) / 10
            print(
                f"  {name}[{l}] ok compile+first {t1-t0:.1f}s "
                f"steady {dt*1e3:.2f} ms", flush=True,
            )

    for l, m in enumerate(M.mats):
        if type(m).__name__ != "PallasBellMatrix":
            continue
        x = jnp.asarray(
            np.random.RandomState(l).rand(m.topo.n_nodes).astype(np.float32)
        )
        t0 = time.time()
        try:
            y = m.spmv(x)
            force(y)
        except Exception as e:
            print(f"  mat[{l}].spmv FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        t1 = time.time()
        for _ in range(10):
            y = m.spmv(x)
        force(y)
        dt = (time.time() - t1) / 10
        print(f"  mat[{l}].spmv ok compile+first {t1-t0:.1f}s "
              f"steady {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
