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
    ap.add_argument("--vcycle", action="store_true",
                    help="time V-cycle / SpMV components in isolation")
    ap.add_argument("--chain", action="store_true",
                    help="per-op timing with dispatch amortized")
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

    if args.vcycle:
        import jax as _jax

        from arcanefem_tpu.sparse.pallas_spmv import as_pallas_matrix

        Ap = as_pallas_matrix(A)
        r0 = b / (1.0 + jnp.abs(b))

        # operators ride as pytree ARGUMENTS: jit(closure) would embed the
        # plan arrays as HLO literals and overflow remote-compile (413)
        f_apply = _jax.jit(lambda m, v: m.apply(v))
        f_spmv = _jax.jit(lambda m, v: m.spmv(v))
        fine = M.mats[0]
        targets = [
            ("vcycle", f_apply, M, r0),
            ("fine_planned_spmv", f_spmv, fine, r0),
            ("pcg_op_spmv", f_spmv, Ap, r0),
        ]
        for name, f, m, arg in targets:
            y = f(m, arg)
            _ = float(jnp.sum(y))
            t0 = time.time()
            for _i in range(20):
                y = f(m, arg)
            _ = float(jnp.sum(y))
            print(f"[{name}] {(time.time()-t0)/20*1e3:.2f} ms", flush=True)
        return

    if args.chain:
        import jax as _jax
        from functools import partial as _part

        # dependent chain: y_{i+1} = op(r + eps*sum(y_i)) to defeat CSE
        def chain_dep(op, n_in, k=8):
            @_jax.jit
            def f(r):
                y = op(r)
                for _ in range(k - 1):
                    rr = r.at[:1].add(jnp.sum(y) * 1e-30)
                    y = op(rr)
                return y
            return f

        rng = np.random.RandomState(0)

        def bench_op(name, op, n_in, k=8):
            r = jnp.asarray(rng.rand(n_in).astype(np.float32))
            f = chain_dep(op, n_in, k)
            y = f(r)
            _ = float(jnp.sum(y))
            t0 = time.time()
            for _ in range(5):
                y = f(r)
            _ = float(jnp.sum(y))
            dt = (time.time() - t0) / 5 / k
            print(f"[chain {name}] {dt*1e3:.2f} ms/op", flush=True)

        fine = M.mats[0]
        bench_op("fine.spmv", fine.spmv, fine.topo.n_nodes)
        for l in range(len(M.ptcols)):
            n_in = M.mats[l].topo.n_nodes
            bench_op(f"pt[{l}]", lambda r, l=l: M._transfer_down(l, r), n_in)
            nc = (M.mats[l + 1].topo.n_nodes if l + 1 < len(M.mats)
                  else M.coarse_inv.shape[0])
            bench_op(f"p[{l}]", lambda r, l=l: M._transfer_up(l, r), nc)
        for l in range(1, len(M.mats)):
            bench_op(f"mats[{l}].spmv", M.mats[l].spmv,
                     M.mats[l].topo.n_nodes)
        bench_op("coarse_inv", lambda r: M.coarse_inv @ r,
                 M.coarse_inv.shape[0])
        bench_op("smooth0_fine", lambda r: M._smooth0(0, r, M.nu),
                 fine.topo.n_nodes)
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
