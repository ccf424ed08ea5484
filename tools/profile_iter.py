"""Per-component timing of the flagship MG-PCG iteration (ROADMAP item 1).

Times each piece of one preconditioned-CG iteration at the bench size
(224^3, 11.4M DoF, f32): stencil SpMV, Jacobi sweep, residual, full
V-cycle apply, compensated dot, vector update. The gap between the
component sum and bench.py's measured ms/iter is layout/pad overhead —
the target of the padded-end-to-end rework.

Measurement pattern (matches bench.py, which is proven through the axon
tunnel): the whole probe — setup + a `lax.fori_loop` repeating ONE
component k times — lives in a single jit returning one scalar, so no
multi-GB pytree is materialized as a program output. k is a *dynamic*
loop bound, so each component costs one compile and the slope
(t(k2)-t(k1))/(k2-k1) cancels both the setup and the host-fetch latency.

Run from the repo root: `python tools/profile_iter.py` (BENCH_N to resize).

Measured at 224^3 on v5e (2026-08-16): SpMV 2.4 ms, residual 2.9 ms,
Jacobi sweep 3.1 ms — vs bench.py's 32 ms per full CG iteration, so
~18 ms/iter sits in transfers/pad-unpad/dots (ROADMAP item 1). Known
limits: the V-cycle probe is opt-in (PROFILE_VCYCLE=1; see caution at the
ops list), and the dot+axpy probes read implausibly low — XLA fuses the
reduction across fori_loop steps, so they need a sequential-dependency
harness instead.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from jax import lax

    from arcanefem_tpu.mesh.structured import (
        StructuredBox,
        apply_penalty_dirichlet,
    )
    from arcanefem_tpu.solver.iterative import precise_dot
    from arcanefem_tpu.solver.multigrid import build_mg

    platform = jax.devices()[0].platform
    n = int(os.environ.get("BENCH_N", "224" if platform == "tpu" else "16"))
    box = StructuredBox(n, n, n)
    print(f"platform={platform} grid={n}^3 nodes={box.n_nodes:,}", flush=True)

    c3d = jnp.asarray(box.grid_coords(np.float32, jitter=0.1))
    mask = jnp.asarray(box.boundary_mask(("xmin", "xmax")))
    gvals = jnp.asarray(box.boundary_mask(("xmax",)).astype(np.float32))
    penalty = 1.0e12

    def setup(c3d):
        A = box.assemble_stiffness(c3d)
        rhs = box.source_rhs(c3d, 1.0)
        A, rhs = apply_penalty_dirichlet(A, rhs, mask, gvals, penalty)
        M = build_mg(box, c3d, np.asarray(mask), penalty,
                     use_stencil_spmv=platform == "tpu")
        if platform == "tpu":
            from arcanefem_tpu.sparse.dia_pallas import to_stencil_matrix

            A = to_stencil_matrix(A, box)
        return A, rhs, M

    def make_probe(op):
        """op(A, M, rhs, v) -> new v; probe(c3d, k) loops it k times."""

        @jax.jit
        def probe(c3d, k):
            A, rhs, M = setup(c3d)
            v0 = jnp.where(mask, gvals, 0.0) + 1e-3
            v = lax.fori_loop(0, k, lambda i, v: op(A, M, rhs, v), v0)
            return jnp.sum(v)

        return probe

    def slope_ms(probe, k1=2, k2=10):
        _ = float(probe(c3d, 1))  # compile + first (force completion)

        def run(k):
            t0 = time.time()
            _ = float(probe(c3d, k))
            return time.time() - t0

        t1 = min(run(k1) for _ in range(3))
        t2 = min(run(k2) for _ in range(3))
        return max(t2 - t1, 0.0) / (k2 - k1) * 1e3

    if os.environ.get("PROFILE_PADDED") and platform == "tpu":
        _profile_padded(box, c3d, mask, gvals, penalty)
        return

    has_stencil = platform == "tpu"
    ops = [
        ("spmv A@x", lambda A, M, b, v:
            A.spmv(v) if hasattr(A, "spmv") else A @ v),
        ("precise_dot+axpy", lambda A, M, b, v:
            v + precise_dot(v, b) * 1e-9 * b),
        ("plaindot+axpy", lambda A, M, b, v:
            v + jnp.dot(v, b) * 1e-9 * b),
    ]
    if has_stencil:
        ops.insert(1, ("residual b-Ax", lambda A, M, b, v: A.residual(b, v)))
        ops.insert(2, ("jacobi sweep", lambda A, M, b, v:
                       A.jacobi_sweep(v, b, 0.8)))
    if os.environ.get("PROFILE_VCYCLE"):
        # CAUTION: at 224^3 this standalone program has faulted the TPU
        # worker twice (the same V-cycle runs fine inside bench.py's solve
        # jit — a buffer-assignment difference). Opt-in only; estimate the
        # V-cycle instead as bench ms/iter − (spmv + 2 dots + 3 axpys).
        ops.append(("V-cycle apply", lambda A, M, b, v: M.apply(v)))

    for name, op in ops:
        t0 = time.time()
        ms = slope_ms(make_probe(op))
        print(f"{name:20s} {ms:8.2f} ms   (compile+measure "
              f"{time.time()-t0:.0f}s)", flush=True)
    print("one CG iteration = spmv + V-cycle + 2 dots + 3 axpys; "
          "compare against bench.py ms/iter", flush=True)


def _profile_padded(box, c3d, mask, gvals, penalty):
    """Padded-layout components (PROFILE_PADDED=1): the bench.py TPU path."""
    import time

    import jax
    import jax.numpy as jnp
    from jax import lax

    from arcanefem_tpu.mesh.structured import apply_penalty_dirichlet
    from arcanefem_tpu.solver.iterative import precise_dot
    from arcanefem_tpu.solver.multigrid import build_mg_padded
    from arcanefem_tpu.sparse.dia_pallas import to_plane_matrix

    nu = int(os.environ.get("BENCH_NU", "1"))

    def setup(c3d):
        A = box.assemble_stiffness(c3d)
        rhs = box.source_rhs(c3d, 1.0)
        A, rhs = apply_penalty_dirichlet(A, rhs, mask, gvals, penalty)
        Ap = to_plane_matrix(A, box)
        M = build_mg_padded(box, c3d, np.asarray(mask), penalty, nu=nu,
                            fused=False)
        return Ap, Ap.pad_vec(rhs), M

    def make_probe(op):
        @jax.jit
        def probe(c3d, k):
            A, bp, M = setup(c3d)
            v0 = A.pad_vec(jnp.where(mask, gvals, 0.0) + 1e-3)
            v = lax.fori_loop(0, k, lambda i, v: op(A, M, bp, v), v0)
            return jnp.sum(v)

        return probe

    def slope_ms(probe, k1=2, k2=10):
        _ = float(probe(c3d, 1))

        def run(k):
            t0 = time.time()
            _ = float(probe(c3d, k))
            return time.time() - t0

        t1 = min(run(k1) for _ in range(3))
        t2 = min(run(k2) for _ in range(3))
        return max(t2 - t1, 0.0) / (k2 - k1) * 1e3

    def restrict_hop(A, M, b, v):
        rc = M._restrict(0, v) * M.maskmul_p[1]
        return v + 1e-9 * M._prolong(0, rc)

    def coarse_chain(A, M, b, v):
        # everything below the fine level: restrict, recurse, prolong
        rc = M._restrict(0, v) * M.maskmul_p[1]
        xc = M._vcycle(1, rc) * M.maskmul_p[1]
        return v + 1e-9 * M._prolong(0, xc)

    def cg_body(A, M, b, v):
        # one full PCG body on padded vectors (no while_loop): everything
        # the bench iteration does — spmv, 2 precise dots, 3 axpys, and
        # the V-cycle apply — as straight-line code
        Ap = A.spmv(v)
        alpha = precise_dot(v, Ap) * 1e-9 + 1.0
        x = v + alpha * Ap
        r = b - alpha * Ap
        z = M.apply(r)
        beta = precise_dot(r, z) * 1e-9 + 1.0
        return z + beta * x

    ops = [
        ("cg body (no loop)", cg_body),
        ("vcycle apply", lambda A, M, b, v: M.apply(v)),
        ("spmv_p", lambda A, M, b, v: A.spmv(v)),
        ("residual_p masked", lambda A, M, b, v:
            A.residual(b, v, M.maskmul_p[0])),
        ("jacobi_p sweep", lambda A, M, b, v:
            A.jacobi_sweep(v, b, M.inv_diags_p[0], 0.8)),
        ("smooth0 elementwise", lambda A, M, b, v:
            0.8 * M.inv_diags_p[0] * (b + 1e-9 * v)),
        ("restrict+prolong hop", restrict_hop),
        ("coarse chain (l>=1)", coarse_chain),
        ("precise_dot+axpy", lambda A, M, b, v:
            v + precise_dot(v, b) * 1e-9 * b),
        ("plaindot+axpy", lambda A, M, b, v:
            v + jnp.dot(v.ravel(), b.ravel()) * 1e-9 * b),
    ]
    if os.environ.get("PROFILE_VCYCLE"):
        ops.append(("V-cycle apply", lambda A, M, b, v: M.apply(v)))

    for name, op in ops:
        t0 = time.time()
        ms = slope_ms(make_probe(op))
        print(f"{name:22s} {ms:8.2f} ms   (compile+measure "
              f"{time.time()-t0:.0f}s)", flush=True)
    print(f"nu={nu}: iter = spmv + V(nu,nu) + 2 dots + 3 axpys; "
          "V = smooth0 + nu-1+nu sweeps + residual + hops + coarse chain",
          flush=True)


if __name__ == "__main__":
    main()
