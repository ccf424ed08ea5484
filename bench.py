"""North-star benchmark: Poisson 3D at 10M DoF — assembly + CG to 1e-8.

Mirrors the reference's benchmark methodology (modules/testlab/benchmarking/
run-benchmark.sh: cache-warmed assembly timing + solve phase) on the TPU
fast path: structured Kuhn-tet box (jittered geometry, so element matrices
are non-trivial), stencil DIA assembly (static slice-adds at HBM bandwidth)
and Jacobi-PCG with compensated-f32 dot products to 1e-8 relative residual.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = end-to-end seconds (assembly + solve) at the target size; smaller is
better. The reference publishes no absolute numbers (BASELINE.md), so
vs_baseline is null. Phase breakdown goes to stderr.

Timing notes: through the axon tunnel, block_until_ready is unreliable, so
every measurement forces completion with a scalar host fetch and uses a
two-rep-count slope to cancel fetch latency.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from arcanefem_tpu.mesh.structured import (
        StructuredBox,
        apply_penalty_dirichlet,
    )
    from arcanefem_tpu.solver.iterative import Precond, pcg, pcg_chunked
    from arcanefem_tpu.solver.multigrid import build_mg

    platform = jax.devices()[0].platform
    if os.environ.get("BENCH_N"):
        n = int(os.environ["BENCH_N"])
    else:
        # 225^3 = 11.39M DoF; 224 = 2^5*7 gives a clean multigrid chain
        n = 224 if platform == "tpu" else 24
    dtype = jnp.float32
    rtol = float(os.environ.get("BENCH_RTOL", "1e-8"))

    box = StructuredBox(n, n, n)
    log(f"platform={platform} grid={n}^3 nodes={box.n_nodes:,} cells={box.n_cells:,}")

    t0 = time.time()
    c3d = jnp.asarray(box.grid_coords(np.float32, jitter=0.1))
    mask = jnp.asarray(box.boundary_mask(("xmin", "xmax")))
    gvals_np = np.zeros(box.n_nodes, np.float32)
    gvals_np[box.boundary_mask(("xmax",))] = 1.0
    gvals = jnp.asarray(gvals_np)
    log(f"host setup {time.time()-t0:.1f}s")

    penalty = 1.0e12  # f32-safe (dtype_safe_penalty rationale, fem/bcs.py)

    @jax.jit
    def assemble(c3d):
        return box.assemble_stiffness(c3d)

    precond = os.environ.get("BENCH_PRECOND", "mg")
    nu = int(os.environ.get("BENCH_NU", "1"))

    # Fully-fused assemble+RHS+BC kernel path (default).  The TPU-worker
    # fault this composition used to trigger was the oversized
    # vmem_limit_bytes=100MB on the plane kernels — at 48MB the fused
    # bench is stable (5/5) and 2x faster than the non-fused hierarchy
    # (0.134 s vs 0.268 s at 11.4M DoF).  BENCH_FUSED=0 keeps the
    # non-fused fallback (ROADMAP.md "TPU worker fault investigation").
    fused = os.environ.get("BENCH_FUSED", "1") == "1"

    if precond == "mg" and platform == "tpu":
        # geometric-multigrid-preconditioned CG: the BoomerAMG+PCG role
        # (HypreDoFLinearSystem.cc:686-742); hierarchy setup (coarse
        # rediscretizations) is traced into this step, so the timed
        # solve includes the preconditioner setup like Hypre's does.
        # Padded plane layout end-to-end: vectors keep zero y/z pads, so
        # dots are exact and no pad/unpad pass runs inside the loop.
        from arcanefem_tpu.mesh.pallas_stencil import assemble_system_pallas
        from arcanefem_tpu.sparse.dia_pallas import pad_host_vec, to_plane_matrix
        from arcanefem_tpu.solver.multigrid import build_mg_padded

        mask_np = np.asarray(mask)
        mask_p = jnp.asarray(pad_host_vec(box, mask_np.astype(np.float32)))
        pg_p = jnp.asarray(pad_host_vec(box, penalty * gvals_np * mask_np))
        x0_p = jnp.asarray(pad_host_vec(box, gvals_np * mask_np))

        @jax.jit
        def solve(c3d):
            if fused:
                Ap, rhs_p = assemble_system_pallas(
                    box, c3d, mask_p, pg_p, penalty, f=1.0
                )
            else:
                A = box.assemble_stiffness(c3d)
                rhs = box.source_rhs(c3d, 1.0)
                A, rhs = apply_penalty_dirichlet(A, rhs, mask, gvals, penalty)
                Ap = to_plane_matrix(A, box)
                rhs_p = Ap.pad_vec(rhs)
            M = build_mg_padded(
                box, c3d, mask_np, penalty, nu=nu, fine=Ap, fused=fused,
                cheb=os.environ.get("BENCH_SMOOTHER", "jacobi") == "cheb",
                band_dtype=(
                    jnp.bfloat16
                    if os.environ.get("BENCH_MG_BF16", "1") == "1"
                    else None
                ),
            )
            chunk = int(os.environ.get("BENCH_CHUNK", "1"))
            if chunk > 1:
                xp, k, res = pcg_chunked(
                    Ap, rhs_p, M, x0_p, rtol, 0.0, 5000,
                    use_precise_dot=True, chunk=chunk,
                )
            else:
                xp, k, res = pcg(
                    Ap, rhs_p, M, x0_p, rtol, 0.0, 5000, use_precise_dot=True
                )
            return Ap.unpad_vec(xp), k, res

    else:

        @jax.jit
        def solve(c3d):
            A = box.assemble_stiffness(c3d)
            rhs = box.source_rhs(c3d, 1.0)
            A, rhs = apply_penalty_dirichlet(A, rhs, mask, gvals, penalty)
            x0 = jnp.where(mask, gvals, 0.0)
            if precond == "mg":
                M = build_mg(box, c3d, np.asarray(mask), penalty, nu=nu)
            else:
                d = A.diagonal()
                inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
                M = Precond(data=(inv,), kind="jacobi")
            if platform == "tpu":
                from arcanefem_tpu.sparse.dia_pallas import to_stencil_matrix

                A = to_stencil_matrix(A, box)
            return pcg(A, rhs, M, x0, rtol, 0.0, 5000, use_precise_dot=True)

    # --- assembly throughput (cache-warmed, slope-timed) ---------------------
    t0 = time.time()
    A = assemble(c3d)
    _ = float(jnp.sum(A.bands[0]))
    log(f"assembly compile+first {time.time()-t0:.1f}s")

    def run_assembly(reps):
        t0 = time.time()
        for _ in range(reps):
            A = assemble(c3d)
        _ = float(jnp.sum(A.bands[0]))
        return time.time() - t0

    r1, r2 = (2, 6) if platform == "tpu" else (1, 3)
    t1 = min(run_assembly(r1) for _ in range(2))
    t2 = min(run_assembly(r2) for _ in range(2))
    asm_s = max((t2 - t1) / (r2 - r1), 1e-9)
    asm_mdofs = box.n_nodes / asm_s / 1e6
    log(f"assembly {asm_s*1e3:.1f} ms -> {asm_mdofs:.0f} MDoF/s")

    # --- solve to rtol (slope-timed like assembly: the host->device fetch
    # through the axon tunnel costs ~45 ms, which a single-shot measurement
    # would book against the solve) --------------------------------------------
    t0 = time.time()
    x, iters, res = solve(c3d)
    s = float(jnp.sum(x))
    log(f"solve compile+first {time.time()-t0:.1f}s")

    def run_solve(reps):
        t0 = time.time()
        for _ in range(reps):
            x, iters, res = solve(c3d)
        _ = float(jnp.sum(x))
        return time.time() - t0, iters, res

    t1, iters, res = min(run_solve(1) for _ in range(2))
    t2, iters, res = min(run_solve(2) for _ in range(2))
    total = max(t2 - t1, 1e-9)  # one full assemble+rhs+bc+mg-setup+pcg pass
    iters = int(iters)
    log(
        f"solve end-to-end {total:.3f} s ({iters} iters, rel res "
        f"{float(res):.2e}, {(total-asm_s)/max(iters,1)*1e3:.2f} ms/iter "
        f"after assembly, checksum {s:.4f}; single-shot incl. host RTT "
        f"{t1:.3f} s)"
    )
    assert float(res) <= rtol * 1.5, "CG did not converge to target"
    assert np.isfinite(s), "non-finite solution"

    value = total
    print(
        json.dumps(
            {
                "metric": f"poisson3d_{box.n_nodes//1_000_000}MDoF_assembly+cg_to_{rtol:g}_s",
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
