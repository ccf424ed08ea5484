"""Bisect the 224^3 TPU fault in the fused solve path.

Usage: python tools/probe_crash.py STAGE [N]
  STAGE: asm   — fused assemble_system_pallas only
         mg    — + build_mg_padded hierarchy (fused per level)
         vcyc  — + one V-cycle apply
         pcg   — + pcg with max 3 iters
Each stage jits exactly that much and forces a scalar fetch.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "asm"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 224

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from arcanefem_tpu.mesh.pallas_stencil import assemble_system_pallas
    from arcanefem_tpu.mesh.structured import StructuredBox
    from arcanefem_tpu.solver.iterative import pcg
    from arcanefem_tpu.solver.multigrid import build_mg_padded
    from arcanefem_tpu.sparse.dia_pallas import pad_host_vec

    box = StructuredBox(n, n, n)
    c3d = jnp.asarray(box.grid_coords(np.float32, jitter=0.1))
    mask_np = np.asarray(box.boundary_mask(("xmin", "xmax")))
    gvals_np = np.zeros(box.n_nodes, np.float32)
    gvals_np[box.boundary_mask(("xmax",))] = 1.0
    penalty = 1.0e12
    mask_p = jnp.asarray(pad_host_vec(box, mask_np.astype(np.float32)))
    pg_p = jnp.asarray(pad_host_vec(box, penalty * gvals_np * mask_np))
    x0_p = jnp.asarray(pad_host_vec(box, gvals_np * mask_np))
    print(f"stage={stage} n={n} nodes={box.n_nodes:,}", flush=True)

    if stage == "asm":

        @jax.jit
        def run(c3d):
            Ap, rhs_p = assemble_system_pallas(box, c3d, mask_p, pg_p, penalty, f=1.0)
            return jnp.sum(Ap.bands_p) + jnp.sum(rhs_p)

    elif stage == "mg":

        @jax.jit
        def run(c3d):
            Ap, rhs_p = assemble_system_pallas(box, c3d, mask_p, pg_p, penalty, f=1.0)
            M = build_mg_padded(box, c3d, mask_np, penalty, nu=1, fine=Ap)
            return sum(jnp.sum(m.bands_p) for m in M.mats) + jnp.sum(rhs_p)

    elif stage == "vcyc":

        @jax.jit
        def run(c3d):
            Ap, rhs_p = assemble_system_pallas(box, c3d, mask_p, pg_p, penalty, f=1.0)
            M = build_mg_padded(box, c3d, mask_np, penalty, nu=1, fine=Ap)
            z = M.apply(rhs_p)
            return jnp.sum(z)

    elif stage == "pcg":

        @jax.jit
        def run(c3d):
            Ap, rhs_p = assemble_system_pallas(box, c3d, mask_p, pg_p, penalty, f=1.0)
            M = build_mg_padded(box, c3d, mask_np, penalty, nu=1, fine=Ap)
            xp, k, res = pcg(Ap, rhs_p, M, x0_p, 1e-8, 0.0, 3,
                             use_precise_dot=True)
            return jnp.sum(xp) + res

    elif stage == "spmv":
        # isolate _spmv_p (the one kernel pcg adds over vcyc): chained
        # padded-layout SpMVs after a fused assembly
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

        @jax.jit
        def run(c3d):
            Ap, rhs_p = assemble_system_pallas(box, c3d, mask_p, pg_p, penalty, f=1.0)
            x = rhs_p / (1.0 + jnp.abs(rhs_p))  # tame 1e12 penalty entries

            def step(_, x):
                y = Ap.spmv(x)
                return y / (1.0 + jnp.abs(y))

            x = jax.lax.fori_loop(0, reps, step, x)
            return jnp.sum(x)

    elif stage == "pcgold":
        # pcg composition but hierarchy from the plain (non-fused) assembly
        # kernel + to_plane_matrix transpose — the committed-bench shape
        from arcanefem_tpu.mesh.structured import apply_penalty_dirichlet
        from arcanefem_tpu.solver.multigrid import MGPrecondP
        from arcanefem_tpu.sparse.dia_pallas import to_plane_matrix

        @jax.jit
        def run(c3d):
            A = box.assemble_stiffness(c3d)
            rhs = box.source_rhs(c3d, 1.0)
            mask = jnp.asarray(mask_np)
            gv = jnp.asarray(gvals_np)
            A, rhs = apply_penalty_dirichlet(A, rhs, mask, gv, penalty)
            Ap = to_plane_matrix(A, box)
            M = build_mg_padded(box, c3d, mask_np, penalty, nu=1, fine=Ap,
                                fused=False)
            xp, k, res = pcg(Ap, Ap.pad_vec(rhs), M,
                             Ap.pad_vec(jnp.where(mask, gv, 0.0)),
                             1e-8, 0.0, 3, use_precise_dot=True)
            return jnp.sum(xp) + res

    elif stage == "mgx":
        # build_mg_padded with fine=None and mats-only sum: isolates the
        # traced [::2] coarse-coordinate slicing + hierarchy structure from
        # the real-pg fine assembly and the rhs slice
        @jax.jit
        def run(c3d):
            M = build_mg_padded(box, c3d, mask_np, penalty, nu=1)
            return sum(jnp.sum(m.bands_p) for m in M.mats)

    elif stage == "mgnr":
        # mg minus the rhs sum (real pg kept): does reading the rhs channel
        # alongside the band channels trigger the fault?
        @jax.jit
        def run(c3d):
            Ap, rhs_p = assemble_system_pallas(box, c3d, mask_p, pg_p, penalty, f=1.0)
            M = build_mg_padded(box, c3d, mask_np, penalty, nu=1, fine=Ap)
            return sum(jnp.sum(m.bands_p) for m in M.mats)

    elif stage == "mgz":
        # mg with pg zeroed (rhs sum kept): does the distinct pg input
        # array (vs the folded zeros constant) trigger the fault?
        @jax.jit
        def run(c3d):
            Ap, rhs_p = assemble_system_pallas(
                box, c3d, mask_p, jnp.zeros_like(pg_p), penalty, f=1.0
            )
            M = build_mg_padded(box, c3d, mask_np, penalty, nu=1, fine=Ap)
            return sum(jnp.sum(m.bands_p) for m in M.mats) + jnp.sum(rhs_p)

    elif stage == "chain":
        # fused assembly at n, n//2, n//4, ... in ONE jit (no MG machinery):
        # isolates multi-kernel composition from the hierarchy logic
        nlev = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        boxes, c3s, planes = [], [], []
        b, c3 = box, c3d
        for _ in range(nlev):
            boxes.append(b)
            c3s.append(c3)
            m = b.boundary_mask(("xmin", "xmax")).astype(np.float32)
            mp = jnp.asarray(pad_host_vec(b, m))
            planes.append((mp, jnp.zeros_like(mp)))
            c3 = c3.reshape(b.nx + 1, b.ny + 1, b.nz + 1, 3)[::2, ::2, ::2]
            b = StructuredBox(b.nx // 2, b.ny // 2, b.nz // 2)

        @jax.jit
        def run(c3d):
            acc = 0.0
            for bb, cc, (mp, pp) in zip(boxes, c3s, planes):
                Ap, rhs_p = assemble_system_pallas(bb, cc, mp, pp, penalty, f=1.0)
                acc = acc + jnp.sum(Ap.bands_p)
            return acc

    else:
        raise SystemExit(f"unknown stage {stage}")

    t0 = time.time()
    v = float(run(c3d))
    print(f"first {time.time()-t0:.1f}s value={v:.6g}", flush=True)
    t0 = time.time()
    v = float(run(c3d))
    print(f"second {time.time()-t0:.3f}s value={v:.6g}", flush=True)


if __name__ == "__main__":
    main()
