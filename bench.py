"""North-star benchmark: Poisson 3D — assembly + CG to 1e-8.

Two measurements, mirroring the reference's benchmark methodology
(modules/testlab/benchmarking/run-benchmark.sh: cache-warmed assembly
timing + per-phase solve timers; BASELINE.md's sphere_cut recipe):

1. PRIMARY — unstructured `sphere_cut` tetra mesh (the reference's own
   north-star geometry, meshes/med/sphere_cut.py rebuilt as a BCC-lattice
   filtered Delaunay + red refinement, mesh/unstructured.py): BELL
   segment-sum assembly + SA-AMG-preconditioned CG (solver/amg.py, the
   BoomerAMG role) with the compact two-stage column-compaction window
   SpMV on the supernode brick+RCM node ordering (both measured champions
   on v5e 2026-08-19: 71 ms/iter vs the plain window sweep's 366 and
   supernode's 666; BENCH_UNSTR_SPMV=window|supernode and
   BENCH_UNSTR_ORDER=rcm select alternatives).  Default ~1.9M DoF
   (BENCH_UNSTR_H / BENCH_UNSTR_REFINE scale it; h=6 refine=3 reaches
   ~8.9M).  Measured at 1.9M on v5e: 4.07s end-to-end — 2.31s segsum
   assembly + 1.71s solve (24 chebyshev iterations).
   AMG setup (host, scipy) is timed separately — the analogue of the
   reference's HypreSetup timer (HypreDoFLinearSystem.cc:730).
2. SECONDARY — structured Kuhn-tet box at 11.4M DoF: stencil DIA
   assembly (static slice-adds at HBM bandwidth) + geometric-MG PCG,
   the fully-fused Pallas plane-kernel path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
value = end-to-end seconds (assembly + solve) of the PRIMARY metric;
smaller is better.  extra carries the secondary metric + phase breakdown.
The reference publishes no absolute numbers, so vs_baseline is the A100
ROOFLINE ESTIMATE of the reference's own pipeline on this exact system
(reference_roofline_estimate; derivation in BASELINE.md), reported as
estimate/measured — >1 means faster than the estimate.  Phase breakdown
goes to stderr.

Timing notes: through the axon tunnel, block_until_ready is unreliable, so
every measurement forces completion with a scalar host fetch and uses a
two-rep-count slope to cancel fetch latency.
"""

from __future__ import annotations

from arcanefem_tpu.utils.cache import CACHE_DIR

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --- wall-clock budget (VERDICT r3 #1) --------------------------------------
# The driver kills the bench at ~30 min (BENCH_r03: rc=124, no JSON).  The
# bench therefore imposes its OWN deadline: a watchdog thread prints the
# best-known result JSON and exits before the driver's axe falls, and the
# expensive setup phases degrade (window->segsum assembly) when the
# remaining budget cannot fit them.  BENCH_BUDGET_S=0 disables.
_T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))

_RESULTS = {"primary": None, "secondary": None, "emitted": False}
_EMIT_LOCK = None  # created lazily (threading import)


def time_left() -> float:
    """Seconds until the self-imposed deadline (inf when disabled)."""
    if BUDGET_S <= 0:
        return float("inf")
    return BUDGET_S - (time.time() - _T0)


def _final_json(primary, secondary) -> dict:
    """Assemble the single output JSON from whatever completed."""
    if primary is None:
        primary = secondary
        secondary = None
    if primary is None:
        return {
            "metric": "none", "value": None, "unit": "s",
            "vs_baseline": None,
            "extra": {"error": "no benchmark completed in budget"},
        }
    extra = {k: v for k, v in primary.items() if k not in ("metric", "value")}
    if secondary is not None:
        extra["secondary_metric"] = secondary["metric"]
        extra["secondary_value"] = secondary["value"]
        extra["secondary_assembly_mdofs"] = secondary.get("assembly_mdofs")
    # vs_baseline: the A100 roofline estimate of the reference's own GPU
    # pipeline on this exact system (BASELINE.md "Reference-path roofline
    # estimate"); >1 means the TPU build beats the estimate
    vs = None
    if "n_dofs" in primary and "nnz_stored" in primary:
        ref_s = reference_roofline_estimate(
            primary["n_dofs"], primary["nnz_stored"]
        )
        extra["baseline_kind"] = "a100-roofline-estimate"
        extra["baseline_estimate_s"] = round(ref_s, 4)
        if primary.get("platform") == "tpu":
            vs = round(ref_s / primary["value"], 3)
        else:
            # a CPU fallback number is not comparable to the A100 roofline;
            # label it loudly instead of emitting a misleading ratio
            extra["platform"] = "cpu-fallback"
    return {
        "metric": primary["metric"],
        "value": primary["value"],
        "unit": "s",
        "vs_baseline": vs,
        "extra": extra,
    }


def _emit_final(tag: str = "") -> bool:
    """Print the final JSON exactly once; returns False if nothing ran."""
    import threading

    global _EMIT_LOCK
    if _EMIT_LOCK is None:
        _EMIT_LOCK = threading.Lock()
    with _EMIT_LOCK:
        if _RESULTS["emitted"]:
            return True
        _RESULTS["emitted"] = True
    if tag:
        log(f"[bench] emitting final JSON ({tag}, "
            f"{time.time()-_T0:.0f}s elapsed)")
    out = _final_json(_RESULTS["primary"], _RESULTS["secondary"])
    print(json.dumps(out), flush=True)
    return out["value"] is not None


def _run_subprocess_metrics() -> bool:
    """Run each metric in its OWN process and merge the JSONs.

    After the 8.9M primary, the axon worker keeps its memory pinned for
    the lifetime of the process — validation v3 measured 0 client-side
    live arrays (gc + jax.clear_caches) yet every subsequent allocation
    died RESOURCE_EXHAUSTED, so the 11.4M structured secondary can never
    run in the same process.  Process isolation releases the worker
    allocation.  Returns True when a final JSON was emitted."""
    import subprocess

    def run_child(extra_env, what, budget):
        env = dict(os.environ)
        env.update(extra_env)
        env["BENCH_SUBPROC"] = "0"
        env["BENCH_BUDGET_S"] = str(max(int(budget), 60))
        log(f"[bench] {what} subprocess (budget {int(budget)}s)")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                stdout=subprocess.PIPE, text=True, timeout=budget + 180,
                cwd=os.path.dirname(os.path.abspath(__file__)), env=env)
        except subprocess.TimeoutExpired:
            log(f"[bench] {what} subprocess timed out")
            return None
        last = None
        for ln in (proc.stdout or "").splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                last = ln
        if last is None:
            log(f"[bench] {what} subprocess emitted no JSON "
                f"(rc={proc.returncode})")
            return None
        try:
            j = json.loads(last)
        except Exception:
            return None
        if j.get("value") is None:
            return None
        res = {"metric": j["metric"], "value": j["value"]}
        res.update({k: v for k, v in j.get("extra", {}).items()
                    if not k.startswith(("baseline_", "secondary_"))})
        return res

    p = run_child({"BENCH_BOX": "0"}, "primary",
                  max(time_left() - 60, 120))
    if p is not None:
        _RESULTS["primary"] = p
    reserve = float(os.environ.get("BENCH_SECONDARY_S", "420"))
    if time_left() > reserve or p is None:
        s = run_child({"BENCH_UNSTR": "0", "BENCH_BOX": "1"}, "secondary",
                      max(min(time_left() - 30, 900), 120))
        # a dead-tunnel child may emit the same fallback metric twice —
        # never record a duplicate as "secondary"
        if s is not None and (p is None or s["metric"] != p["metric"]):
            _RESULTS["secondary"] = s
    if _RESULTS["primary"] is None and _RESULTS["secondary"] is None:
        return False
    return _emit_final("subprocess mode")


def _start_watchdog():
    """Deadline thread: emit whatever completed, then hard-exit.

    os._exit (not sys.exit) — the main thread may be stuck inside a
    C++ compile/transfer that never returns to Python."""
    import threading

    if BUDGET_S <= 0:
        return

    def run():
        while True:
            left = time_left()
            if left <= 0:
                break
            time.sleep(min(left, 5.0))
        ok = _emit_final("watchdog deadline")
        os._exit(0 if ok else 1)

    threading.Thread(target=run, daemon=True).start()


_probed = {"done": False}


def _probe_backend(timeout_s: int = 180) -> None:
    """Force CPU if the default backend can't initialize promptly.

    When the axon TPU tunnel is down, backend init HANGS for tens of
    minutes (observed 2026-08-17).  Probe in a killable subprocess once;
    on failure flip this process to the CPU platform so the bench still
    emits its JSON line (same discipline as __graft_entry__'s bounded
    probe)."""
    if _probed["done"]:
        return
    _probed["done"] = True
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode == 0:
            return
        log("[bench] backend probe failed; forcing CPU")
    except subprocess.TimeoutExpired:
        log(f"[bench] backend probe hung >{timeout_s}s (TPU tunnel down?); "
            "forcing CPU")
    except Exception as e:
        log(f"[bench] backend probe error ({e!r}); forcing CPU")
    import jax

    jax.config.update("jax_platforms", "cpu")


def _setup_jax():
    import jax

    if os.environ.get("BENCH_CPU") == "1":
        # env-var platform selection is ignored once the axon TPU plugin
        # registers; the config update is the reliable opt-out
        jax.config.update("jax_platforms", "cpu")
    else:
        _probe_backend()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def reference_roofline_estimate(n_dofs: int, nnz: int) -> float:
    """Estimated seconds for the reference's A100 pipeline on this system.

    Bandwidth-roofline model of CUDA BSR atomic assembly
    (reference femutils/BSRFormat.h:842-898) + fp64 Hypre BoomerAMG-PCG
    (HypreDoFLinearSystem.cc:686-742) to rtol 1e-8, with every constant at
    the A100-favourable end; derivation + sources in BASELINE.md
    ("Reference-path roofline estimate").  AMG setup excluded on both
    sides (separate HypreSetup phase).
    """
    ref_assembly_s = n_dofs / 400e6          # 400 MDoF/s atomic assembly
    spmv_bytes = 12 * nnz + 16 * n_dofs      # fp64 CSR + x gather + y write
    ref_iter_s = 7 * spmv_bytes / 1.4e12     # 7 SpMV-equivalents @1.4TB/s
    return ref_assembly_s + 14 * ref_iter_s  # 14 PCG iterations


def bench_structured() -> dict:
    jax = _setup_jax()

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

    # XLA:CPU compiles the MG-preconditioner apply pathologically slowly
    # (7m26s observed at n=24, BENCH_r02) — a dead-tunnel fallback run must
    # complete in seconds, so CPU defaults to jacobi
    precond = os.environ.get(
        "BENCH_PRECOND", "mg" if platform == "tpu" else "jacobi"
    )
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
    # a slope below the timer's resolution would fabricate an absurd
    # throughput (BENCH_r02: 15,625,000 MDoF/s from a saturated clamp) —
    # report no throughput rather than a wrong one
    if t2 - t1 < 2e-3:
        asm_mdofs = None
        log(f"assembly slope {t2-t1:.4f}s below timer resolution; "
            "throughput suppressed")
    else:
        asm_mdofs = round(box.n_nodes / asm_s / 1e6, 1)
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

    return {
        "metric": (
            f"poisson3d_box_{box.n_nodes/1e6:.3g}MDoF"
            f"_assembly+cg_to_{rtol:g}_s"
        ),
        "value": round(total, 4),
        "assembly_mdofs": asm_mdofs,
        "iterations": iters,
        "n_dofs": box.n_nodes,
        # 15-offset Kuhn stencil = the stored operator (structured.py:6-9)
        "nnz_stored": 15 * box.n_nodes,
        "platform": platform,
    }


def _pickle_cache(path, build, what, validate=None):
    """Amortize host-side setup across runs (the Hypre analogue keeps
    its GPU Setup at 0.5-1.5s every run; our scipy setup is minutes at
    10M — VERDICT r2 #8).  Pickle round-trips the jit-facing pytrees
    (jax arrays land back on the default device)."""
    import pickle

    if os.path.exists(path) and os.environ.get("BENCH_NO_CACHE") != "1":
        t0 = time.time()
        try:
            with open(path, "rb") as f:
                obj = pickle.load(f)
            if validate is not None and not validate(obj):
                log(f"[unstr] {what} cache INVALID; rebuilding")
            else:
                log(f"[unstr] {what} cache hit ({time.time()-t0:.1f}s)")
                return obj, True
        except Exception as e:
            log(f"[unstr] {what} cache load failed ({e!r}); rebuilding")
    obj = build()
    if validate is not None and not validate(obj):
        # never cache a fallback object under this key (e.g. a segsum
        # assembler built because the window plan failed on this mesh)
        log(f"[unstr] {what} build does not satisfy the cache key; "
            "not caching")
        return obj, False
    try:
        t0 = time.time()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".tmp", "wb") as f:
            pickle.dump(obj, f, protocol=4)
        os.replace(path + ".tmp", path)
        log(f"[unstr] {what} cached ({time.time()-t0:.1f}s, {path})")
    except Exception as e:
        log(f"[unstr] {what} cache write failed ({e!r})")
    return obj, False


def default_cache_paths(platform: str = "tpu") -> dict:
    """Cache files the DEFAULT `python bench.py` TPU run reads.

    Must stay in lockstep with bench_unstructured's key construction —
    tools/verify_caches.py gates every round on these existing, so a
    cache-key bump without a regenerated cache fails loudly BEFORE the
    driver's bench run instead of during it (the BENCH_r03 failure:
    commit 3a78052 bumped the asm-plan key to _v2 hours before the driver
    ran, and the ~11-min host rebuild blew the driver's timeout)."""
    h = float(os.environ.get("BENCH_UNSTR_H", "6"))
    refine = int(os.environ.get("BENCH_UNSTR_REFINE", "3"))
    key = f"sphere_cut_v3_h{h:g}_r{refine}"
    p = {"mesh": os.path.join(CACHE_DIR, f"{key}.npz")}
    spmv_mode = os.environ.get("BENCH_UNSTR_SPMV", "compact")
    use_sn = (spmv_mode == "supernode"
              or os.environ.get("BENCH_UNSTR_ORDER", "sn") != "rcm")
    if use_sn:
        p["snmesh"] = os.path.join(CACHE_DIR, f"{key}_snmesh.npz")
        key += "_sn"
    p["topology"] = os.path.join(CACHE_DIR, f"topo_{key}.npz")
    # banded pre-gathers (AFEM_BAND_PRE=1) change every compact plan —
    # distinct cache namespace so A/B arms never pollute the default path
    band_sfx = "_band" if os.environ.get("AFEM_BAND_PRE") == "1" else ""
    if os.environ.get("AFEM_SPMV_WCAP", "16") != "16":
        band_sfx += f"_w{os.environ['AFEM_SPMV_WCAP']}"
    if os.environ.get("AFEM_PRE_ROWS", "1024") != "1024":
        band_sfx += f"_pr{os.environ['AFEM_PRE_ROWS']}"
    asm_mode = os.environ.get("AFEM_UNSTR_ASM", "window")
    asm_compact = os.environ.get("AFEM_ASM_COMPACT", "1") == "1"
    if h >= 6 and refine >= 3:
        # mirror bench_unstructured's HBM cap: at the 8.9M default the
        # window plan (est ~10.8 GB, actual 20 GB) cannot fit one chip's
        # 16 GB — assembly degrades to segsum, which needs no plan cache
        asm_mode = "segsum"
    if asm_mode != "segsum":
        suffix = ("_c" if asm_compact else "") + band_sfx
        p["asm_plan"] = os.path.join(
            CACHE_DIR, f"asmplan_{key}_{asm_mode}{suffix}_{platform}_v2.pkl")
    smoother = os.environ.get("BENCH_AMG_SMOOTHER", "chebyshev")
    _cd = os.environ.get("BENCH_AMG_CHEB_DEG", "2")
    cheb = tuple(int(x) for x in _cd.split(",")) if "," in _cd else int(_cd)
    theta = float(os.environ.get("BENCH_AMG_THETA", "0.03"))
    penalty = 1.0e12
    # bench_unstructured exports BENCH_UNSTR_SPMV into AFEM_SPMV for these
    # modes; mirror that mapping so the key matches what the run will read
    mode_sfx = {"compact": "_compact"}.get(spmv_mode, "")
    p["amg"] = os.path.join(
        CACHE_DIR,
        f"amg_{key}_{smoother}{str(cheb).replace(' ', '')}"
        f"_t{theta:g}_{platform}_p{penalty:g}"
        f"{mode_sfx}{band_sfx}_v2.pkl",
    )
    return p


def bench_unstructured() -> dict:
    """PRIMARY: sphere_cut tetra mesh, BELL assembly + AMG-PCG to 1e-8."""
    jax = _setup_jax()

    import jax.numpy as jnp

    from arcanefem_tpu.sparse.pallas_spmv import as_pallas_matrix
    from arcanefem_tpu.sparse.topology import build_topology
    from arcanefem_tpu.solver.amg import build_amg
    from arcanefem_tpu.solver.iterative import pcg

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    # the PRIMARY default is the north-star size itself (8.9M DoF,
    # BASELINE.json) since round 5 — caches for it are primed, warm runs
    # fit the driver budget; BENCH_UNSTR_H=5 BENCH_UNSTR_REFINE=2 is the
    # 1.9M kernel-iteration size
    h = float(os.environ.get("BENCH_UNSTR_H", "6" if on_tpu else "14"))
    refine = int(os.environ.get("BENCH_UNSTR_REFINE", "3" if on_tpu else "0"))
    rtol = float(os.environ.get("BENCH_RTOL", "1e-8"))
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    t0 = time.time()
    mesh = _load_sphere_cut(h, refine)
    log(f"[unstr] mesh {mesh.n_nodes:,} nodes / {mesh.n_cells:,} tets "
        f"({time.time()-t0:.1f}s)")

    # compact two-stage column-compaction SpMV is the default — measured
    # champion at 1.9M (2026-08-19): solve 1.71s / 71 ms/iter / SpMV
    # 13.6ms vs the plain window sweep's 8.8s / 366 ms/iter / 58ms and
    # supernode's 666 ms/iter (also 413-fragile).  Its windows cover each
    # block's DISTINCT columns (~N-linear) instead of the RCM-bandwidth
    # span (~N^{5/3}), so the margin grows with size.
    # BENCH_UNSTR_SPMV=window|supernode opt back into the alternatives.
    spmv_mode = os.environ.get("BENCH_UNSTR_SPMV", "compact")
    supernode = spmv_mode == "supernode"
    if spmv_mode == "compact":
        # read by _cached_spmv AND build_amg (level operators + transfers).
        # blockN (sparse/blocked.py) retired round 5: 23.8 ms vs the
        # production chain's 14.0 ms at 1.9M under the shared harness.
        os.environ["AFEM_SPMV"] = spmv_mode
    key = f"sphere_cut_v3_h{h:g}_r{refine}"
    # node ordering is decoupled from the SpMV mode and DEFAULTS to the
    # supernode brick+RCM order: it measured 400 ms/iter vs plain RCM's
    # 510 for the SAME window kernel at 1.9M, and it is the only ordering
    # on which the window-gather ASSEMBLY plans at 3D scale (on plain RCM
    # the slot-sorted source band exceeds every window budget — ROADMAP
    # "scatter tax").  BENCH_UNSTR_ORDER=rcm opts out.
    use_sn = supernode or os.environ.get("BENCH_UNSTR_ORDER", "sn") != "rcm"
    if use_sn:
        # supernode blocking needs its own node order (spatial bricks +
        # brick-graph RCM, sparse/supernode.py) so supernodes are
        # consecutive 8-chunks; re-permute the cached RCM mesh (and cache
        # the reordered mesh alongside)
        from arcanefem_tpu.mesh.core import Mesh
        from arcanefem_tpu.sparse.supernode import supernode_order
        from arcanefem_tpu.utils.ordering import renumber_mesh

        t0 = time.time()
        snpath = os.path.join(CACHE_DIR, key + "_snmesh.npz")
        if os.path.exists(snpath):
            z = np.load(snpath)
            mesh = Mesh(
                coords=z["coords"], node_uids=z["uids"],
                cells={"tetra4": z["tets"]}, dim=3,
                face_groups={
                    "Cut": {"tria3": z["cut"]},
                    "sphere": {"tria3": z["sphere"]},
                },
            )
        else:
            topo_rcm = _load_topology(mesh, key)
            mesh = renumber_mesh(
                mesh, supernode_order(topo_rcm, mesh.coords)
            )
            np.savez(
                snpath, coords=mesh.coords, uids=mesh.node_uids,
                tets=mesh.cells["tetra4"],
                cut=mesh.face_groups["Cut"]["tria3"],
                sphere=mesh.face_groups["sphere"]["tria3"],
            )
        key += "_sn"
        log(f"[unstr] supernode reorder {time.time()-t0:.1f}s")

    t0 = time.time()
    topo = _load_topology(mesh, key)
    log(f"[unstr] topology W={topo.width} nnz={topo.nnz:,} "
        f"({time.time()-t0:.1f}s)")

    from arcanefem_tpu.ops.lane_assembly import TetraLaneAssembler
    from arcanefem_tpu.sparse.bell import BellMatrix

    dtype = jnp.float32 if on_tpu else jnp.float64
    coords = jnp.asarray(mesh.coords.astype(jnp.float32))
    n, W = topo.n_nodes, topo.width

    t0 = time.time()
    # window-gather assembly is the measured default (v5e, 1.9M sphere_cut:
    # 1.69s vs segsum's 2.36s -> total 3.40s vs 4.06s); AFEM_UNSTR_ASM=segsum
    # restores the scatter baseline for A/Bs.
    asm_mode = os.environ.get("AFEM_UNSTR_ASM", "window" if on_tpu else "segsum")
    asm_compact = os.environ.get("AFEM_ASM_COMPACT", "1") == "1"
    nc = mesh.cells["tetra4"].shape[0]
    if asm_mode == "window":
        # window-plan device footprint, estimated from ENTRY counts (the
        # stage-1 lcols hold one i32 per (subrow, wcap-slot) = ~16·nc,
        # stage-2 one per (slot, W2≈4), coords gather one per 4·nc; 1.4x
        # pad/overhead fudge).  Calibrated against the measured ~2-2.6 GB
        # at 1.9M nodes / 11M cells.  Past the cap the plan cannot coexist
        # with the AMG hierarchy in 16 GB HBM — fall back to segsum
        # instead of OOM-ing after the long host plan build.
        est_gb = (20 * nc + 4 * topo.n_slots) * 4 * 1.4 / 1e9
        max_gb = float(os.environ.get("AFEM_ASM_MAX_GB", "6"))
        if est_gb > max_gb:
            log(f"[unstr] window-assembly plan ~{est_gb:.1f} GB > "
                f"{max_gb:g} GB cap; keeping segsum assembly")
            asm_mode = "segsum"
    _band_sfx = "_band" if os.environ.get("AFEM_BAND_PRE") == "1" else ""
    if os.environ.get("AFEM_SPMV_WCAP", "16") != "16":
        _band_sfx += f"_w{os.environ['AFEM_SPMV_WCAP']}"
    if os.environ.get("AFEM_PRE_ROWS", "1024") != "1024":
        _band_sfx += f"_pr{os.environ['AFEM_PRE_ROWS']}"
    if asm_mode != "segsum":
        suffix = ("_c" if asm_compact else "") + _band_sfx
        plan_path = os.path.join(
            CACHE_DIR, f"asmplan_{key}_{asm_mode}{suffix}_{platform}_v2.pkl")
        # an uncached window-reducer plan costs ~11 min of host numpy at
        # 1.9M (native planner pending) — degrade to segsum rather than
        # blow the driver's budget (BENCH_r03 lesson)
        if (not os.path.exists(plan_path)
                and time_left() < float(os.environ.get(
                    "BENCH_PLAN_BUILD_S", "900"))):
            log(f"[unstr] no cached plan at {plan_path} and only "
                f"{time_left():.0f}s budget left; degrading to segsum")
            asm_mode = "segsum"
    if asm_mode != "segsum":
        # reduce= is passed EXPLICITLY: the constructor's env default may
        # disagree with the cap/budget decisions above (ADVICE r3 #1)
        asm, _ = _pickle_cache(
            plan_path,
            lambda: TetraLaneAssembler(topo, mesh.cells["tetra4"],
                                       reduce=asm_mode),
            f"assembler plan ({asm_mode}{suffix})",
            validate=lambda a: (a.reducer_kind == asm_mode
                                and getattr(a, "compact", False) == asm_compact
                                # corner-major coords plans (2026-08-20):
                                # cell-major pickles feed the old sliced
                                # consumption wrongly — rebuild them
                                and getattr(a, "coords_order", "cell")
                                == "corner"),
        )
    else:
        asm = TetraLaneAssembler(topo, mesh.cells["tetra4"],
                                 reduce="segsum")
    log(f"[unstr] assembler plan {time.time()-t0:.1f}s "
        f"(reducer={asm.reducer_kind})")

    t0 = time.time()
    vals = asm(coords)
    _ = float(jnp.sum(vals))
    log(f"[unstr] assembly compile+first {time.time()-t0:.1f}s")

    def run_assembly(reps):
        t0 = time.time()
        for _ in range(reps):
            v = asm(coords)
        _ = float(jnp.sum(v))
        return time.time() - t0

    r1, r2 = (1, 3) if on_tpu else (1, 2)
    t1 = min(run_assembly(r1) for _ in range(2))
    t2 = min(run_assembly(r2) for _ in range(2))
    asm_s = max((t2 - t1) / (r2 - r1), 1e-9)
    # same saturated-slope guard as the structured path: a sub-resolution
    # slope would fabricate an absurd MDoF/s (BENCH_r02 lesson)
    if t2 - t1 < 2e-3:
        asm_mdofs = None
        log(f"[unstr] assembly slope {t2-t1:.4f}s below timer resolution; "
            "throughput suppressed")
    else:
        asm_mdofs = n / asm_s / 1e6
        log(f"[unstr] assembly {asm_s*1e3:.1f} ms -> {asm_mdofs:.1f} MDoF/s")

    # the assembler's device weight (segsum slot map 3.3 GB + coords
    # plan ~1 GB at 8.9M) is dead once values exist — free it before the
    # solve so it cannot OOM against the AMG hierarchy
    import gc

    asm_kind_final = asm.reducer_kind
    asm_compact_final = getattr(asm, "compact", False)
    del asm
    gc.collect()

    # BCs: Cut=0, sphere=1 via penalty; rhs f=1
    penalty = 1.0e12 if on_tpu else 1.0e30
    cut = np.unique(mesh.face_groups["Cut"]["tria3"])
    sph = np.unique(mesh.face_groups["sphere"]["tria3"])
    mask = np.zeros(n, bool)
    mask[cut] = True
    mask[sph] = True
    gv = np.zeros(n, np.float64)
    gv[sph] = 1.0

    # rhs on the host (numpy): the element-centric (nc,4,3) coordinate
    # tensor would tile-pad to ~19GB on device at this size
    pc = mesh.coords[mesh.cells["tetra4"]]
    vv = pc[:, 1:] - pc[:, :1]
    vols = np.abs(
        np.einsum("ij,ij->i", np.cross(vv[:, 0], vv[:, 1]), vv[:, 2])
    ) / 6.0
    rhs_np = np.zeros(n, np.float64)
    np.add.at(rhs_np, np.asarray(mesh.cells["tetra4"]).reshape(-1),
              np.repeat(vols / 4.0, 4))
    rhs_np = np.where(mask, penalty * gv, rhs_np)

    b = jnp.asarray(rhs_np.astype(dtype))
    x0 = jnp.asarray(np.where(mask, gv, 0.0).astype(dtype))

    t0 = time.time()
    # chebyshev level smoother: 40->25 iters at 268k for the same fine
    # SpMV budget and 15 fewer iterations' worth of dots/transfers;
    # BENCH_AMG_SMOOTHER=jacobi reverts
    amg_smoother = os.environ.get("BENCH_AMG_SMOOTHER", "chebyshev")
    # int or comma list ("2,4" = per-level degrees, last repeats: stronger
    # smoothing on the cheap coarse levels restores 10M iteration scaling)
    _cd = os.environ.get("BENCH_AMG_CHEB_DEG", "2")
    amg_cheb = tuple(int(x) for x in _cd.split(",")) if "," in _cd \
        else int(_cd)
    # strength threshold 0.03 (vs build_amg's generic 0.08): on the v3
    # sphere_cut geometry the looser filter wins BOTH axes — 26->21 iters
    # AND operator complexity 1.456->1.221 at 2.1M (tools/conv_tune.py,
    # platform-independent iteration counts; /tmp/conv_tune.jsonl)
    amg_theta = float(os.environ.get("BENCH_AMG_THETA", "0.03"))
    # V (default) or W: second coarse visit per level — targets the
    # measured iteration growth at 8.9M DoF (21 iters at 1.9M -> 55)
    amg_cycle = os.environ.get("BENCH_AMG_CYCLE", "V")
    amg_mode = os.environ.get("AFEM_SPMV", "")
    amg_compact = amg_mode == "compact"
    amg_mode_sfx = {"compact": "_compact"}.get(amg_mode, "")
    amg_path = os.path.join(
        CACHE_DIR,
        f"amg_{key}_{amg_smoother}{str(amg_cheb).replace(' ', '')}"
        f"_t{amg_theta:g}_{platform}_p{penalty:g}"
        f"{amg_mode_sfx}{_band_sfx}_v2.pkl",
    )
    # host copy of the assembled values: needed only to BUILD the AMG
    # hierarchy (scipy setup) and for the host-side penalty write.  When
    # the hierarchy cache is warm, skip the device->host fetch entirely
    # and apply the penalty as a device scatter — through the axon tunnel
    # that fetch alone costs minutes for the 1.9M operator (measured via
    # tools/profile_amg_setup.py; same class as the build_amg values_np
    # fix).  If the pickle load unexpectedly falls through to a rebuild,
    # values_np=None keeps build_amg correct (it re-fetches on its own).
    flat = None
    if os.path.exists(amg_path):
        didx = jnp.asarray(np.asarray(topo.diag_slot)[mask])
        fvals = vals.reshape(-1).at[didx].set(
            jnp.asarray(penalty, vals.dtype))
        A = BellMatrix(
            values=fvals.reshape(n, W, 1, 1).astype(dtype),
            topo=topo, block=1, cols=jnp.asarray(topo.ell_cols),
        )
    else:
        t_pull = time.time()
        vals_np = np.asarray(vals)
        log(f"[unstr] values device->host fetch {time.time()-t_pull:.1f}s")
        flat = vals_np.reshape(-1).copy()
        flat[np.asarray(topo.diag_slot)[mask]] = penalty
        A = BellMatrix(
            values=jnp.asarray(flat.reshape(n, W, 1, 1).astype(dtype)),
            topo=topo, block=1, cols=jnp.asarray(topo.ell_cols),
        )
    M, amg_cached = _pickle_cache(
        amg_path,
        lambda: build_amg(A, smoother=amg_smoother, cheb_deg=amg_cheb,
                          theta=amg_theta, values_np=flat),
        "AMG hierarchy",
    )
    if amg_cycle != "V":
        from dataclasses import replace as _cyc_replace
        M = _cyc_replace(M, cycle=amg_cycle)
        log(f"[unstr] AMG cycle: {amg_cycle}")
    # Chebyshev degree is an APPLY-time parameter (the hierarchy/rhos do
    # not depend on it): BENCH_AMG_CHEB_APPLY patches the loaded M so a
    # degree A/B reuses the cached hierarchy instead of a ~25-min 8.9M
    # rebuild (the cache key keeps the BUILD degree)
    _cda = os.environ.get("BENCH_AMG_CHEB_APPLY")
    if _cda:
        from dataclasses import replace as _deg_replace
        _deg = (tuple(int(x) for x in _cda.split(","))
                if "," in _cda else int(_cda))
        M = _deg_replace(M, cheb_deg=_deg)
        log(f"[unstr] AMG cheb_deg (apply-patched): {_deg}")
    setup_s = time.time() - t0
    log(f"[unstr] AMG setup (host{', cached' if amg_cached else ''}) "
        f"{setup_s:.1f}s, levels={[m.topo.n_nodes for m in M.mats]}")

    Ap = M.mats[0] if (M.mats and hasattr(M.mats[0], "gather")) \
        else as_pallas_matrix(A)
    Ap_fallback, M_fallback = Ap, M  # pre-supernode pair for solve retry
    if supernode:
        # supernode-blocked fine operator (sparse/supernode.py): trades
        # ~10.6x block fill for ~9x less gather sweep work; wraps BOTH
        # the CG operator and the AMG fine level
        from dataclasses import replace as _dc_replace

        from arcanefem_tpu.sparse.supernode import (
            SupernodeMatrix,
            SupernodeSpmv,
        )

        t0 = time.time()
        sn = None
        # block fill ≈ 10.6x: the (nnzb, 8, 8) f32 operator is ~11x nnz
        # in bytes; past ~5 GB it cannot coexist with the AMG hierarchy
        # in the 16 GB HBM (the 10M mesh) — skip instead of OOM-ing
        est_gb = topo.nnz * 10.6 * 4 / 1e9
        max_gb = float(os.environ.get("BENCH_SN_MAX_GB", "5"))
        if est_gb > max_gb:
            log(f"[unstr] supernode blocks ~{est_gb:.1f} GB > "
                f"{max_gb:g} GB cap; keeping window SpMV")
            supernode = False
        try:
            if supernode:
                sn, _sn_cached = _pickle_cache(
                    os.path.join(
                        CACHE_DIR,
                        f"snplan_{key}_{platform}_p{penalty:g}_v1.pkl",
                    ),
                    lambda: SupernodeSpmv.build(A),
                    "supernode plan",
                )
            else:
                sn = None
            if sn is not None:
                # on-device parity self-check before trusting the new
                # operator as the default.  Probe with a UNIT-SCALE random
                # vector, not b: b carries 1e12 penalty entries, and a
                # global-max normalization against A·b (~1e24 at boundary
                # rows) would pass interior-row corruption of any size.
                xp = jnp.asarray(
                    np.random.RandomState(0).rand(n).astype(np.float32)
                )
                # sn as a pytree ARGUMENT (a jit(sn.__call__) closure would
                # embed the plan arrays as HLO literals -> HTTP 413)
                got = np.asarray(jax.jit(lambda m, v: m(v))(sn, xp))
                want = np.asarray(A.spmv(xp))
                diff = np.abs(got - want)
                # interior rows: relative to the interior row scale
                im = ~mask
                iscale = float(np.median(np.abs(want[im]))) + 1e-30
                err_i = float(diff[im].max()) / iscale
                # penalty rows (~1e12·x): per-element relative
                err_p = float(
                    (diff[mask] / (np.abs(want[mask]) + 1e-30)).max()
                ) if mask.any() else 0.0
                err = max(err_i, err_p)
                if not np.isfinite(err) or err > 1e-2:
                    log(f"[unstr] supernode SELF-CHECK FAILED "
                        f"(err interior {err_i:.2e} / penalty {err_p:.2e})"
                        "; falling back to window SpMV")
                    sn = None
        except Exception as e:
            log(f"[unstr] supernode path failed ({e!r}); "
                "falling back to window SpMV")
            sn = None
        if sn is not None:
            snm = SupernodeMatrix(sn, A.diagonal())
            Ap = snm
            if M.mats:
                # V-cycle fine level: optionally bf16 block storage —
                # preconditioner-only precision, halves its block stream
                vsn = (sn.as_bf16()
                       if os.environ.get("BENCH_SN_BF16") == "1" else sn)
                M = _dc_replace(
                    M,
                    mats=(SupernodeMatrix(vsn, A.diagonal()),)
                    + tuple(M.mats[1:]),
                )
            if os.environ.get("BENCH_SN_BLOCK") == "1":
                # supernode block-Jacobi fine smoother: 39->34 iters
                # (jacobi) / 25->22 (cheb) at 268k for ~free block apply
                from arcanefem_tpu.solver.amg import with_supernode_smoother

                M = with_supernode_smoother(M, A, sn)
            log(f"[unstr] supernode plan+check {time.time()-t0:.1f}s "
                f"({sn.blocks.shape[0]:,} blocks, "
                f"{sn.blocks.nbytes/1e9:.2f} GB)")
        else:
            log("[unstr] supernode unavailable; keeping window SpMV")
    vcycle_bf16 = os.environ.get("BENCH_UNSTR_BF16") == "1"
    if vcycle_bf16 and M.mats:
        # bf16 window-kernel weights for V-cycle levels + transfers —
        # preconditioner-rate-only precision; the Krylov A·p keeps the f32
        # fine operator (solver/amg.py::with_bf16_vcycle).  The fallback
        # hierarchy stays f32 so a failed bf16 program retries clean.
        from arcanefem_tpu.solver.amg import with_bf16_vcycle

        M = with_bf16_vcycle(M)
        log("[unstr] V-cycle level weights: bf16")
    t0 = time.time()
    try:
        x, iters, res = pcg(Ap, b, M, x0, rtol, 0.0, 1000,
                            use_precise_dot=True)
        s = float(jnp.sum(x))
    except Exception as e:
        if Ap is Ap_fallback and M is M_fallback:
            raise
        # the supernode PCG program failed (e.g. remote-compile limits on
        # kernel-heavy bodies) — retry once on the window path
        log(f"[unstr] supernode solve failed ({e!r}); retrying on the "
            "window path")
        Ap, M = Ap_fallback, M_fallback
        t0 = time.time()
        x, iters, res = pcg(Ap, b, M, x0, rtol, 0.0, 1000,
                            use_precise_dot=True)
        s = float(jnp.sum(x))
    log(f"[unstr] solve compile+first {time.time()-t0:.1f}s")

    def run_solve(reps):
        t0 = time.time()
        for _ in range(reps):
            xx, k, r = pcg(Ap, b, M, x0, rtol, 0.0, 1000,
                           use_precise_dot=True)
        _ = float(jnp.sum(xx))
        return time.time() - t0, k, r

    t1, iters, res = min(run_solve(1) for _ in range(2))
    t2, iters, res = min(run_solve(2) for _ in range(2))
    solve_s = max(t2 - t1, 1e-9)
    iters = int(iters)
    log(f"[unstr] solve {solve_s:.3f}s ({iters} iters to {float(res):.1e}, "
        f"{solve_s/max(iters,1)*1e3:.1f} ms/iter)")
    assert float(res) <= rtol * 1.5, "AMG-PCG did not converge"
    assert np.isfinite(s), "non-finite solution"

    out = {
        "metric": (
            f"poisson3d_sphere_cut_{n/1e6:.1f}MDoF_assembly+amgpcg_to_{rtol:g}_s"
        ),
        "value": round(asm_s + solve_s, 4),
        "assembly_s": round(asm_s, 4),
        "solve_s": round(solve_s, 4),
        "ms_per_iter": round(solve_s / max(iters, 1) * 1e3, 2),
        "assembly_mdofs": None if asm_mdofs is None else round(asm_mdofs, 1),
        "amg_setup_s": round(setup_s, 1),
        "amg_setup_cached": amg_cached,
        "iterations": iters,
        "n_dofs": int(n),
        "nnz_stored": int(topo.nnz),
        # which fine-operator path actually ran (supernode may fall back)
        "spmv_path": type(Ap).__name__,
        # which window kernel backs it (window vs compact vs diag)
        "spmv_kernel": getattr(Ap, "_plan_kind", None) or type(
            getattr(Ap, "gather", None)
        ).__name__,
        "amg_compact": amg_compact,
        "asm_mode": asm_kind_final,
        "asm_compact": asm_compact_final,
        "amg_smoother": M.smoother if hasattr(M, "smoother") else "n/a",
        "amg_cycle": amg_cycle,
        "vcycle_bf16": vcycle_bf16,
        "platform": platform,
    }
    # register with the watchdog BEFORE the diagnostic probe: a probe
    # failure/hang must never cost the measured primary (round-3 lesson)
    _RESULTS["primary"] = dict(out)

    # SpMV fast path vs the XLA gather fallback (the round-1 VERDICT
    # done-criterion: fallback beaten by >=5x on a >=1M-node 3D mesh)
    spmv_ratio = None
    if on_tpu and time_left() > 120:
        try:
            import jax as _jax

            # the operator must ride as a pytree ARGUMENT: a closure
            # capture embeds the multi-MB plan arrays as HLO literals and
            # overflows the remote-compile body (HTTP 413 at 1.9M nodes)
            f_op = _jax.jit(lambda m, v: m.spmv(v))

            # the shared harness idiom — probes time the same way
            # (arcanefem_tpu/utils/timing.py, VERDICT r4 weak #3)
            from arcanefem_tpu.utils.timing import time_op

            tp = time_op(f_op, Ap, b, reps=5, outer=2)
            tx = time_op(f_op, A, b, reps=2, outer=2)
            spmv_ratio = tx / tp
            log(f"[unstr] SpMV pallas {tp*1e3:.2f} ms vs XLA gather "
                f"{tx*1e3:.2f} ms -> {spmv_ratio:.1f}x")
        except Exception as e:
            # a diagnostic must never cost the measured primary metric
            # (round-3 bench_default lost its solved 9.6s number to a 413
            # raised HERE, after the solve had succeeded)
            log(f"[unstr] SpMV ratio probe failed ({e!r}); continuing")

    if spmv_ratio is not None:
        out["spmv_vs_xla_gather"] = round(spmv_ratio, 1)
        _RESULTS["primary"] = dict(out)
    return out


def _load_topology(mesh, key: str):
    """build_topology with a /tmp npz cache — at 10M nodes the (native)
    builder still costs ~15 min on a 1-CPU host; the cache loads in <1 min.
    Setup artifacts, not measured work (the reference's sparsity build is
    timed separately too, BSRFormat::computeSparsity)."""
    from arcanefem_tpu.sparse.topology import Topology, build_topology

    cache_dir = CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"topo_{key}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return Topology(
            n_nodes=int(z["n_nodes"]), width=int(z["width"]),
            ell_cols=z["ell_cols"], ell_valid=z["ell_valid"],
            row_ptr=z["row_ptr"], csr_cols=z["csr_cols"],
            csr_to_ell=z["csr_to_ell"], diag_slot=z["diag_slot"],
            slot_maps={"tetra4": z["slot_tetra4"]},
        )
    topo = build_topology(mesh.n_nodes, mesh.cells)
    np.savez(
        path, n_nodes=topo.n_nodes, width=topo.width,
        ell_cols=topo.ell_cols, ell_valid=topo.ell_valid,
        row_ptr=topo.row_ptr, csr_cols=topo.csr_cols,
        csr_to_ell=topo.csr_to_ell, diag_slot=topo.diag_slot,
        slot_tetra4=topo.slot_maps["tetra4"],
    )
    return topo


def _load_sphere_cut(h: float, refine: int):
    """Build (or load from /tmp cache) the RCM-ordered sphere_cut mesh."""
    from arcanefem_tpu.mesh.core import Mesh
    from arcanefem_tpu.mesh.unstructured import (
        refine_tetra, sphere_cut_tetra_mesh,
    )
    from arcanefem_tpu.sparse.topology import build_topology
    from arcanefem_tpu.utils.ordering import rcm_order, renumber_mesh

    cache_dir = CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"sphere_cut_v3_h{h:g}_r{refine}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return Mesh(
            coords=z["coords"], node_uids=z["uids"],
            cells={"tetra4": z["tets"]}, dim=3,
            face_groups={
                "Cut": {"tria3": z["cut"]},
                "sphere": {"tria3": z["sphere"]},
            },
        )
    mesh = sphere_cut_tetra_mesh(h=h)
    for _ in range(refine):
        mesh = refine_tetra(mesh)
    topo = build_topology(mesh.n_nodes, mesh.cells)
    perm = rcm_order(mesh.n_nodes, topo.row_ptr, topo.csr_cols)
    mesh = renumber_mesh(mesh, perm)
    np.savez(
        path, coords=mesh.coords, uids=mesh.node_uids,
        tets=mesh.cells["tetra4"],
        cut=mesh.face_groups["Cut"]["tria3"],
        sphere=mesh.face_groups["sphere"]["tria3"],
    )
    return mesh


def _sweep_child_devices(n_devices: int, box_n: int, reps: int) -> None:
    """Child process: sharded Poisson solve on n virtual CPU devices.

    The device-count axis of the reference's sweep (run-benchmark.sh:13-45,
    MPI_N=(1 2 4 8)); correctness = partition invariance vs the model
    solve, wall time per solve step is reported for the sweep table
    (virtual CPU devices — structure, not absolute-perf, parity).
    """
    import jax

    # must be set via config, not env: the axon TPU plugin registers
    # itself regardless of JAX_PLATFORMS (see __graft_entry__.py bootstrap)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from arcanefem_tpu.fem.bcs import BoundaryConditions, DirichletBC
    from arcanefem_tpu.mesh.generate import box_tetra_mesh
    from arcanefem_tpu.models.poisson import PoissonConfig
    from arcanefem_tpu.models.poisson import solve as poisson_solve
    from arcanefem_tpu.parallel.partition import build_sharded
    from arcanefem_tpu.parallel.sharded import (
        device_mesh, make_poisson_step, put_sharded, stacked_node_mask,
    )

    assert jax.device_count() >= n_devices, (
        f"need {n_devices} devices, have {jax.device_count()}"
    )
    mesh = box_tetra_mesh(box_n, box_n, box_n)
    sp = build_sharded(mesh, n_devices)
    dmesh = device_mesh(n_devices)
    arrs = put_sharded(sp, dmesh, dtype=jnp.float64)
    xmin, xmax = mesh.group_nodes("xmin"), mesh.group_nodes("xmax")
    nodes = np.concatenate([xmin, xmax])
    vals = np.concatenate([np.zeros(len(xmin)), np.ones(len(xmax))])
    mask, val = stacked_node_mask(sp, nodes, vals)
    step = make_poisson_step(sp, dmesh, rtol=1e-10, max_iter=2000)

    x, iters, res = step(arrs, 1.0, mask, val, 1.0e12)
    got = sp.scatter_global(np.asarray(x))
    ref = np.asarray(
        poisson_solve(
            mesh,
            PoissonConfig(
                f=1.0,
                bcs=BoundaryConditions(dirichlet=[
                    DirichletBC(surface="xmin", value=0.0),
                    DirichletBC(surface="xmax", value=1.0),
                ]),
            ),
            dtype=np.float64,
        ).u
    )
    err = float(np.max(np.abs(got - ref) / (np.abs(ref).max() or 1.0)))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x, iters, res = step(arrs, 1.0, mask, val, 1.0e12)
        _ = float(jnp.sum(x))
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "devices": n_devices, "nodes": mesh.n_nodes,
        "solve_s": round(min(times), 4), "iterations": int(iters),
        "residual": float(res), "partition_rel_err": err,
        # two independent PCG runs to rtol=1e-10 agree to ~the dryrun's
        # f64 comparison tolerance, not to the rtol itself
        "invariant": err < 1e-6,
    }))


def bench_sweep(argv: list[str]) -> None:
    """`bench.py --sweep`: sizes x strategies x device counts.

    Mirrors modules/testlab/benchmarking/run-benchmark.sh:13-45 (sizes
    small/medium/large, CACHE_WARMING=5, MPI_N=(1 2 4 8)) and its
    results.tsv/time_stats.json outputs.  Emits one JSON line per row to
    stdout and a TSV table (--tsv, default bench_sweep.tsv).  On TPU the
    headline bench configs run as the final rows, so the single-line
    `python bench.py` number is reproduced from the sweep.
    """
    import argparse

    p = argparse.ArgumentParser(prog="bench.py --sweep")
    p.add_argument("--sizes", default=None,
                   help="comma list of box n (default platform-dependent)")
    p.add_argument("--formats", default=None,
                   help="comma list of assembly strategies (default: all)")
    p.add_argument("--devices", default="1,2,4,8",
                   help="virtual device counts for the sharded axis")
    p.add_argument("--cache-warming", type=int, default=5)
    p.add_argument("--tsv", default="bench_sweep.tsv")
    p.add_argument("--no-headline", action="store_true",
                   help="skip the headline unstructured/structured rows")
    p.add_argument("--no-devices", action="store_true",
                   help="skip the device-count axis")
    args = p.parse_args(argv)

    jax = _setup_jax()
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    from arcanefem_tpu import testlab
    from arcanefem_tpu.mesh.generate import box_tetra_mesh

    sizes = [int(s) for s in (
        args.sizes.split(",") if args.sizes
        else (["32", "64", "96"] if on_tpu else ["8", "12", "16"])
    )]
    formats = args.formats.split(",") if args.formats else None
    rows = []

    # Axis 1: assembly strategies x sizes (cache-warmed, testlab.run_lab)
    for n in sizes:
        mesh = box_tetra_mesh(n, n, n)
        stats = testlab.run_lab(
            mesh, formats=formats, cache_warming=args.cache_warming,
            dtype=np.float32 if on_tpu else np.float64,
        )
        for fmt, fs in stats["formats"].items():
            row = {
                "axis": "assembly", "size": f"box{n}",
                "nodes": stats["nbNode"], "elements": stats["nbElement"],
                "format": fmt, "devices": 1,
                "lhs_matrix_assembly_s": round(fs["lhs-matrix-assembly"], 5),
                "mdof_per_s": round(fs["mdof_per_s"], 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    # Axis 2: device counts (subprocess with virtual CPU devices — the
    # mpirun -n {1,2,4,8} partition-invariance sweep)
    if not args.no_devices:
        import subprocess

        for nd in [int(d) for d in args.devices.split(",")]:
            env = dict(os.environ)
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={nd}"
            )
            env["JAX_PLATFORMS"] = "cpu"
            env.pop("JAX_PLATFORM_NAME", None)
            box_n = 10
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--sweep-child-devices", str(nd), str(box_n),
                 str(max(2, args.cache_warming))],
                env=env, capture_output=True, text=True, timeout=1800,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if proc.returncode != 0:
                log(f"[sweep] devices={nd} FAILED:\n"
                    + "\n".join(proc.stderr.splitlines()[-10:]))
                row = {"axis": "devices", "devices": nd, "error": True}
            else:
                child = json.loads(proc.stdout.strip().splitlines()[-1])
                row = {
                    "axis": "devices", "size": f"box{box_n}",
                    "nodes": child["nodes"], "format": "sharded-rcb-pcg",
                    "devices": nd,
                    "solve_s": child["solve_s"],
                    "iterations": child["iterations"],
                    "invariant": child["invariant"],
                }
                assert child["invariant"], (
                    f"partition invariance FAILED at n={nd}: "
                    f"rel err {child['partition_rel_err']:.2e}"
                )
            rows.append(row)
            print(json.dumps(row), flush=True)

    # Axis 3: the headline configs (TPU only — reproduces `python bench.py`)
    if on_tpu and not args.no_headline:
        u = bench_unstructured()
        row = {"axis": "headline", **u}
        rows.append(row)
        print(json.dumps(row), flush=True)
        s = bench_structured()
        row = {"axis": "headline", **s}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.tsv:
        keys = []
        for r in rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        with open(args.tsv, "w") as f:
            f.write("\t".join(keys) + "\n")
            for r in rows:
                f.write("\t".join(str(r.get(k, "")) for k in keys) + "\n")
        log(f"[sweep] {len(rows)} rows -> {args.tsv}")


def bench_stability(reps: int = 3) -> None:
    """`bench.py --stability [reps]`: gate the fused bench composition.

    Runs the pcg crash-probe (tools/probe_crash.py — the harness that
    root-caused the vmem_limit_bytes TPU-worker fault, ROADMAP.md) `reps`
    times in fresh subprocesses and reports pass/fail per run.  TPU only;
    run each round before trusting the fused-path bench number.
    """
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    results = []
    for i in range(reps):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "tools", "probe_crash.py"),
             "pcg", os.environ.get("BENCH_N", "224")],
            capture_output=True, text=True, timeout=1800, cwd=here,
        )
        ok = proc.returncode == 0
        results.append(ok)
        log(f"[stability] run {i+1}/{reps}: {'ok' if ok else 'FAIL'} "
            f"({time.time()-t0:.0f}s)"
            + ("" if ok else "\n" + "\n".join(proc.stderr.splitlines()[-5:])))
    print(json.dumps({
        "metric": "fused_pcg_stability",
        "value": sum(results) / len(results),
        "unit": "pass_rate", "runs": reps,
        "vs_baseline": None,
    }))
    if not all(results):
        sys.exit(1)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--stability":
        bench_stability(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--sweep-child-devices":
        _sweep_child_devices(
            int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--sweep":
        bench_sweep(sys.argv[2:])
        return

    skip_unstr = os.environ.get("BENCH_UNSTR", "1") not in ("1", "force")
    skip_box = os.environ.get("BENCH_BOX", "1") != "1"

    if not skip_unstr and os.environ.get("BENCH_UNSTR") != "force":
        # XLA:CPU compiles the AMG-PCG apply pathologically slowly (>15
        # min observed) — without a TPU the structured metric is the only
        # one that completes promptly.  BENCH_UNSTR=force overrides.
        jax = _setup_jax()
        if jax.devices()[0].platform != "tpu":
            log("[bench] no TPU backend; skipping the unstructured "
                "primary (BENCH_UNSTR=force to override)")
            skip_unstr = True
            if os.environ.get("BENCH_BOX", "1") == "1":
                skip_box = False  # never override an explicit BENCH_BOX=0

    _start_watchdog()
    if (not skip_unstr and not skip_box
            and os.environ.get("BENCH_SUBPROC", "1") == "1"):
        # both metrics requested: isolate each in its own process (the
        # axon worker never releases the 8.9M primary's memory — see
        # _run_subprocess_metrics); inline fallback below on any failure
        if _run_subprocess_metrics():
            return
        log("[bench] subprocess mode produced nothing; running inline")
    unstr = None
    if not skip_unstr:
        try:
            unstr = bench_unstructured()
            _RESULTS["primary"] = unstr
        except Exception as e:
            # never lose the whole bench to the newer primary path — fall
            # back to the proven structured metric and say why
            log(f"[bench] unstructured primary FAILED ({e!r}); "
                "falling back to the structured metric")
            import traceback

            traceback.print_exc(file=sys.stderr)
            skip_box = False
    if not skip_box:
        # free the unstructured primary's device residents (hierarchy +
        # vectors, ~10 GB at the 8.9M default) before the 11.4M box
        # allocates — without this the secondary dies RESOURCE_EXHAUSTED
        # (observed in the round-5 default validation run).  gc alone was
        # NOT enough (validation v2): compiled-executable caches pin
        # trace-time constants and donated-buffer aliases — drop them too.
        import gc

        gc.collect()
        try:
            import jax as _jx

            la = _jx.live_arrays()
            log(f"[bench] {len(la)} live device arrays, "
                f"{sum(a.nbytes for a in la)/1e9:.2f} GB before secondary")
            _jx.clear_caches()
            gc.collect()
            la = _jx.live_arrays()
            log(f"[bench] after clear_caches: {len(la)} arrays, "
                f"{sum(a.nbytes for a in la)/1e9:.2f} GB")
        except Exception as e:  # diagnostics must never cost the metric
            log(f"[bench] live-array probe failed ({e!r})")
        # the structured secondary needs ~2 min warm but can cost ~10 min
        # on a cold compile cache through the remote-compile tunnel; never
        # let it push a completed primary past the deadline
        if unstr is not None and time_left() < float(
                os.environ.get("BENCH_SECONDARY_S", "420")):
            log(f"[bench] {time_left():.0f}s left < secondary reserve; "
                "skipping the structured secondary")
        else:
            try:
                _RESULTS["secondary"] = bench_structured()
            except Exception as e:
                log(f"[bench] structured metric FAILED ({e!r})")
                import traceback

                traceback.print_exc(file=sys.stderr)

    if not _emit_final():
        log("[bench] nothing ran (both metrics skipped/unavailable)")
        sys.exit(1)


if __name__ == "__main__":
    main()
