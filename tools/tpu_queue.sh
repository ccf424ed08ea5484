#!/bin/bash
# TPU-blocked measurement queue (ROADMAP.md "Next" 1a-1c).  Run when the
# axon tunnel is back: probes the backend first, then works through the
# queue, logging everything under $OUT.  Each step is bounded so one hang
# cannot eat the session.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpu_queue_results}
mkdir -p "$OUT"

echo "== probe =="
if ! timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" \
    > "$OUT/probe.log" 2>&1; then
  echo "TPU backend not reachable (see $OUT/probe.log); aborting"
  exit 1
fi
cat "$OUT/probe.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== $name =="
  if timeout "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"; then
    tail -1 "$OUT/$name.json"
  else
    echo "FAILED rc=$? (see $OUT/$name.err)"; tail -3 "$OUT/$name.err"
  fi
}

# 1. headline bench (unstructured 2.1M primary + structured 11.4M secondary)
run bench_default 3600 python bench.py

# 2. Chebyshev AMG smoother A/B on the unstructured primary (40->25 iters
#    at 268k on CPU; flip the default in bench.py if this wins end-to-end)
run bench_cheb 3600 BENCH_BOX=0 BENCH_AMG_SMOOTHER=chebyshev python bench.py
run bench_cheb3 3600 BENCH_BOX=0 BENCH_AMG_SMOOTHER=chebyshev BENCH_AMG_CHEB_DEG=3 python bench.py

# 2b. window-gather assembly A/B (segment_sum scatter measured 0.07
#     Gelem/s on v5e -> ~2.8 s at the 2.1M primary; the split window
#     gather should cut this by >10x.  Flip AFEM_UNSTR_ASM default in
#     lane_assembly.py if it wins; parity test:
#     tests/test_pallas_spmv.py::test_lane_assembler_window_matches_segsum_on_tpu)
run bench_asm_window 3600 BENCH_BOX=0 AFEM_UNSTR_ASM=window python bench.py
run test_asm_parity 1800 python -m pytest tests/test_pallas_spmv.py -q -k on_tpu

# 2c. supernode-blocked SpMV A/B (sparse/supernode.py: ~9x less sweep
#     work for 10.6x block fill).  supernode+chebyshev is now the bench
#     DEFAULT (self-checked on device); these isolate each axis.
run bench_window 3600 BENCH_BOX=0 BENCH_UNSTR_SPMV=window python bench.py
run bench_jacobi 3600 BENCH_BOX=0 BENCH_AMG_SMOOTHER=jacobi python bench.py
run bench_sn_bf16 3600 BENCH_BOX=0 BENCH_SN_BF16=1 python bench.py
run bench_sn_block 3600 BENCH_BOX=0 BENCH_SN_BLOCK=1 python bench.py
run test_supernode 1800 python -m pytest tests/test_supernode.py -q

# 2c2. AMG strength-threshold A/B (tools/conv_tune.py CPU result at 2.1M:
#      theta .03 = 21 iters / opc 1.221 vs default-.08 26 / 1.456; .05+cheb3
#      = 18 iters at opc 1.36.  theta .03 is now the bench default; these
#      check the per-iteration TPU cost side)
run bench_theta08 3600 BENCH_BOX=0 BENCH_AMG_THETA=0.08 python bench.py
run bench_theta05c3 3600 BENCH_BOX=0 BENCH_AMG_THETA=0.05 BENCH_AMG_CHEB_DEG=3 python bench.py

# 2d. bf16 V-cycle window weights (with_bf16_vcycle: level operators +
#     transfers at half weight-stream width; Krylov A·p stays f32.
#     Structured precedent: 0.134->0.122 s.  Guarded by
#     tests/test_amg.py::test_bf16_vcycle_iteration_parity)
run bench_vcycle_bf16 3600 BENCH_BOX=0 BENCH_UNSTR_BF16=1 python bench.py
run bench_vcycle_bf16_win 3600 BENCH_BOX=0 BENCH_UNSTR_BF16=1 BENCH_UNSTR_SPMV=window python bench.py

# 3. stability gate for the fused structured composition
run stability 3600 python bench.py --stability 3

# 4. the 10M-DoF unstructured north-star (topology cache under /tmp makes
#    the second run fast; first run pays ~15 min of host sparsity build
#    unless /tmp/afem_meshes is still warm)
run bench_10m 7200 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 python bench.py

# 4b. 10M iteration-growth levers (conv_tune CPU data: default 64 iters,
#     theta03 55; W-cycle and per-level cheb degrees target the
#     coarse-grid-correction decay — per-iteration cost is the TPU side)
run bench_10m_w 7200 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 BENCH_AMG_CYCLE=W python bench.py
run bench_10m_cheb24 7200 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 BENCH_AMG_CHEB_DEG=2,4 python bench.py

echo "== done: results in $OUT =="
