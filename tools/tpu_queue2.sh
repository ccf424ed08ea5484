#!/bin/bash
# Round-3 stage-2 TPU measurement queue — re-prioritized after the first
# hardware results (2026-08-19):
#   * supernode path: 13.3s (20 iters, 666 ms/iter) AND 2/3 runs die on
#     remote-compile HTTP 413 -> demoted; window path 9.6s (24 iters,
#     400 ms/iter) is the fallback champion so far.
#   * structured secondary: 0.097-0.129 s (beats the A100 roofline).
# This stage measures the two biggest coded-but-unmeasured levers first:
# window-gather assembly (segment_sum is 2.3 s = 0.8 MDoF/s) and the
# two-stage compact-column SpMV (~6x fewer lane-ops on the plan model).
# Set WAIT_PID to an in-flight bench PID to serialize on the chip.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpu_queue_results}
mkdir -p "$OUT"

if [ -n "${WAIT_PID:-}" ]; then
  echo "waiting for pid $WAIT_PID to finish..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "== probe =="
if ! timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" \
    > "$OUT/probe2.log" 2>&1; then
  echo "TPU backend not reachable (see $OUT/probe2.log); aborting"
  exit 1
fi
cat "$OUT/probe2.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== $name =="
  if timeout "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"; then
    tail -1 "$OUT/$name.json"
  else
    echo "FAILED rc=$? (see $OUT/$name.err)"; tail -3 "$OUT/$name.err"
  fi
}

# 0. kernel parity on hardware (now includes the compact-SpMV test)
run tpu_tests 2400 python -m pytest tests/test_pallas_spmv.py -q -k on_tpu

# 1. clean window-path metric (the 9.6s run lost its JSON to the 413
#    probe crash before the fix)
run bench_window 3600 BENCH_BOX=0 BENCH_UNSTR_SPMV=window python bench.py

# 1b. window-gather assembly retry: the first attempt OOM'd on the
#     (51M, 8) tile-padded row-sum relayout (26 GB); _row_sums now
#     reduces via an MXU lane-selection contraction when W | 128
run bench_asm_window2 3600 BENCH_BOX=0 BENCH_UNSTR_SPMV=window AFEM_UNSTR_ASM=window python bench.py

# 2. compact-column SpMV (plan model: ~6x fewer lane-ops than window)
run bench_compact 3600 BENCH_BOX=0 BENCH_UNSTR_SPMV=compact python bench.py

# 3. compact SpMV + window-gather assembly (the all-in configuration)
run bench_compact_asmwin 3600 BENCH_BOX=0 BENCH_UNSTR_SPMV=compact AFEM_UNSTR_ASM=window python bench.py

# 4. smoother A/B on the winning SpMV path (CPU conv data: jacobi V(1,1)
#    needs fewer total fine SpMVs, cheb fewer iterations)
run bench_jacobi_win 3600 BENCH_BOX=0 BENCH_UNSTR_SPMV=window BENCH_AMG_SMOOTHER=jacobi python bench.py

# 5. bf16 V-cycle weights on the window path
run bench_bf16_win 3600 BENCH_BOX=0 BENCH_UNSTR_SPMV=window BENCH_UNSTR_BF16=1 python bench.py

# 6. theta .05 + cheb3 (CPU: 18 iters at opc 1.36 vs 21 at 1.22)
run bench_t05c3_win 3600 BENCH_BOX=0 BENCH_UNSTR_SPMV=window BENCH_AMG_THETA=0.05 BENCH_AMG_CHEB_DEG=3 python bench.py

echo "== stage-2 done: results in $OUT =="
