#!/bin/bash
# Round-3 stage-3 TPU measurement queue.  Supersedes tpu_queue2.sh after
# the ordering discovery (2026-08-19): the supernode brick+RCM node order
# is better for the window SpMV (400 vs 510 ms/iter at 1.9M) AND is the
# only ordering on which the window-gather assembly plans at 3D scale —
# it is now the bench default (BENCH_UNSTR_ORDER=rcm opts out).
#
# LAUNCH RULE (learned the hard way): exactly ONE queue instance at a
# time — concurrent benches contaminate each other's timings on the
# single chip — and never edit a queue script while bash is executing it
# (bash reads by byte offset).  Launch a NEW file instead.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpu_queue_results}
mkdir -p "$OUT"

echo "== probe =="
if ! timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" \
    > "$OUT/probe3.log" 2>&1; then
  echo "TPU backend not reachable (see $OUT/probe3.log); aborting"
  exit 1
fi
cat "$OUT/probe3.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== $name =="
  if timeout "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"; then
    tail -1 "$OUT/$name.json"
  else
    echo "FAILED rc=$? (see $OUT/$name.err)"; tail -3 "$OUT/$name.err"
  fi
}

# 0. kernel parity on hardware (AFEM_TEST_TPU un-pins the conftest CPU
#    platform so the on_tpu tests actually execute)
run q3_tests 2400 AFEM_TEST_TPU=1 python -m pytest tests/test_pallas_spmv.py -q -k on_tpu

# 1. the clean champion number with the new defaults (sn order + window
#    SpMV + cheb2 + theta.03), including the structured secondary
run q3_main 5400 python bench.py

# 2. window-gather assembly (plan builds on the sn order; the 26GB
#    row-sum relayout is fixed — _row_sums MXU contraction)
run q3_asmwin 5400 BENCH_BOX=0 AFEM_UNSTR_ASM=window python bench.py

# 3. compact-column SpMV through ALL AMG levels + transfers (fresh
#    _compact hierarchy cache)
run q3_compact 5400 BENCH_BOX=0 BENCH_UNSTR_SPMV=compact python bench.py

# 4. all-in: compact SpMV + window assembly
run q3_compact_asmwin 5400 BENCH_BOX=0 BENCH_UNSTR_SPMV=compact AFEM_UNSTR_ASM=window python bench.py

# 5. smoother A/B on the sn order (CPU conv data: jacobi V(1,1) fewer
#    total fine SpMVs, cheb fewer iterations)
run q3_jacobi 5400 BENCH_BOX=0 BENCH_AMG_SMOOTHER=jacobi python bench.py

# 6. bf16 V-cycle window weights
run q3_bf16 5400 BENCH_BOX=0 BENCH_UNSTR_BF16=1 python bench.py

echo "== stage-3 done: results in $OUT =="
