#!/bin/bash
# Round-3 stage-7 queue: session restart killed queue6 at arm 5.
# Measured by queue6 (committed): window assembly 3.397s vs segsum 4.063s
# at 1.9M (now the default); bf16 V-cycle neutral (70.9 vs 71.1 ms/iter,
# gather-issue-bound kernel) so it stays off.
# Remaining arms, short-first so the most numbers land if the tunnel dies:
# fresh-default champion, iteration-lever A/Bs, on-TPU parity tests,
# stability gate, then the 8.9M north-star (long 1-CPU host build).
#
# LAUNCH RULES (memory: tpu-bench-operational-rules): ONE queue at a time;
# never edit this file while bash executes it; launch via the harness
# background Bash tool, not setsid.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/root/repo/.cache/queue_results}
mkdir -p "$OUT"

echo "== probe =="
if ! timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" \
    > "$OUT/probe7.log" 2>&1; then
  echo "TPU backend not reachable (see $OUT/probe7.log); aborting"
  exit 1
fi
cat "$OUT/probe7.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== $name ($(date -u +%H:%M:%S)) =="
  if timeout "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"; then
    tail -1 "$OUT/$name.json"
  else
    echo "FAILED rc=$? (see $OUT/$name.err)"; tail -3 "$OUT/$name.err"
  fi
}

# 1. fresh champion with committed defaults (window assembly + compact SpMV
#    + sn order + cheb2 + theta.03) + structured secondary
run q7_main 7200 python bench.py

# 2. iteration lever: theta .05 + cheb3 (18 iters on the CPU tuner vs 21;
#    TPU shows 24 with the default — is the trade worth it at 71 ms/iter?)
run q7_t05c3 5400 BENCH_BOX=0 BENCH_AMG_THETA=0.05 BENCH_AMG_CHEB_DEG=3 python bench.py

# 3. smoother A/B: jacobi V(1,1)
run q7_jacobi 5400 BENCH_BOX=0 BENCH_AMG_SMOOTHER=jacobi python bench.py

# 4. on-TPU kernel parity tests (AFEM_TEST_TPU un-pins the conftest CPU pin)
run q7_tests 3600 AFEM_TEST_TPU=1 python -m pytest tests/test_pallas_spmv.py -q -k on_tpu

# 5. stability gate for the fused structured composition
run q7_stability 3600 python bench.py --stability 3

# 6. the 8.9M-DoF north-star with the new defaults (first run pays the
#    1-CPU host mesh+topology+plan build, possibly >1h; caches persist
#    under /root/repo/.cache so a rerun is cheap)
run q7_10m 14400 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 python bench.py

# 7. 10M segsum A/B (reuses arm-6 mesh/topo caches; answers whether the
#    window assembler's margin grows or shrinks with N)
run q7_10m_segsum 7200 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 AFEM_UNSTR_ASM=segsum python bench.py

echo "== stage-7 done: results in $OUT =="
