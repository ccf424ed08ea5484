#!/bin/bash
# Round-3 stage-5 TPU measurement queue: re-runs the stage-3 arms that the
# session cutoff killed (q3_asmwin onward), on the committed sn-order +
# window-SpMV defaults.  Priority-ordered: if the tunnel dies mid-queue the
# earlier arms are the ones that matter.
#
# LAUNCH RULES (memory: tpu-bench-operational-rules): exactly ONE queue
# instance at a time; never edit this file while bash executes it; launch
# via the harness background Bash tool, not setsid.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpu_queue_results}
mkdir -p "$OUT"

echo "== probe =="
if ! timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" \
    > "$OUT/probe5.log" 2>&1; then
  echo "TPU backend not reachable (see $OUT/probe5.log); aborting"
  exit 1
fi
cat "$OUT/probe5.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== $name =="
  if timeout "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"; then
    tail -1 "$OUT/$name.json"
  else
    echo "FAILED rc=$? (see $OUT/$name.err)"; tail -3 "$OUT/$name.err"
  fi
}

# 1. window-gather assembly A/B (VERDICT r2 #2; first run pays the ~11 min
#    host plan build, cached afterwards)
run q5_asmwin 5400 BENCH_BOX=0 AFEM_UNSTR_ASM=window python bench.py

# 2. compact-column SpMV through ALL AMG levels + transfers (plan model:
#    ~6.1x fewer lane-ops; fresh _compact hierarchy cache ~4 min host)
run q5_compact 5400 BENCH_BOX=0 BENCH_UNSTR_SPMV=compact python bench.py

# 3. bf16 V-cycle window weights (CPU conv: zero iteration cost)
run q5_bf16 5400 BENCH_BOX=0 BENCH_UNSTR_BF16=1 python bench.py

# 4. all-in: compact SpMV + window assembly
run q5_compact_asmwin 5400 BENCH_BOX=0 BENCH_UNSTR_SPMV=compact AFEM_UNSTR_ASM=window python bench.py

# 5. iteration lever: theta .05 + cheb3 (18 iters on the CPU tuner vs 21)
run q5_t05c3 5400 BENCH_BOX=0 BENCH_AMG_THETA=0.05 BENCH_AMG_CHEB_DEG=3 python bench.py

# 6. smoother A/B: jacobi V(1,1) (fewer total fine SpMVs on CPU conv data)
run q5_jacobi 5400 BENCH_BOX=0 BENCH_AMG_SMOOTHER=jacobi python bench.py

# 7. full CPU test suite (sequential here so it can't contaminate timings)
run q5_pytest 2400 python -m pytest tests/ -x -q

echo "== stage-5 done: results in $OUT =="
