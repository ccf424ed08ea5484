#!/bin/bash
# Round-3 stage-8 queue: assembly-phase attribution + compact-assembly A/B.
# Run AFTER tpu_queue7.sh completes (ONE queue at a time).
#
# Arms:
#  1. phase probe of the current window assembly (coords gather / ke10+
#     transpose / reducer) — uses the cached plan, fast
#  2. compact phase probe — pays the ~30 min compact plan build once,
#     caches it under the bench's pickle key
#  3. compact end-to-end bench A/B at 1.9M (plan now cached)
#  4. full CPU test suite, serialized here so it never contends with a
#     measured arm (1-CPU host)
#  5. multichip dryrun (8 virtual CPU devices; exercises all sharded paths)
#
# `touch $OUT/STOP` aborts between arms.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/root/repo/.cache/queue_results}
mkdir -p "$OUT"
rm -f "$OUT/STOP"

echo "== probe =="
if ! timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" \
    > "$OUT/probe8.log" 2>&1; then
  echo "TPU backend not reachable (see $OUT/probe8.log); aborting"
  exit 1
fi
cat "$OUT/probe8.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -f "$OUT/STOP" ] && { echo "STOP requested; exiting"; exit 0; }
  echo "== $name ($(date -u +%H:%M:%S)) =="
  if timeout "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"; then
    tail -1 "$OUT/$name.json"
  else
    echo "FAILED rc=$? (see $OUT/$name.err)"; tail -3 "$OUT/$name.err"
  fi
}

# 0. v1 assembler pickles are superseded by the slim v2 builds (lazy
#    slot_map_t + no empty subrows); free the 5.4 GB
rm -f "$(dirname "$0")/../.cache/afem_meshes"/asmplan_*_v1.pkl

run q8_phases 7200 python tools/probe_asm_phases.py
run q8_phases_c 7200 python tools/probe_asm_phases.py --compact
run q8_compact 5400 BENCH_BOX=0 AFEM_ASM_COMPACT=1 python bench.py
# iteration levers never yet measured on TPU.  q7 data: cheb2 24 it x
# 71 ms = jacobi 37 it x 45.5 ms = 1.7s — the solve is fine-sweep-count
# bound (~122 sweeps both ways); these arms attack the sweep COUNT.
# W-cycle shares the V-cycle hierarchy cache (cycle applied post-load).
run q8_wcycle 5400 BENCH_BOX=0 BENCH_AMG_CYCLE=W python bench.py
# stronger smoothing on the cheap coarse levels only (fine stays cheb2)
run q8_c24 5400 BENCH_BOX=0 BENCH_AMG_CHEB_DEG=2,4 python bench.py
# on-TPU kernel parity incl. the new compact-assembly test (q7_tests may
# have collected before it was committed)
run q8_tputests 3600 AFEM_TEST_TPU=1 python -m pytest tests/test_pallas_spmv.py -q -k on_tpu
run q8_pytest 3600 python -m pytest tests/ -x -q
run q8_dryrun 3600 python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
# 10M iteration-scaling arms (reuse q7_10m mesh/topo/plan caches): the
# V-cycle loses iteration scaling at 8.9M (CPU tuner: 21 -> 55 iters);
# W-cycle and stronger coarse smoothing are the two candidate fixes
run q8_10m_w 10800 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 BENCH_AMG_CYCLE=W python bench.py
run q8_10m_c24 10800 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 BENCH_AMG_CHEB_DEG=2,4 python bench.py

echo "== stage-8 done: results in $OUT =="
