#!/bin/bash
# Round-4 queue 9: regenerate the v2 assembler-plan cache (the BENCH_r03
# failure), re-measure the champion under the new budgeted bench, and run
# the queue-8 arms that never executed (phase probe, compact/batched
# assembly A/B, W-cycle, cheb(2,4)).  ONE queue at a time.
#
# Order per VERDICT r3 #7: the on-TPU kernel-test lane runs FIRST.
# `touch $OUT/STOP` aborts between arms.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/root/repo/.cache/queue_results}
mkdir -p "$OUT"
rm -f "$OUT/STOP"

echo "== probe =="
if ! timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" \
    > "$OUT/probe9.log" 2>&1; then
  echo "TPU backend not reachable (see $OUT/probe9.log); aborting"
  exit 1
fi
cat "$OUT/probe9.log"

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

# 1. on-TPU kernel parity lane (includes the compact-assembly and batched
#    coords tests added at the end of round 3, never run on hardware)
run q9_tputests 2400 AFEM_TEST_TPU=1 python -m pytest tests/test_pallas_spmv.py tests/test_pallas_stencil.py -q -k on_tpu

# 2. default bench — rebuilds + caches the missing v2 window plan
#    (~11 min host numpy), then measures the champion config end-to-end.
#    Budget raised so the plan build is not degraded away.
run q9_main 5400 BENCH_BUDGET_S=5200 python bench.py

# 3. cache gate must pass after the main run
run q9_verify 300 python tools/verify_caches.py

# 4. assembly phase attribution (cached plan; fast)
run q9_phases 3600 python tools/probe_asm_phases.py

# 5. compact assembly: probe builds + caches the _c plan, then the A/B
run q9_phases_c 7200 python tools/probe_asm_phases.py --compact
run q9_asmc 5400 BENCH_BUDGET_S=5200 BENCH_BOX=0 AFEM_ASM_COMPACT=1 python bench.py

# 6. batched coords gather A/B (reuses the v2 plan)
run q9_coordsb 5400 BENCH_BUDGET_S=5200 BENCH_BOX=0 AFEM_ASM_COORDS=batched python bench.py

# 7. iteration levers (solve is fine-sweep-count bound: q7 cheb2 24x71ms
#    == jacobi 37x45.5ms; these attack the sweep count)
run q9_wcycle 5400 BENCH_BUDGET_S=5200 BENCH_BOX=0 BENCH_AMG_CYCLE=W python bench.py
run q9_c24 5400 BENCH_BUDGET_S=5200 BENCH_BOX=0 BENCH_AMG_CHEB_DEG=2,4 python bench.py

# 8. full CPU suite + dryrun, serialized at the end (1-CPU host)
run q9_pytest 3600 python -m pytest tests/ -x -q
run q9_dryrun 3600 python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

echo "== queue 9 done: results in $OUT =="
