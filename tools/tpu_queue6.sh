#!/bin/bash
# Round-3 stage-6 queue (post-restart): /tmp caches were wiped, so arm 1
# rebuilds all setup caches (now persisted under /root/repo/.cache).
# Pending arms from tpu_queue5.sh that the session cutoff killed, ordered
# so the most valuable numbers land first if the tunnel dies mid-queue:
# fresh champion, window-gather ASSEMBLY A/B (assembly is the dominant
# 2.31s of the 4.07s champion), bf16 V-cycle, all-in, on-TPU kernel
# parity tests, the 8.9M-DoF north-star, stability gate, smoother A/B.
#
# LAUNCH RULES (memory: tpu-bench-operational-rules): exactly ONE queue
# instance at a time; never edit this file while bash executes it; launch
# via the harness background Bash tool, not setsid.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/root/repo/.cache/queue_results}
mkdir -p "$OUT"

echo "== probe =="
if ! timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" \
    > "$OUT/probe6.log" 2>&1; then
  echo "TPU backend not reachable (see $OUT/probe6.log); aborting"
  exit 1
fi
cat "$OUT/probe6.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== $name ($(date -u +%H:%M:%S)) =="
  if timeout "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"; then
    tail -1 "$OUT/$name.json"
  else
    echo "FAILED rc=$? (see $OUT/$name.err)"; tail -3 "$OUT/$name.err"
  fi
}

# 1. fresh champion number with committed defaults (compact SpMV +
#    sn order + cheb2 + theta.03) + structured secondary; primes caches
run q6_main 7200 python bench.py

# 2. window-gather assembly A/B (VERDICT r2 #2): segsum is 2.31s of the
#    4.07s champion; the unit-weight sentinel plans (1c5de68) cleared the
#    HBM OOM.  First run pays the ~11 min host plan build.
run q6_asmwin 7200 BENCH_BOX=0 AFEM_UNSTR_ASM=window python bench.py

# 3. bf16 V-cycle window weights on the compact default (CPU conv data:
#    zero iteration cost at 268k and 2.1M)
run q6_bf16 5400 BENCH_BOX=0 BENCH_UNSTR_BF16=1 python bench.py

# 4. all-in: window assembly + bf16 V-cycle (caches warm by now)
run q6_allin 5400 BENCH_BOX=0 AFEM_UNSTR_ASM=window BENCH_UNSTR_BF16=1 python bench.py

# 5. on-TPU kernel parity tests (AFEM_TEST_TPU un-pins the conftest CPU pin)
run q6_tests 3600 AFEM_TEST_TPU=1 python -m pytest tests/test_pallas_spmv.py -q -k on_tpu

# 6. the 8.9M-DoF north-star (first run pays ~30-45 min of 1-CPU host
#    mesh+topology build; compact windows are ~N-linear so the margin
#    over the plain sweep should GROW here)
run q6_10m 10800 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 python bench.py

# 7. 10M with window assembly (reuses the arm-6 mesh/topo caches)
run q6_10m_asmwin 10800 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 AFEM_UNSTR_ASM=window python bench.py

# 8. stability gate for the fused structured composition
run q6_stability 3600 python bench.py --stability 3

# 9. smoother A/B: jacobi V(1,1) (fewer total fine SpMVs on CPU conv data;
#    per-iteration cost is the open TPU side)
run q6_jacobi 5400 BENCH_BOX=0 BENCH_AMG_SMOOTHER=jacobi python bench.py

# 10. iteration lever: theta .05 + cheb3 (18 iters on the CPU tuner vs 21)
run q6_t05c3 5400 BENCH_BOX=0 BENCH_AMG_THETA=0.05 BENCH_AMG_CHEB_DEG=3 python bench.py

echo "== stage-6 done: results in $OUT =="
