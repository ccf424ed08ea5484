#!/bin/bash
# Round-3 stage-4: the 10M north-star + gates, run AFTER stage-3 picks the
# winning 1.9M configuration (edit WINNER_FLAGS below before launching —
# this file must NOT be edited while a bash instance is executing it).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpu_queue_results}
mkdir -p "$OUT"

# stage-3 winner flags (fill in from q3_*.json before launching)
WINNER_FLAGS=${WINNER_FLAGS:-}

echo "== probe =="
if ! timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" \
    > "$OUT/probe4.log" 2>&1; then
  echo "TPU backend not reachable; aborting"
  exit 1
fi
cat "$OUT/probe4.log"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name =="
  if timeout "$tmo" env "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"; then
    tail -1 "$OUT/$name.json"
  else
    echo "FAILED rc=$? (see $OUT/$name.err)"; tail -3 "$OUT/$name.err"
  fi
}

# 1. 10M (8.9M DoF) north-star with the stage-3 winner (first run pays
#    ~30 min of host mesh+topo build; caches make reruns fast)
run q4_10m 10800 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 $WINNER_FLAGS python bench.py

# 2. iteration-growth levers at 10M (CPU conv data: 64 default, 55 theta03;
#    W-cycle + per-level cheb degrees target coarse-grid-correction decay)
run q4_10m_w 10800 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 BENCH_AMG_CYCLE=W $WINNER_FLAGS python bench.py
run q4_10m_cheb24 10800 BENCH_UNSTR_H=6 BENCH_UNSTR_REFINE=3 BENCH_BOX=0 BENCH_AMG_CHEB_DEG=2,4 $WINNER_FLAGS python bench.py

# 3. stability gate for the fused structured composition
run q4_stability 3600 python bench.py --stability 3

echo "== stage-4 done =="
