#!/bin/bash
# TPU tunnel watcher: probes the default JAX backend every ~5 min and
# appends status lines to /tmp/tpu_status.log.  The round-2 outage showed
# jax.devices() HANGS (not errors) when the axon tunnel is dead, so every
# probe is bounded.  Run in background; check the log before queueing
# hardware measurements (tools/tpu_queue.sh).
LOG=/tmp/tpu_status.log
while true; do
  ts=$(date -u +%FT%TZ)
  out=$(timeout 150 python -c "import jax; d=jax.devices(); print(d[0].platform, len(d), flush=True)" 2>/dev/null)
  rc=$?
  if [ $rc -eq 0 ] && echo "$out" | grep -q tpu; then
    echo "$ts UP $out" >> "$LOG"
  else
    echo "$ts DOWN rc=$rc" >> "$LOG"
  fi
  sleep 300
done
