#!/bin/bash
# Wait for the axon relay to recover, then run the round-3 chip queue.
# Probes every 15 min with a light jax.devices() (no compiles server-side);
# also waits for /tmp/cpu_suite.log to contain "done" so the single-core
# host isn't shared with the CPU test suite.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_watch.log
echo "watch start $(date -u +%FT%TZ)" >> "$LOG"
for i in $(seq 1 48); do
  if [ -f /tmp/cpu_suite.log ] && ! grep -q done /tmp/cpu_suite.log; then
    echo "$(date -u +%T) cpu suite still running; sleep 300" >> "$LOG"
    sleep 300
    continue
  fi
  if timeout 120 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
    echo "$(date -u +%T) relay UP — running chip queue" >> "$LOG"
    bash perf/chip_queue.sh perf/CHIP_QUEUE_r03b.jsonl >> "$LOG" 2>&1
    rc=$?
    echo "queue exit=$rc $(date -u +%T)" >> "$LOG"
    if [ $rc -eq 0 ]; then
      echo "$(date -u +%T) running full regime sweep" >> "$LOG"
      timeout 3600 python perf/regime_bench.py > perf/REGIME_r03b.txt 2>/tmp/regime_r03b.err
      echo "regime exit=$? $(date -u +%T)" >> "$LOG"
    fi
    exit 0
  fi
  echo "$(date -u +%T) relay still down (probe $i); sleep 900" >> "$LOG"
  sleep 900
done
echo "gave up $(date -u +%FT%TZ)" >> "$LOG"
exit 1
