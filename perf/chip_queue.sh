#!/bin/bash
# Round-3 chip measurement queue — run ONCE when the axon relay is healthy.
#
# Serializes the backlog of single-chip experiments (one process at a time;
# the host has one core and the relay wedges if timed-out clients stack up,
# so the queue STOPS at the first timeout instead of pressing on).
#
# Usage:  bash perf/chip_queue.sh [ledger.jsonl]
# Output: one JSON line per trial appended to the ledger (default
#         perf/CHIP_QUEUE_r03.jsonl), tagged with the trial name.

set -u
cd "$(dirname "$0")/.."
LEDGER="${1:-perf/CHIP_QUEUE_r03.jsonl}"

probe() {
  timeout 120 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

run_trial() {
  local tag="$1"; shift
  local envs="$1"; shift
  echo "=== $tag (env: ${envs:-none}; args: $*)" >&2
  local raw rc out errlog="/tmp/chip_queue_${tag}.err"
  raw=$(env $envs timeout 1200 python bench.py "$@" 2>"$errlog")
  rc=$?
  out=$(printf '%s\n' "$raw" | grep '^{' | tail -1)
  if [ $rc -eq 124 ] || [ $rc -eq 143 ]; then
    echo "{\"tag\": \"$tag\", \"error\": \"timeout — STOPPING (relay wedge risk)\"}" >> "$LEDGER"
    echo "TIMEOUT on $tag — stopping queue to protect the relay" >&2
    exit 2
  fi
  if [ -z "$out" ]; then
    echo "{\"tag\": \"$tag\", \"error\": \"no json (rc=$rc)\", \"stderr_log\": \"$errlog\"}" >> "$LEDGER"
    tail -5 "$errlog" >&2
    return 1
  fi
  echo "{\"tag\": \"$tag\", \"result\": $out}" >> "$LEDGER"
  echo "$tag -> $out" >&2
}

if ! probe; then
  echo "relay not responding — aborting before any trial" >&2
  exit 1
fi

# Cheapest-first; every structural knob is exact-math (tests pin it), so
# the only question per trial is the clips/s line.
run_trial baseline          ""
run_trial remat             "" TPU.REMAT True
run_trial remat_convsaved   "" TPU.REMAT True TPU.REMAT_POLICY conv_saved
run_trial pack_pointwise    "" TPU.PACK_POINTWISE True
run_trial remat_pack        "" TPU.REMAT True TPU.PACK_POINTWISE True
run_trial sepconv_nogrid    "VGS_SEPCONV_NOGRID=1" TPU.SEPCONV_FUSED True
run_trial sepconv_fused     "" TPU.SEPCONV_FUSED True
run_trial sepconv_xla       "VGS_SEPCONV_XLA=1" TPU.SEPCONV_FUSED True
run_trial sepconv_pack      "" TPU.SEPCONV_FUSED True TPU.PACK_POINTWISE True
run_trial bs160             "VGS_BENCH_BS=160"
run_trial bs192             "VGS_BENCH_BS=192"
echo "queue complete -> $LEDGER" >&2
