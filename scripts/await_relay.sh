#!/bin/bash
# Watch for the axon relay to come back, then run the one-shot hardware
# measurement session exactly once. Safe to leave running for hours.
# Usage: bash scripts/await_relay.sh [outdir] [max_wait_s]
set -u
OUT=${1:-/tmp/hw_results}
MAX=${2:-43200}
cd "$(dirname "$0")/.."
t0=$(date +%s)
while true; do
  if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; then
    # debounce: require two probes 30 s apart so a flapping relay doesn't
    # start a session that dies on its first step
    sleep 30
    if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; then
      echo "[await] relay up after $(( $(date +%s) - t0 ))s — starting session"
      bash scripts/hw_session.sh "$OUT"
      exit $?
    fi
  fi
  if (( $(date +%s) - t0 > MAX )); then
    echo "[await] relay still down after ${MAX}s — giving up"
    exit 1
  fi
  sleep 60
done
