#!/bin/bash
# One-shot hardware measurement session (run when the axon relay is up).
# Usage: bash scripts/hw_session.sh [outdir]   (default /tmp/hw_results)
# Runs ONE TPU process at a time (axon constraint). Each step appends its
# JSON lines + stderr log under $OUT. Steps are ordered most-important
# first so a mid-session relay drop still leaves the key numbers.
set -u
OUT=${1:-/tmp/hw_results}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() { timeout 10 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; }

step() { # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if ! probe; then echo "[hw] relay down before $name — aborting"; exit 1; fi
  echo "[hw] === $name ==="
  timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "[hw] $name exit=$? $(tail -c 300 "$OUT/$name.json" | tail -1)"
}

# 1. variant sweep at 2^20 with oracle verification (the decision data)
step tune20 2400 python scripts/tune_hw.py --size 20 --verify
# 2. headline bench (auto-selects + self-verifies glv+compress)
step bench20 1800 python bench.py --size 20 --timings
# 3. size sweep
step bench16 900 python bench.py --size 16 --verify
step bench18 900 python bench.py --size 18
step bench22 2400 python bench.py --size 22
# 4. batched-MSM throughput (BASELINE config 4)
step batched 1800 python bench.py --batched 8 --size 16
# 5. per-stage trace for PERF_NOTES budget (base + optimized configs)
step profile 1800 python -m msm_tpu profile --size 20
step profile_gc 1800 python -m msm_tpu profile --size 20 --glv --compress
# 5b. single-chip field-muls/sec row (BASELINE.md scaling table, D=1)
step sharded1 1800 python bench.py --sharded 1 --size 20 --verify
# 6. Montgomery-multiplier variant sweep (parity table, word sizes 13-16)
step variants 900 python -m msm_tpu variants
echo "[hw] session complete; results in $OUT"
