#!/bin/sh
# Full CI gate (the "everything" tier — VERDICT r3 item 4).
#
# Tiers:
#   fast (default):  python -m pytest tests/ -q
#       ~22-25 min cold on the 1-core bench box (a fresh clone pays the
#       full XLA compile; tests/.jax_cache is populated on the first run
#       and NOT committed — .gitignore excludes it — so repeat runs drop
#       to ~12-14 min warm). Includes the AOT
#       TPU-lowering gate for the production pipeline, the
#       shard_map x Pallas interpret co-test (incl. the r5 sliced/chunked
#       sharded composition), kernel-family parity tests
#       (scan, curve, hist, offsets, Horner, karatsuba, pe-pack),
#       chunk-8 e2e across all seven curves, the magnitude-invariant
#       regression (3 representative params), and the sliced/chunked
#       branch tests.
#   full (this script): --runslow adds the frozen-feature sweeps
#       (glv/compress e2e + device-split), the chunk-16 interpret e2e,
#       the 2-process multihost test, the glv+compress lowering and
#       sharded co-tests, and the per-size hardware e2e gates (which
#       skip off-TPU) — plus a bounded e2e config fuzz, mirroring how the
#       reference compiles every shader in every GPU test
#       (src/cuzk/gpu.rs:281-293).
#
# Usage: scripts/ci.sh            (CPU backend, 8 virtual devices)
#        MSM_TPU_TEST_PLATFORM=axon scripts/ci.sh   (on the bench rig:
#                                   also runs tests/test_hw_e2e.py on TPU)
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q --runslow
python scripts/fuzz_e2e.py --seconds 120
