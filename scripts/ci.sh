#!/bin/sh
# Full CI gate (the "everything" tier — VERDICT r3 item 4).
#
# The default `python -m pytest tests/ -q` is the fast tier (<10 min on the
# 1-core bench box; includes the TPU-lowering AOT gate and the
# shard_map x Pallas interpret co-test). This script runs the FULL suite —
# --runslow adds the 2-process multihost test, the glv+compress lowering and
# sharded co-tests, and the per-size hardware e2e gates (which skip off-TPU)
# — plus a bounded e2e config fuzz, mirroring how the reference compiles
# every shader in every GPU test (src/cuzk/gpu.rs:281-293).
#
# Usage: scripts/ci.sh            (CPU backend, 8 virtual devices)
#        MSM_TPU_TEST_PLATFORM=axon scripts/ci.sh   (on the bench rig:
#                                   also runs tests/test_hw_e2e.py on TPU)
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q --runslow
python scripts/fuzz_e2e.py --seconds 120
