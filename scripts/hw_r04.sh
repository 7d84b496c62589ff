#!/bin/sh
# Round-4 hardware measurement session (run on the bench rig, nothing else
# on the TPU). Each step appends to /tmp/hw_r04/*.log; steps are ordered by
# decision value so a partial session still answers the top questions:
#
#  1. binning_probe  — VERDICT item 1: the radix-partition primitives
#  2. bench base     — headline sanity after the --auto demotion
#  3. batched 2^20   — VERDICT item 2: the amortized headline row
#  4. second curve   — VERDICT item 8: bls12_377 at 2^18
#  5. compress/glv   — VERDICT item 9: one last home-finding sweep
#                      (bucket-heavy 2^16/2^18; bls12_381 where the
#                      ancillary/mul ratio shrinks)
set -x
mkdir -p /tmp/hw_r04
cd "$(dirname "$0")/.."

timeout 3000 python scripts/binning_probe.py --json /tmp/hw_r04/binprobe.json \
    2>&1 | tee /tmp/hw_r04/binprobe.log

timeout 1200 python bench.py 2>&1 | tee /tmp/hw_r04/bench_base.log

timeout 1800 python bench.py --batched 2 --size 20 2>&1 | tee /tmp/hw_r04/batched2.log
timeout 1800 python bench.py --batched 4 --size 20 2>&1 | tee /tmp/hw_r04/batched4.log

timeout 1800 python bench.py --curve bls12_377 --size 18 --verify 2>&1 \
    | tee /tmp/hw_r04/bls377_18.log

timeout 1200 python bench.py --compress --size 16 --verify 2>&1 | tee /tmp/hw_r04/compress16.log
timeout 1200 python bench.py --compress --size 18 --verify 2>&1 | tee /tmp/hw_r04/compress18.log
timeout 1800 python bench.py --curve bls12_381 --size 18 --verify 2>&1 \
    | tee /tmp/hw_r04/bls381_18.log
timeout 1800 python bench.py --curve bls12_381 --compress --size 18 --verify 2>&1 \
    | tee /tmp/hw_r04/bls381_compress18.log
