#!/bin/sh
# Round-5 hardware measurement session (run on the bench rig, nothing else
# on the TPU — the relay host has ONE core, so steps are strictly serial).
# Each step tees to /tmp/hw_r05/*.log; ordered by decision value so a
# partial session still answers the top questions:
#
#  1. bench base        — headline with the r5 pe int16 pair packing ON
#                         (the default); the candidate for BENCH_r05
#  2. pe layout A/B     — MSM_TPU_PE_PACK=0 reproduces the r4 layout;
#                         MSM_TPU_PE_LAYOUT=cpr tries the limbs-first
#                         emission + one XLA transpose (VERDICT item 2)
#  3. karatsuba A/B     — VERDICT item 1: difference-Karatsuba phase-1,
#                         oracle-verified at 2^14 inside bench, then the
#                         2^20 headline shape
#  4. grumpkin/vesta    — VERDICT item 6: oracle-verified hardware rows
#                         for the 2-cycle recursion partners
#  5. plan serving      — VERDICT item 3: ms/instance with table reuse
set -x
mkdir -p /tmp/hw_r05
cd "$(dirname "$0")/.."

# NOTE: after the r5 session the pack default flipped to OFF (it measured
# 433 vs 406 ms) — bench_base is now the r4 layout; =1 opts the pack in
timeout 1200 python bench.py 2>&1 | tee /tmp/hw_r05/bench_base.log

MSM_TPU_PE_PACK=1 timeout 1200 python bench.py 2>&1 \
    | tee /tmp/hw_r05/bench_pack.log
MSM_TPU_PE_LAYOUT=cpr timeout 1200 python bench.py 2>&1 \
    | tee /tmp/hw_r05/bench_cpr.log

timeout 1200 python bench.py --karatsuba --size 16 --verify 2>&1 \
    | tee /tmp/hw_r05/kara16.log
timeout 1200 python bench.py --karatsuba 2>&1 | tee /tmp/hw_r05/kara20.log

timeout 1200 python bench.py --curve grumpkin --size 16 --verify 2>&1 \
    | tee /tmp/hw_r05/grumpkin16.log
timeout 1800 python bench.py --curve grumpkin --size 18 --verify 2>&1 \
    | tee /tmp/hw_r05/grumpkin18.log
timeout 1200 python bench.py --curve vesta --size 16 --verify 2>&1 \
    | tee /tmp/hw_r05/vesta16.log
timeout 1800 python bench.py --curve vesta --size 18 --verify 2>&1 \
    | tee /tmp/hw_r05/vesta18.log

timeout 1800 python bench.py --plan 8 --size 20 2>&1 | tee /tmp/hw_r05/plan20.log
timeout 1800 python bench.py --plan 8 --size 16 2>&1 | tee /tmp/hw_r05/plan16.log
