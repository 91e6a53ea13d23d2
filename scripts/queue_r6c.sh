#!/bin/sh
# r6 session-3 TPU queue:
#   0. speculative on a trained model, take 3 (residual-init + warmup
#      trainer; the 12L target previously sat at uniform CE)
#   1. MoE training backward bisect #2 (dense baseline, DUS pricing,
#      update pricing)
set -x
cd /root/repo
python scripts/exp_spec_real.py \
    --json benchmarks/results/spec_real_r6.json 2>&1
echo "=== R6C STEP 0 DONE (spec real) ==="
python scripts/exp_moe_bisect2.py \
    --json benchmarks/results/moe_bisect2_r6.json 2>&1
echo "=== R6C STEP 1 DONE (moe bisect2) ==="
echo QUEUE_R6C_DONE
