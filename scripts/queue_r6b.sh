#!/bin/sh
# r6 session-2 TPU queue:
#   0. speculative on a TRAINED model (induction corpus) — verdict #2
#   1. MoE training bisect (fwd/bwd, head intercept, bm64) — verdict #1
#   2. stacked MoE train re-measure with the bf16-z1 residual lever
#   3. tpu_validate: f16 rows now through the XLA delegation
set -x
cd /root/repo
python scripts/exp_spec_real.py \
    --json benchmarks/results/spec_real_r6.json 2>&1
echo "=== R6B STEP 0 DONE (spec real) ==="
python scripts/exp_moe_bisect.py \
    --json benchmarks/results/moe_bisect_r6.json 2>&1
echo "=== R6B STEP 1 DONE (moe bisect) ==="
python scripts/exp_moe_train.py --forms stacked,stacked+remat \
    --json benchmarks/results/moe_train_r6b.json 2>&1
echo "=== R6B STEP 2 DONE (moe train z1-bf16) ==="
python scripts/tpu_validate.py 2>&1
echo "=== R6B STEP 3 DONE (tpu_validate) ==="
echo QUEUE_R6B_DONE
