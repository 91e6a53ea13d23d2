#!/bin/sh
# r7 session TPU queue f: flash kernels at auto heads-per-program.
set -x
cd /root/repo
python scripts/exp_train_bisect.py --rows full,attn_flash \
    --json benchmarks/results/train_flash2_r7.json 2>&1
echo "=== R7F STEP 0 DONE ==="
python scripts/exp_moe_train.py --forms stacked+flash \
    --json benchmarks/results/moe_train_flash2_r7.json 2>&1
echo "=== R7F STEP 1 DONE ==="
echo QUEUE_R7F_DONE
