#!/bin/sh
# r7 session TPU queue e: flash-attention training VJP measured —
# (1) dense step row, (2) grouped-MoE training at the known-gap
# geometry with +flash (the dense-rate bound just moved).
set -x
cd /root/repo
python scripts/exp_train_bisect.py --rows full,attn_flash,attn_remat \
    --json benchmarks/results/train_flash_r7.json 2>&1
echo "=== R7E STEP 0 DONE (dense flash) ==="
python scripts/exp_moe_train.py \
    --forms stacked,stacked+flash,stacked+remat+flash \
    --json benchmarks/results/moe_train_flash_r7.json 2>&1
echo "=== R7E STEP 1 DONE (moe flash) ==="
echo QUEUE_R7E_DONE
