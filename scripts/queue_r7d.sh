#!/bin/sh
# r7 session TPU queue d: (1) slotted step after the DUS-form fix,
# (2) batching bench re-run on the fixed step (continuous + device
# schedulers should jump ~an order), (3) flash-attention training VJP
# + corrected grad_only rows.
set -x
cd /root/repo
python scripts/exp_slotted.py --rows step_slot,step_scalar \
    --json benchmarks/results/slotted_fixed_r7.json 2>&1
echo "=== R7D STEP 0 DONE (slotted fixed) ==="
python scripts/bench_batching.py \
    --json benchmarks/results/batching_fixed_r7.json 2>&1
echo "=== R7D STEP 1 DONE (batching re-run) ==="
python scripts/exp_train_bisect.py --rows attn_flash,grad_only,full \
    --json benchmarks/results/train_flash_r7.json 2>&1
echo "=== R7D STEP 2 DONE (train flash) ==="
echo QUEUE_R7D_DONE
