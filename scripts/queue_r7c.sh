#!/bin/sh
# r7 session TPU queue c: slotted-step bisect + the two re-poisoned
# train-bisect rows (fwd_loss/grad_only folded out of the scan in r7b).
set -x
cd /root/repo
python scripts/exp_slotted.py \
    --json benchmarks/results/slotted_r7.json 2>&1
echo "=== R7C STEP 0 DONE (slotted bisect) ==="
python scripts/exp_train_bisect.py --rows fwd_loss,grad_only \
    --json benchmarks/results/train_bisect2_r7.json 2>&1
echo "=== R7C STEP 1 DONE (train bisect fwd rows) ==="
echo QUEUE_R7C_DONE
