#!/bin/sh
# r7 session TPU queue b: (1) device-scheduler per-iteration bisect,
# (2) dense-training-step component bisect.
set -x
cd /root/repo
python scripts/exp_devbatch.py \
    --json benchmarks/results/devbatch_r7.json 2>&1
echo "=== R7B STEP 0 DONE (devbatch bisect) ==="
python scripts/exp_train_bisect.py \
    --json benchmarks/results/train_bisect_r7.json 2>&1
echo "=== R7B STEP 1 DONE (train bisect) ==="
echo QUEUE_R7B_DONE
