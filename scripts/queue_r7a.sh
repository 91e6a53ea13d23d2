#!/bin/sh
# r7 session TPU queue — device-side continuous batching vs host vs
# static, ONE run on the same trace (r5 verdict weak #7: the host
# scheduler's 0.41x loss had a diagnosis and no attempted lever).
set -x
cd /root/repo
python scripts/bench_batching.py \
    --json benchmarks/results/batching_r7.json 2>&1
echo "=== R7A STEP 0 DONE (batching host+device+static) ==="
echo QUEUE_R7A_DONE
