#!/bin/sh
# r6 session-4 TPU queue — the round-end same-run set (r5 verdict #8)
# plus speculative take-3 (6L target, warmup+residual-init trainer):
set -x
cd /root/repo
python scripts/exp_spec_real.py \
    --json benchmarks/results/spec_real_r6.json 2>&1
echo "=== R6D STEP 0 DONE (spec real take 3) ==="
python benchmarks/driver.py -c benchmarks/configs/flagship_r6.json \
    --no-baseline --json benchmarks/results/flagship_r6.json 2>&1
echo "=== R6D STEP 1 DONE (flagship) ==="
python scripts/bench_serving.py \
    --json benchmarks/results/serving_r6.json 2>&1
echo "=== R6D STEP 2 DONE (serving greedy) ==="
python scripts/bench_serving.py --llama --kv-heads 4 \
    --json benchmarks/results/serving_gqa_r6.json 2>&1
echo "=== R6D STEP 3 DONE (serving gqa) ==="
python scripts/bench_serving.py --experts 8 --moe-prefill grouped \
    --json benchmarks/results/serving_moe8_grouped_r6.json 2>&1
echo "=== R6D STEP 4 DONE (serving moe) ==="
python scripts/bench_serving.py --kv-packed \
    --json benchmarks/results/serving_packed_r6.json 2>&1
echo "=== R6D STEP 5 DONE (serving kv-packed) ==="
echo QUEUE_R6D_DONE
