#!/bin/sh
# r7 round-end TPU queue — the same-run set (r5 verdict #8, final):
# flagship + serving greedy/GQA/MoE + device-batching, then the D=64
# prefill flash A/B (fresh compiles, so it goes last).
set -x
cd /root/repo
python benchmarks/driver.py -c benchmarks/configs/flagship_r6.json \
    --no-baseline --json benchmarks/results/flagship_r7.json 2>&1
echo "=== R7G STEP 0 DONE (flagship) ==="
python scripts/bench_serving.py \
    --json benchmarks/results/serving_r7.json 2>&1
echo "=== R7G STEP 1 DONE (serving greedy) ==="
python scripts/bench_serving.py --llama --kv-heads 4 \
    --json benchmarks/results/serving_gqa_r7.json 2>&1
echo "=== R7G STEP 2 DONE (serving gqa) ==="
python scripts/bench_serving.py --experts 8 --moe-prefill grouped \
    --json benchmarks/results/serving_moe8_grouped_r7.json 2>&1
echo "=== R7G STEP 3 DONE (serving moe) ==="
python scripts/bench_batching.py --modes device \
    --json benchmarks/results/batching_final_r7.json 2>&1
echo "=== R7G STEP 4 DONE (device batching) ==="
python scripts/exp_flash_infer.py \
    --json benchmarks/results/flash_infer_r7.json 2>&1
echo "=== R7G STEP 5 DONE (flash infer A/B) ==="
echo QUEUE_R7G_DONE
