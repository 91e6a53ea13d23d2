#!/bin/sh
# r6 session-1 TPU queue (one at a time — remote compiles serialize
# server-side; do NOT edit engine/kernel files while this runs):
#   0. hardware validation incl. the new f16 rows (verdict #6)
#   1. grouped-MoE training forms at the production B8 s512 geometry,
#      remat on/off + stacked in-kernel indexing (verdict #1)
#   2. int8 prefill e2e with fused bias/gelu epilogues (verdict #3)
#   3. b8 decode A/B: packed head-pair cache + marginal KV price (verdict #4)
#   4. speculative decoding on a TRAINED model: real acceptance (verdict #2)
set -x
cd /root/repo
python scripts/tpu_validate.py 2>&1
echo "=== QUEUE STEP 0 DONE (tpu_validate) ==="
python scripts/exp_moe_train.py \
    --json benchmarks/results/moe_train_r6.json 2>&1
echo "=== QUEUE STEP 1 DONE (moe_train) ==="
python scripts/bench_serving.py --quant int8 --int8-compute \
    --json benchmarks/results/serving_int8_r6.json 2>&1
echo "=== QUEUE STEP 2 DONE (serving int8) ==="
python scripts/exp_decode_pack.py --b 8 \
    --json benchmarks/results/decode_b8_r6.json 2>&1
echo "=== QUEUE STEP 3 DONE (decode pack) ==="
python scripts/exp_spec_real.py \
    --json benchmarks/results/spec_real_r6.json 2>&1
echo "=== QUEUE STEP 4 DONE (spec real) ==="
echo QUEUE_R6A_DONE
