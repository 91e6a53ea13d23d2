#!/bin/sh
# r5 session-3 TPU queue: GQA decode-form in-loop + refreshed serving rows.
# Run ONE queue at a time (remote compiles serialize server-side).
set -x
cd /root/repo
python scripts/exp_decode_form.py --llama --kv-heads 4 \
    --json benchmarks/results/decode_form_gqa_r5.json
python scripts/bench_serving.py \
    --json benchmarks/results/serving_r5b.json
echo QUEUE_DONE
