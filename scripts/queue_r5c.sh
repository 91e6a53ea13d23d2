#!/bin/sh
# r5 session-4 TPU queue (run AFTER exp_moe_stack.py finishes; one
# queue at a time — remote compiles serialize server-side):
#   1. tied-trunk speculative macro + acceptance, same-run vs the
#      separate-draft macro and the truncated-head variant;
#   2. MoE-8 grouped serving rows with the stacked-weights kernel
#      (the verdict r4 #1 >=50% bar check);
#   3. round-end flagship re-measure in ONE driver run (verdict r4 #9).
set -x
cd /root/repo
python scripts/exp_decode_form.py --kv-quant int8 \
    --json benchmarks/results/decode_form_int8kv_r5c.json
python scripts/exp_spec_bisect.py --trunk 2 --draft-vocab 8192 \
    --json benchmarks/results/spec_trunk_r5c.json
python scripts/bench_serving.py --experts 8 --moe-prefill grouped \
    --json benchmarks/results/serving_moe8_grouped_r5c.json
python benchmarks/driver.py -c benchmarks/configs/flagship_r5.json \
    --no-baseline --json benchmarks/results/flagship_r5.json
echo QUEUE_DONE
