#!/usr/bin/env python
"""Serve a GPT-family model: prefill + KV-cache decode, sampling knobs,
and a Megatron tensor-parallel decode step over whatever devices exist.

CLI equivalent:
    tpp-serve --embed 256 --layers 4 --steps 16 --temperature 0.8 --top-k 40
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.serving import (GptConfig, init_params, make_decode_step,
                                  make_generate, make_prefill,
                                  make_tp_decode_step, stack_params)

cfg = GptConfig(vocab=512, embed=256, heads=4, layers=4, mlp_ratio=4,
                max_seq=128, dtype="f32")
# stacked layers run under one lax.scan: ~layers x smaller compiled HLO
# (essential for deep models through a remote-compile channel)
params = stack_params(init_params(cfg, seed=0))
prompt = jnp.asarray(
    np.random.default_rng(0).integers(0, cfg.vocab, (2, 16)), jnp.int32)

# --- one-shot generation: prefill + scan'd decode, nucleus sampling ---
gen = make_generate(cfg, steps=12, temperature=0.8, top_k=40, top_p=0.95)
toks = gen(params, prompt, jax.random.PRNGKey(0))
print("sampled:", np.asarray(toks)[0])

# --- explicit prefill / stepwise decode (the serving-loop shape) ---
logits, cache = make_prefill(cfg)(params, prompt)
step = make_decode_step(cfg)
tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
out = []
for _ in range(8):
    logits, cache = step(params, cache, tok)   # one compiled step, every pos
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    out.append(np.asarray(tok))
print("greedy: ", np.stack(out, 1)[0])

# --- tensor-parallel decode: KV cache sharded over heads ---
n = len(jax.devices())
tp = 4 if n >= 4 else n
if cfg.heads % tp == 0 and tp > 1:
    from tpp_mlir_tpu.parallel import make_mesh

    mesh = make_mesh({"tp": tp})
    tp_step = make_tp_decode_step(mesh, cfg, stacked=True)
    tp_logits, _ = tp_step(params, cache, tok)
    print(f"tp={tp} decode matches:",
          bool(jnp.allclose(tp_logits, step(params, cache, tok)[0],
                            atol=1e-4)))

# --- weight-only int8 + int8 KV cache: the low-bit serving stack ---
# decode re-reads all weights + the live KV window per token (HBM-bound),
# so int8 storage is ~2x tokens/s at the same logits +- quantization noise
from tpp_mlir_tpu.serving import quantize_params, quantized_bytes

qcfg = GptConfig(vocab=512, embed=256, heads=4, layers=4, mlp_ratio=4,
                 max_seq=128, dtype="f32", kv_quant="int8")
qparams = quantize_params(params)          # QTensor pytree leaves
full = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
print(f"int8 params: {quantized_bytes(qparams):,} bytes "
      f"(full {full:,})")
qlogits, qcache = make_prefill(qcfg)(qparams, prompt)
qtok = jnp.argmax(qlogits[:, -1], axis=-1).astype(jnp.int32)
qlog2, _ = make_decode_step(qcfg)(qparams, qcache, qtok)
_, fcache = make_prefill(cfg)(params, prompt)   # same position, full prec
flog2, _ = step(params, fcache, qtok)
drift = float(jnp.linalg.norm(qlog2 - flog2)
              / jnp.linalg.norm(flog2))
print(f"int8 stack logits drift vs full precision: {drift:.3%} "
      "(bounds tested in tests/serving/test_quant.py)")

# --- speculative decoding: draft K tokens, verify in ONE target pass ---
# greedy speculative emits EXACTLY the target's greedy stream; the draft
# only changes the speed (here a random draft: acceptance ~0, output
# still exact — tests/serving/test_speculative.py)
from tpp_mlir_tpu.serving import make_speculative_generate

dcfg = GptConfig(vocab=512, embed=128, heads=4, layers=1, mlp_ratio=2,
                 max_seq=128, dtype="f32")
draft = stack_params(init_params(dcfg, seed=7))
spec = make_speculative_generate(cfg, dcfg, steps=10, k=3)
stoks, stats = spec(params, draft, prompt[:1])
greedy = make_generate(cfg, steps=10, temperature=0.0)(
    params, prompt[:1], jax.random.PRNGKey(0))
print("speculative == target greedy:",
      bool((stoks == greedy).all()),
      f"(acceptance {int(stats['accepted'])}/{int(stats['drafted'])})")

# --- continuous batching: slot scheduler over the slotted decode step ---
# requests of different lengths flow through a fixed array of slots; a
# finished slot is immediately re-filled from the queue (no batch drain)
from tpp_mlir_tpu.serving import BatchingEngine, init_params as _init

uparams = _init(cfg, seed=0)      # hybrid layout: engine stacks for prefill
eng = BatchingEngine(uparams, cfg, slots=2, sync_steps=4,
                     buckets=(16, 32), seed=0)
rng = np.random.default_rng(1)
rids = [eng.submit(rng.integers(0, cfg.vocab, n), max_new=8)
        for n in (5, 20, 9, 31, 13)]
done = eng.run()
for rid in rids:
    print(f"continuous req {rid}: {done[rid]}")
