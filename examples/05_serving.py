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
