#!/usr/bin/env python
"""Distributed training over a device mesh: optax optimizers, gradient
accumulation, ZeRO-1 sharded optimizer state, and the GPT-family train
step that shares its parameter layout with the serving engine.

Runs on whatever devices exist (force a CPU mesh with
JAX_PLATFORMS=cpu + jax.config jax_num_cpu_devices, as tests do).
"""

import jax

if len(jax.devices()) < 2:                 # pragma: no cover
    print(f"single device ({jax.devices()[0].platform}); dp=1 tp=1 mesh")

import jax.numpy as jnp
import numpy as np
import optax

from tpp_mlir_tpu.parallel import (make_gpt_train_step, make_mesh,
                                   make_optim_train_step, mlp_init)

n = len(jax.devices())
mesh = make_mesh({"dp": max(1, n // 2), "tp": min(2, n)})

# --- MLP chain: adamw + gradient accumulation + ZeRO-1 -------------------
layers = (256, 512, 256, 256)
params = mlp_init(layers, seed=0)
step, init_state = make_optim_train_step(
    mesh, layers, optax.adamw(1e-3), accum_steps=4, zero1=True)
state = init_state(params)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(32 * mesh.shape["dp"], layers[0])),
                jnp.float32)
y = jnp.asarray(rng.normal(size=(32 * mesh.shape["dp"], layers[-1])),
                jnp.float32)
for i in range(5):
    params, state, loss = step(params, state, x, y)
    print(f"mlp step {i}: loss {float(loss):.4f}")

# ZeRO-1: adam moments are physically split over dp
mu0 = state[0].mu[0][0]
print(f"zero1 moment shard: {mu0.addressable_shards[0].data.size} of "
      f"{mu0.size} elements on device 0")

# --- GPT family: train under the SERVING param layout --------------------
# (decode_param_specs: one checkpoint trains with dp x tp Megatron
# sharding and serves with the tp decode step, no re-layout)
from tpp_mlir_tpu.serving import GptConfig, init_params, stack_params

cfg = GptConfig(vocab=512, embed=128, heads=4, layers=2, mlp_ratio=4,
                max_seq=64, dtype="f32")
gparams = stack_params(init_params(cfg, seed=1))
gstep, ginit = make_gpt_train_step(mesh, cfg, optax.adamw(1e-3, eps=1e-4))
gstate = ginit(gparams)
ids = jnp.asarray(rng.integers(0, cfg.vocab, (4 * mesh.shape["dp"], 48)),
                  jnp.int32)
for i in range(5):
    gparams, gstate, loss = gstep(gparams, gstate, ids)
    print(f"gpt step {i}: next-token CE {float(loss):.4f}")

# --- LoRA / QLoRA: parameter-efficient fine-tuning ------------------------
# (serving/lora.py: frozen base — float or int8 QTensor — plus rank-r
# adapters; only O(r*(in+out)) params get gradients and optimizer state)
from tpp_mlir_tpu.serving import (lora_init, make_lora_train_step,
                                  make_prefill, merge_lora, quantize_params)

qbase = stack_params(quantize_params(init_params(cfg, seed=1)))  # int8 base
adapters = lora_init(qbase, rank=8, targets=("wq", "wv"))
lstep, linit = make_lora_train_step(cfg, optax.adam(3e-3), use_pallas=False)
lstate = linit(adapters)
for i in range(5):
    adapters, lstate, loss = lstep(qbase, adapters, lstate, ids)
    print(f"qlora step {i}: next-token CE {float(loss):.4f}")
merged = merge_lora(qbase, adapters)   # bake deltas in -> float params
logits, _ = make_prefill(cfg, use_pallas=False)(merged, ids)
print(f"merged model serves: logits {logits.shape}")
