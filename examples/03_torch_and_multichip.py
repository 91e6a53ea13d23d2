#!/usr/bin/env python
"""Import a torch model; train an MLP dp x tp over a device mesh."""

import jax
import jax.numpy as jnp
import torch

from tpp_mlir_tpu.frontend import import_torch
from tpp_mlir_tpu.parallel import make_mesh, make_train_step, mlp_init
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.runtime import compile

# --- torch import (the torch-dynamo ingestion equivalent) ---
model = torch.nn.Sequential(
    torch.nn.Linear(256, 512), torch.nn.ReLU(),
    torch.nn.Linear(512, 256), torch.nn.ReLU(),
)
module = import_torch(model, (32, 256))
run_pipeline(module, "default-tpp-passes")
fn = compile(module)
print("torch import:", fn(jnp.zeros((32, 256))).shape)

# --- sharded training step (dp x tp over whatever devices exist) ---
n = len(jax.devices())
mesh = make_mesh({"dp": max(1, n // 2), "tp": 2 if n >= 2 else 1})
layers = (256, 512, 256)
params = mlp_init(layers)
step = make_train_step(mesh, layers, lr=1e-2)
x = jax.random.normal(jax.random.PRNGKey(0), (64, 256))
y = jax.random.normal(jax.random.PRNGKey(1), (64, 256))
params, loss = step(params, x, y)
print("train step loss:", float(loss))
