#!/usr/bin/env python
"""The functional op API: TPP kernels as plain JAX ops (jit-compatible)."""

import jax
import jax.numpy as jnp

from tpp_mlir_tpu import ops

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (256, 1024), jnp.bfloat16)
w = jax.random.normal(key, (1024, 1024), jnp.bfloat16)
b = jnp.zeros((1024,), jnp.bfloat16)

# one fused MXU kernel: relu(x @ w + b)
y = ops.fused_mlp_layer(x, w, b, activation="relu")
print("fused layer:", y.shape, y.dtype)

# batch-reduce GEMM (the TPP primitive)
a3 = jax.random.normal(key, (4, 256, 512), jnp.float32)
b3 = jax.random.normal(key, (4, 512, 1024), jnp.float32)
print("brgemm:", ops.brgemm(a3, b3).shape)

# differentiable fused layer (custom VJP over Pallas kernels)
from tpp_mlir_tpu.ops import trainable

def loss(w):
    return jnp.sum(trainable.mlp_layer(x.astype(jnp.float32),
                                       w, b.astype(jnp.float32)) ** 2)

g = jax.grad(loss)(w.astype(jnp.float32))
print("grad:", g.shape)
