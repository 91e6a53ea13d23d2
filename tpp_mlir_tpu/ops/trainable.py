"""Differentiable fused ops (custom VJP over Pallas kernels).

Pallas kernels are opaque to JAX autodiff, so the trainable surface defines
custom VJPs: forward is the fused MXU kernel; backward reuses the same GEMM
kernels (dx on the MXU via a transpose_b GEMM) plus XLA for the small
reductions. This is the standard TPU production-kernel pattern
(pallas_guide 'Patterns: Custom VJP').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import fused_mlp_layer, gemm


@jax.custom_vjp
def mlp_layer(x, w, b):
    """relu(x @ w + b) as one fused Pallas kernel, differentiable."""
    return fused_mlp_layer(x, w, b, activation="relu")


def _mlp_layer_fwd(x, w, b):
    out = fused_mlp_layer(x, w, b, activation="relu")
    return out, (x, w, out)


def _mlp_layer_bwd(res, g):
    x, w, out = res
    g = g * (out > 0).astype(g.dtype)       # relu' on VPU
    dx = gemm(g, w, transpose_b=True)       # [m,n] @ [k,n]^T on MXU
    dw = jnp.einsum("mk,mn->kn", x.astype(jnp.float32),
                    g.astype(jnp.float32)).astype(w.dtype)
    db = jnp.sum(g, axis=0).astype(w.dtype)
    return dx.astype(x.dtype), dw, db


mlp_layer.defvjp(_mlp_layer_fwd, _mlp_layer_bwd)


@jax.custom_vjp
def matmul(x, w):
    """x @ w (beta_0) as a Pallas kernel, differentiable."""
    return gemm(x, w)


def _matmul_fwd(x, w):
    return gemm(x, w), (x, w)


def _matmul_bwd(res, g):
    x, w = res
    dx = gemm(g, w, transpose_b=True)
    dw = jnp.einsum("mk,mn->kn", x.astype(jnp.float32),
                    g.astype(jnp.float32)).astype(w.dtype)
    return dx.astype(x.dtype), dw


matmul.defvjp(_matmul_fwd, _matmul_bwd)
