#!/usr/bin/env python
"""Torch transformer ingestion: stock nn.TransformerEncoderLayer -> five
fused kernels.

The pipeline turns LayerNorm -> MultiheadAttention -> residual ->
LayerNorm -> FFN -> residual into:

    QKV GEMM (merged, LayerNorm prologue in-kernel)
    attention (ONE [Q|K|V] packed operand, token layout)
    out-projection (residual rides the accumulator)
    fc1 (LayerNorm prologue + gelu epilogue)
    fc2 (residual accumulator)

— fusions across kernel boundaries that neither XLA nor the reference's
CombineXsmm (single-layer scope) perform. See docs/DESIGN.md and
tests/passes/test_transformer_fusion.py.
"""

import numpy as np
import torch

from tpp_mlir_tpu.frontend import import_torch
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.runtime import compile as tpp_compile

torch.manual_seed(0)
layer = torch.nn.TransformerEncoderLayer(
    d_model=256, nhead=4, dim_feedforward=1024, batch_first=True,
    norm_first=True, activation="gelu").eval()

module = import_torch(layer, (2, 64, 256))
run_pipeline(module, "default-tpp-passes")
print("=== lowered IR (five kernels) ===")
print(module)

x = torch.randn(2, 64, 256)
with torch.no_grad():
    want = layer(x).numpy()
import jax.numpy as jnp

got = np.asarray(tpp_compile(module, jit=True)(jnp.asarray(x.numpy())))
print("max |tpp - torch|:", float(np.max(np.abs(got - want))))
