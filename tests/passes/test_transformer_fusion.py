"""fold-residual-acc + qkv-merge: the transformer-block fusion passes.

Reference provenance: FoldAddIntoDest.cpp (residual-into-accumulator, here
replayed at the xsmm level where the binary slot is already claimed by the
bias) and CombineXsmmPass.cpp extended in the Megatron fused-QKV direction
(three same-activation projections merge into one triple-width GEMM feeding
a qkv_packed attention invoke)."""

import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.ir import parse_module, print_module
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.runtime import compile as tpp_compile
from tpp_mlir_tpu.runtime import tensor_init


def _rng(*shape, seed=0, scale=1.0):
    return jnp.asarray(tensor_init("rand", shape, "f32", seed=seed)) * scale


RESIDUAL_GEMM = """func @entry(%x: tensor<64x128xf32>, %w: tensor<128x128xf32>, %b: tensor<128xf32>) {
  %0 = tl.constant {init = "zero", seed = 0} : tensor<64x128xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<64x128xf32>
  %2 = tl.add %1, %b : tensor<64x128xf32>
  %3 = tl.add %2, %x : tensor<64x128xf32>
  %4 = tl.relu %3 : tensor<64x128xf32>
  return %4 : tensor<64x128xf32>
}
"""


def test_fold_residual_acc_gemm():
    """gemm + bias + full-shape residual + relu lower to ONE fused_brgemm:
    the residual rides the accumulator (beta=1), bias stays bcast_col,
    relu is the fused unary."""
    ref = parse_module(RESIDUAL_GEMM)
    low = parse_module(RESIDUAL_GEMM)
    run_pipeline(low, "default-tpp-passes")
    s = print_module(low)
    assert s.count("xsmm.fused_brgemm ") == 1
    assert "xsmm.binary" not in s and "xsmm.unary" not in s
    assert '"beta_0"' not in s          # the residual IS the accumulator
    assert 'unary_kind = "relu"' in s
    args = (_rng(64, 128), _rng(128, 128, seed=1, scale=0.05),
            _rng(128, seed=2))
    r = tpp_compile(ref, jit=False)(*args)
    l = tpp_compile(low, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(l), np.asarray(r),
                               atol=1e-4, rtol=1e-4)


def test_fold_residual_acc_keeps_unary_barrier():
    """An activation BETWEEN the gemm and the residual add must NOT fold:
    relu(gemm+bias) + x is not (x + gemm) + bias under any epilogue
    order."""
    text = RESIDUAL_GEMM.replace(
        """  %2 = tl.add %1, %b : tensor<64x128xf32>
  %3 = tl.add %2, %x : tensor<64x128xf32>
  %4 = tl.relu %3 : tensor<64x128xf32>
  return %4 : tensor<64x128xf32>""",
        """  %2 = tl.add %1, %b : tensor<64x128xf32>
  %3 = tl.relu %2 : tensor<64x128xf32>
  %4 = tl.add %3, %x : tensor<64x128xf32>
  return %4 : tensor<64x128xf32>""")
    ref = parse_module(text)
    low = parse_module(text)
    run_pipeline(low, "default-tpp-passes")
    args = (_rng(64, 128), _rng(128, 128, seed=1, scale=0.05),
            _rng(128, seed=2))
    r = tpp_compile(ref, jit=False)(*args)
    l = tpp_compile(low, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(l), np.asarray(r),
                               atol=1e-4, rtol=1e-4)


def test_fold_residual_acc_plain_brgemm_keeps_unary():
    """A PLAIN brgemm (no bias -> not fused) behind a reshape, then a
    full-shape residual add + relu: the residual may fold into the
    accumulator, but the relu must NOT be absorbed into the dispatch —
    the plain-brgemm dispatch never reads unary_kind, so absorbing it
    would erase the activation without executing it (advisor r2 finding,
    to_xsmm.py FoldResidualAccPass)."""
    text = """func @entry(%a: tensor<4x64x32xf32>, %b: tensor<4x32x128xf32>, %r: tensor<2x32x128xf32>) {
  %z = tl.constant {init = "zero"} : tensor<64x128xf32>
  %0 = tl.brgemm %a, %b, %z : tensor<64x128xf32>
  %1 = tl.reshape %0 : tensor<2x32x128xf32>
  %2 = tl.add %1, %r : tensor<2x32x128xf32>
  %3 = tl.relu %2 : tensor<2x32x128xf32>
  return %3 : tensor<2x32x128xf32>
}
"""
    ref = parse_module(text)
    low = parse_module(text)
    run_pipeline(low, "default-tpp-passes")
    s = print_module(low)
    # the activation must survive somewhere executable: either as a
    # standalone unary or on a FUSED dispatch — never silently dropped
    if 'unary_kind = "relu"' in s:
        assert "fused_brgemm_dispatch" in s
    else:
        assert 'kind = "relu"' in s
    args = (_rng(4, 64, 32), _rng(4, 32, 128, seed=1, scale=0.05),
            _rng(2, 32, 128, seed=2))
    r = tpp_compile(ref, jit=False)(*args)
    l = tpp_compile(low, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(l), np.asarray(r),
                               atol=1e-4, rtol=1e-4)


def test_transformer_block_fuses_completely():
    """The imported torch transformer block lowers to exactly FIVE kernels:
    4 GEMMs (merged QKV with LN prologue + out-proj/residual + fc1 with LN
    prologue and gelu + fc2/residual) and one qkv_packed attention — no
    standalone LayerNorm or elementwise kernel survives."""
    from tpp_mlir_tpu.models.transformer_block import build_transformer_block

    ref = build_transformer_block(batch=2, seq=128, embed=256, heads=4)
    low = build_transformer_block(batch=2, seq=128, embed=256, heads=4)
    run_pipeline(low, "default-tpp-passes")
    s = print_module(low)
    assert s.count("xsmm.fused_brgemm ") == 4
    assert s.count('prologue = "layer_norm"') == 2
    assert s.count("xsmm.layer_norm ") == 0
    assert s.count("xsmm.attention ") == 1
    assert "qkv_packed = true" in s
    assert "xsmm.binary" not in s and "xsmm.unary" not in s
    x = _rng(2, 128, 256)
    r = tpp_compile(ref, jit=True)(x)
    l = tpp_compile(low, jit=True)(x)
    np.testing.assert_allclose(np.asarray(l), np.asarray(r),
                               atol=1e-4, rtol=1e-4)


def test_multilayer_encoder_fuses_per_layer():
    """A 2-layer stacked encoder fuses layer by layer — 4 GEMM invokes +
    1 packed attention per layer, dispatches CSE-shared across layers, no
    standalone LN/eltwise kernel anywhere. The cross-layer residual feeds
    the next layer's LN-prologue GEMM directly."""
    from tpp_mlir_tpu.models.transformer_block import build_transformer_block

    ref = build_transformer_block(batch=2, seq=128, embed=256, heads=4,
                                  layers=2)
    low = build_transformer_block(batch=2, seq=128, embed=256, heads=4,
                                  layers=2)
    run_pipeline(low, "default-tpp-passes")
    s = print_module(low)
    assert s.count("xsmm.fused_brgemm ") == 8
    assert s.count("xsmm.attention ") == 2
    assert s.count("xsmm.layer_norm ") == 0
    assert "xsmm.binary" not in s and "xsmm.unary" not in s
    x = jnp.asarray(tensor_init("rand", (2, 128, 256), "f32", seed=0))
    r = tpp_compile(ref, jit=True)(x)
    l = tpp_compile(low, jit=True)(x)
    np.testing.assert_allclose(np.asarray(l), np.asarray(r),
                               atol=1e-4, rtol=1e-4)


def test_qkv_merge_requires_constant_weights():
    """qkv-merge must NOT fire when the projection weights are function
    arguments (no compile-time concat is possible) — the attention stays in
    its 3-operand form and numerics still hold."""
    text = """func @entry(%x: tensor<2x128x64xf32>, %wq: tensor<64x64xf32>, %wk: tensor<64x64xf32>, %wv: tensor<64x64xf32>, %b: tensor<64xf32>) {
  %f = tl.reshape %x : tensor<256x64xf32>
  %z = tl.constant {init = "zero"} : tensor<256x64xf32>
  %q0 = tl.matmul %f, %wq, %z : tensor<256x64xf32>
  %q1 = tl.add %q0, %b : tensor<256x64xf32>
  %q = tl.reshape %q1 : tensor<2x128x64xf32>
  %k0 = tl.matmul %f, %wk, %z : tensor<256x64xf32>
  %k1 = tl.add %k0, %b : tensor<256x64xf32>
  %k = tl.reshape %k1 : tensor<2x128x64xf32>
  %v0 = tl.matmul %f, %wv, %z : tensor<256x64xf32>
  %v1 = tl.add %v0, %b : tensor<256x64xf32>
  %v = tl.reshape %v1 : tensor<2x128x64xf32>
  %a = tl.attention %q, %k, %v {scale = 0.125, heads = 1} : tensor<2x128x64xf32>
  return %a : tensor<2x128x64xf32>
}
"""
    ref = parse_module(text)
    low = parse_module(text)
    run_pipeline(low, "default-tpp-passes")
    s = print_module(low)
    assert "qkv_packed" not in s
    args = (_rng(2, 128, 64), _rng(64, 64, seed=1, scale=0.05),
            _rng(64, 64, seed=2, scale=0.05),
            _rng(64, 64, seed=3, scale=0.05), _rng(64, seed=4, scale=0.1))
    r = tpp_compile(ref, jit=False)(*args)
    l = tpp_compile(low, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(l), np.asarray(r),
                               atol=1e-4, rtol=1e-4)


def test_xla_delegated_attention_causal():
    """The D<128 XLA-composed attention path handles causal masking —
    differential vs the reference attention semantics."""
    text = """func @entry(%q: tensor<2x128x128xf32>, %k: tensor<2x128x128xf32>, %v: tensor<2x128x128xf32>) {
  %a = tl.attention %q, %k, %v {scale = 0.0883883, heads = 2, causal = true} : tensor<2x128x128xf32>
  return %a : tensor<2x128x128xf32>
}
"""
    ref = parse_module(text)
    low = parse_module(text)
    run_pipeline(low, "default-tpp-passes")
    args = (_rng(2, 128, 128), _rng(2, 128, 128, seed=1),
            _rng(2, 128, 128, seed=2))
    r = tpp_compile(ref, jit=False)(*args)   # interpret-mode reference
    l = tpp_compile(low, jit=True)(*args)    # compiled: D=64 -> XLA path
    np.testing.assert_allclose(np.asarray(l), np.asarray(r),
                               atol=1e-4, rtol=1e-4)
