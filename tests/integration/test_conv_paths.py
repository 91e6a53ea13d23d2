"""Conv lowering paths added in round 2: 1x1-conv->matmul (reference
RewriteConvToMatmulImpl.cpp), NHWC-native conv-BRGEMM at any channel count,
and the sink-reshape canonicalization that lets epilogues fuse across the
1x1 rewrite's reshapes."""

import jax
import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.ir import parse_module, print_module
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.runtime import compile as tpp_compile


def rng(*shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def diff(text, args, atol=1e-3):
    ref = tpp_compile(parse_module(text), jit=False)(*args)
    low = parse_module(text)
    run_pipeline(low, "default-tpp-passes")
    got = tpp_compile(low, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=atol, rtol=1e-3)
    return low


CONV1X1_NHWC = """func @entry(%i: tensor<2x16x16x256xf32>, %w: tensor<1x1x256x256xf32>, %bias: tensor<256xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<2x16x16x256xf32>
  %1 = tl.conv2d_nhwc_hwcf %i, %w, %0 {strides = [1, 1]} : tensor<2x16x16x256xf32>
  %2 = tl.add %1, %bias : tensor<2x16x16x256xf32>
  %3 = tl.relu %2 : tensor<2x16x16x256xf32>
  return %3 : tensor<2x16x16x256xf32>
}
"""


def test_conv1x1_nhwc_becomes_fused_matmul():
    # W=16 is sublane-aligned: the flat reshape is free, so the 1x1 conv
    # rewrites to a pure fused GEMM
    args = (rng(2, 16, 16, 256), rng(1, 1, 256, 256, seed=1) * 0.05,
            rng(256, seed=2))
    low = diff(CONV1X1_NHWC, args)
    s = print_module(low)
    assert "conv" not in s                      # the conv is gone: pure GEMM
    assert "xsmm.fused_brgemm" in s             # bias+relu fused
    assert '"beta_0"' in s


def test_conv1x1_nhwc_unaligned_width_stays_native():
    # W=14: the flat reshape would be an HBM relayout; the 1x1 runs on the
    # NHWC-native kernel instead (one-tap fullrow GEMM, free reshapes)
    text = CONV1X1_NHWC.replace("16x16", "14x14")
    args = (rng(2, 14, 14, 256), rng(1, 1, 256, 256, seed=1) * 0.05,
            rng(256, seed=2))
    low = diff(text, args)
    s = print_module(low)
    assert 'layout = "conv_nhwc"' in s
    assert "tl.reshape" not in s


CONV1X1_NCHW = """func @entry(%i: tensor<2x256x14x14xf32>, %w: tensor<256x256x1x1xf32>, %bias: tensor<256xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<2x256x14x14xf32>
  %1 = tl.conv2d_nchw_fchw %i, %w, %0 {strides = [1, 1]} : tensor<2x256x14x14xf32>
  %b3 = tl.reshape %bias : tensor<256x1x1xf32>
  %2 = tl.add %1, %b3 : tensor<2x256x14x14xf32>
  %3 = tl.relu %2 : tensor<2x256x14x14xf32>
  return %3 : tensor<2x256x14x14xf32>
}
"""


def test_conv1x1_nchw_unaligned_width_rides_nhwc():
    args = (rng(2, 256, 14, 14), rng(256, 256, 1, 1, seed=1) * 0.05,
            rng(256, seed=2))
    low = diff(CONV1X1_NCHW, args)
    s = print_module(low)
    # W=14 is not 128-aligned, so the flat 1x1->matmul rewrite is gated off
    # and the conv rides the NHWC-native path with a fused relu epilogue.
    assert 'layout = "conv_nhwc"' in s
    assert '"relu"' in s


def test_conv1x1_strided_lowers_via_xla_strategy():
    text = """func @entry(%i: tensor<2x8x8x64xf32>, %w: tensor<1x1x64x64xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<2x4x4x64xf32>
  %1 = tl.conv2d_nhwc_hwcf %i, %w, %0 {strides = [2, 2]} : tensor<2x4x4x64xf32>
  return %1 : tensor<2x4x4x64xf32>
}
"""
    args = (rng(2, 8, 8, 64), rng(1, 1, 64, 64, seed=1) * 0.1)
    low = diff(text, args)
    s = print_module(low)
    # strided: lowers through the NHWC path whose xla strategy handles any
    # stride (and gains the fused epilogue the raw tl op could not)
    assert 'layout = "conv_nhwc"' in s
    assert "strides = [2, 2]" in s


def test_conv_nhwc_wide_channels_native():
    """C > 512 NHWC conv takes the native kernel (the round-1 version
    silently fell back to requiring NCHW packing)."""
    text = """func @entry(%i: tensor<1x6x6x1024xf32>, %w: tensor<3x3x1024x128xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<1x4x4x128xf32>
  %1 = tl.conv2d_nhwc_hwcf %i, %w, %0 {strides = [1, 1]} : tensor<1x4x4x128xf32>
  return %1 : tensor<1x4x4x128xf32>
}
"""
    args = (rng(1, 6, 6, 1024), rng(3, 3, 1024, 128, seed=1) * 0.02)
    low = diff(text, args)
    s = print_module(low)
    assert 'layout = "conv_nhwc"' in s
    assert "tl.pack" not in s and "tl.reshape" not in s


def test_conv_nhwc_residual_add_sinks_and_fuses():
    """Residual add of a 1x1-rewritten conv: sink-reshape merges the two
    reshape operands so the add stays in the GEMM domain."""
    text = """func @entry(%i: tensor<2x8x8x128xf32>, %w1: tensor<1x1x128x128xf32>, %w2: tensor<1x1x128x128xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<2x8x8x128xf32>
  %1 = tl.conv2d_nhwc_hwcf %i, %w1, %0 {strides = [1, 1]} : tensor<2x8x8x128xf32>
  %2 = tl.constant {init = "zero"} : tensor<2x8x8x128xf32>
  %3 = tl.conv2d_nhwc_hwcf %i, %w2, %2 {strides = [1, 1]} : tensor<2x8x8x128xf32>
  %4 = tl.add %1, %3 : tensor<2x8x8x128xf32>
  %5 = tl.relu %4 : tensor<2x8x8x128xf32>
  return %5 : tensor<2x8x8x128xf32>
}
"""
    args = (rng(2, 8, 8, 128), rng(1, 1, 128, 128, seed=1) * 0.05,
            rng(1, 1, 128, 128, seed=2) * 0.05)
    low = diff(text, args)
    s = print_module(low)
    # the residual add sank into the GEMM domain and was folded into the
    # second GEMM's accumulator; relu fused as the epilogue — no eltwise op
    # survives, and only operand/result reshapes remain
    assert "tl.add" not in s and "xsmm.binary" not in s
    assert "tl.relu" not in s and "xsmm.unary" not in s
    assert 'unary_kind = "relu"' in s


def test_conv1x1_bf16():
    text = CONV1X1_NHWC.replace("xf32", "xbf16")
    args = tuple(a.astype(jnp.bfloat16) for a in
                 (rng(2, 16, 16, 256), rng(1, 1, 256, 256, seed=1) * 0.05,
                  rng(256, seed=2)))
    diff(text, args, atol=0.1)


def test_convnet_model_nhwc_256ch():
    """The benchmark model family itself, NHWC 256ch (the shapes that ran
    at 12.7% in round 1), end to end vs reference semantics."""
    from tpp_mlir_tpu.models.convnet import ConvConfig, build_convnet

    cfg = ConvConfig(batch=2, channels=256, filters=256, height=16, width=16,
                     kernel=3, layout="nhwc", const_weights=False)
    m_ref = build_convnet(cfg)
    m_low = build_convnet(cfg)
    run_pipeline(m_low, "default-tpp-passes")
    args = (rng(2, 16, 16, 256), rng(3, 3, 256, 256, seed=1) * 0.02,
            rng(256, seed=2))
    ref = tpp_compile(m_ref, jit=False)(*args)
    got = tpp_compile(m_low, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-2, rtol=1e-3)


def test_pad_fuses_into_conv():
    """A zero-pad feeding a conv fuses into the conv dispatch (padding
    attr) — no tl.pad survives, saving its HBM round trip."""
    text = """func @entry(%x: tensor<2x8x8x32xf32>, %w: tensor<3x3x32x32xf32>) {
  %p = tl.pad %x {lo = [0, 1, 1, 0], hi = [0, 1, 1, 0]} : tensor<2x10x10x32xf32>
  %0 = tl.constant {init = "zero"} : tensor<2x8x8x32xf32>
  %1 = tl.conv2d_nhwc_hwcf %p, %w, %0 {strides = [1, 1]} : tensor<2x8x8x32xf32>
  return %1 : tensor<2x8x8x32xf32>
}
"""
    args = (rng(2, 8, 8, 32), rng(3, 3, 32, 32, seed=1) * 0.1)
    low = diff(text, args)
    s = print_module(low)
    assert "tl.pad" not in s
    assert "padding = [1, 1, 1, 1]" in s or "padding = (1, 1, 1, 1)" in s


def test_convnet_residual_same_padding_fuses():
    """The NHWC residual block model (same padding, residual add): bias
    rides the accumulator init (ConvInitSimplify absorbing the CSE-shared
    zero fill — the reference's DuplicateFill case), freeing the binary
    slot so the residual add + relu fuse into the second conv's epilogue.
    The whole block lowers to exactly two fused conv invokes."""
    from tpp_mlir_tpu.models.convnet import ConvConfig, build_convnet

    cfg = ConvConfig(batch=2, channels=64, filters=64, height=8, width=8,
                     kernel=3, layers=2, layout="nhwc", padding="same",
                     residual=True, const_weights=True)
    m_ref = build_convnet(cfg)
    m_low = build_convnet(cfg)
    run_pipeline(m_low, "default-tpp-passes")
    s = print_module(m_low)
    assert s.count("xsmm.fused_brgemm ") == 2
    assert "xsmm.binary" not in s and "xsmm.unary" not in s
    assert "tl.pad" not in s  # pad fused into the conv dispatches
    x = rng(2, 8, 8, 64)
    ref = tpp_compile(m_ref, jit=False)(x)
    got = tpp_compile(m_low, jit=False)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def diff_patchify(text, args, atol=1e-3):
    """Like diff() but with the opt-in patchify rewrite enabled (it is
    OFF by default: the same-run A/B measured it losing on the ViT
    rows — patchify_ab_r5.json, PERF.md)."""
    from tpp_mlir_tpu.passes.pass_manager import PassManager
    ref = tpp_compile(parse_module(text), jit=False)(*args)
    low = parse_module(text)
    PassManager().add("default-tpp-passes", patchify=True).run(low)
    got = tpp_compile(low, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=atol, rtol=1e-3)
    return low


def test_patchify_conv_nhwc_becomes_matmul():
    """stride == kernel (ViT patch embed): non-overlapping taps rewrite to
    reshape+transpose+GEMM (patchify-conv-to-matmul, opt-in)."""
    text = """func @entry(%i: tensor<2x16x16x3xf32>, %w: tensor<8x8x3x64xf32>, %bias: tensor<64xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<2x2x2x64xf32>
  %1 = tl.conv2d_nhwc_hwcf %i, %w, %0 {strides = [8, 8]} : tensor<2x2x2x64xf32>
  %2 = tl.add %1, %bias : tensor<2x2x2x64xf32>
  return %2 : tensor<2x2x2x64xf32>
}
"""
    args = (rng(2, 16, 16, 3), rng(8, 8, 3, 64, seed=1) * 0.05,
            rng(64, seed=2))
    low = diff_patchify(text, args)
    s = print_module(low)
    assert "conv" not in s                  # the conv is gone: pure GEMM
    assert "tl.matmul" in s or "brgemm" in s or "gemm" in s
    # and the DEFAULT pipeline keeps the conv (measured faster on v5e)
    dflt = diff(text, args)
    assert "conv" in print_module(dflt)


def test_patchify_conv_nchw_becomes_matmul():
    """NCHW patchify (the torch-importer layout in packed mode): same
    rewrite with a weight transpose + NCHW boundary transposes."""
    text = """func @entry(%i: tensor<2x3x8x8xf32>, %w: tensor<32x3x4x4xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<2x32x2x2xf32>
  %1 = tl.conv2d_nchw_fchw %i, %w, %0 {strides = [4, 4]} : tensor<2x32x2x2xf32>
  return %1 : tensor<2x32x2x2xf32>
}
"""
    args = (rng(2, 3, 8, 8), rng(32, 3, 4, 4, seed=1) * 0.1)
    low = diff_patchify(text, args)
    s = print_module(low)
    assert "conv" not in s


def test_patchify_gate_requires_exact_tiling():
    """stride == kernel but H % R != 0: the rewrite must NOT fire even
    when opted in (the conv drops the remainder rows; the reshape form
    would mis-shape)."""
    text = """func @entry(%i: tensor<2x10x10x3xf32>, %w: tensor<4x4x3x16xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<2x2x2x16xf32>
  %1 = tl.conv2d_nhwc_hwcf %i, %w, %0 {strides = [4, 4]} : tensor<2x2x2x16xf32>
  return %1 : tensor<2x2x2x16xf32>
}
"""
    args = (rng(2, 10, 10, 3), rng(4, 4, 3, 16, seed=1) * 0.1)
    low = diff_patchify(text, args)
    s = print_module(low)
    assert "conv" in s                       # stayed a conv (xla strategy)
