"""Integration: compile IR through the default pipeline and compare against
the un-lowered reference execution (the reference's xsmm-vs-loops
differential tests, test/Integration/*, SURVEY.md section 4)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.ir import parse_module
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.runtime import compile as tpp_compile
from tpp_mlir_tpu.runtime import interpret as tpp_interpret


def rng(*shape, dtype=jnp.float32, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape,
                             jnp.float32).astype(dtype)


def diff_run(text, args, pipeline=("default-tpp-passes",),
             atol=1e-4, rtol=1e-4):
    ref_mod = parse_module(text)
    ref_fn = tpp_compile(ref_mod, jit=False)
    want = ref_fn(*args)

    low_mod = parse_module(text)
    run_pipeline(low_mod, *pipeline)
    got = tpp_compile(low_mod, jit=False)(*args)

    w = want if isinstance(want, tuple) else (want,)
    g = got if isinstance(got, tuple) else (got,)
    for gi, wi in zip(g, w):
        np.testing.assert_allclose(np.asarray(gi, np.float32),
                                   np.asarray(wi, np.float32),
                                   atol=atol, rtol=rtol)
    return low_mod


MLP1 = """func @entry(%x: tensor<32x256xf32>, %w: tensor<256x256xf32>, %bias: tensor<256xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<32x256xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<32x256xf32>
  %2 = tl.add %1, %bias : tensor<32x256xf32>
  %3 = tl.relu %2 : tensor<32x256xf32>
  return %3 : tensor<32x256xf32>
}
"""


def test_mlp_layer_fp32():
    args = (rng(32, 256), rng(256, 256, seed=1), rng(256, seed=2))
    m = diff_run(MLP1, args)
    s = str(m)
    assert "xsmm.fused_brgemm" in s


def test_mlp_3layer_const_weights():
    text = """func @entry(%x: tensor<32x256xf32>) {
  %w1 = tl.constant {init = "rand", seed = 1} : tensor<256x256xf32>
  %w2 = tl.constant {init = "rand", seed = 2} : tensor<256x256xf32>
  %b1 = tl.constant {init = "normal", seed = 3} : tensor<256xf32>
  %b2 = tl.constant {init = "normal", seed = 4} : tensor<256xf32>
  %z1 = tl.constant {init = "zero"} : tensor<32x256xf32>
  %z2 = tl.constant {init = "zero"} : tensor<32x256xf32>
  %1 = tl.matmul %x, %w1, %z1 : tensor<32x256xf32>
  %2 = tl.add %1, %b1 : tensor<32x256xf32>
  %3 = tl.relu %2 : tensor<32x256xf32>
  %4 = tl.matmul %3, %w2, %z2 : tensor<32x256xf32>
  %5 = tl.add %4, %b2 : tensor<32x256xf32>
  %6 = tl.relu %5 : tensor<32x256xf32>
  return %6 : tensor<32x256xf32>
}
"""
    args = (rng(32, 256),)
    m = diff_run(text, args)
    # the two layers fuse into a single whole-chain kernel (these shapes are
    # single-tile, so the flat path + chain-fusion applies)
    s = str(m)
    assert s.count("xsmm.fused_chain %") == 1


def test_mlp_bf16_vnni():
    text = MLP1.replace("xf32", "xbf16")
    args = (rng(32, 256, dtype=jnp.bfloat16),
            rng(256, 256, seed=1, dtype=jnp.bfloat16),
            rng(256, seed=2, dtype=jnp.bfloat16))
    m = diff_run(text, args, atol=0.1, rtol=0.05,
                 pipeline=("default-tpp-passes-packed",))
    assert "vnni" in str(m)


def test_softmax_mlp():
    text = """func @entry(%x: tensor<32x128xf32>, %w: tensor<128x128xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<32x128xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<32x128xf32>
  %2 = tl.softmax %1 {axis = 1} : tensor<32x128xf32>
  return %2 : tensor<32x128xf32>
}
"""
    args = (rng(32, 128), rng(128, 128, seed=1))
    diff_run(text, args)


def test_conv2d_brgemm_fp32():
    text = """func @entry(%i: tensor<2x128x10x10xf32>, %w: tensor<128x128x3x3xf32>, %bias: tensor<128xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<2x128x8x8xf32>
  %1 = tl.conv2d_nchw_fchw %i, %w, %0 {strides = [1, 1]} : tensor<2x128x8x8xf32>
  %2 = tl.reshape %bias : tensor<128x1x1xf32>
  %3 = tl.add %1, %2 : tensor<2x128x8x8xf32>
  %4 = tl.relu %3 : tensor<2x128x8x8xf32>
  return %4 : tensor<2x128x8x8xf32>
}
"""
    args = (rng(2, 128, 10, 10), rng(128, 128, 3, 3, seed=1),
            rng(128, seed=2))
    m = diff_run(text, args, atol=5e-4, rtol=5e-4)
    # NCHW convs ride the NHWC-native path (conv-to-nhwc + sink-transpose).
    assert 'layout = "conv_nhwc"' in str(m)


def test_conv2d_1x1():
    text = """func @entry(%i: tensor<2x128x8x8xf32>, %w: tensor<256x128x1x1xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<2x256x8x8xf32>
  %1 = tl.conv2d_nchw_fchw %i, %w, %0 {strides = [1, 1]} : tensor<2x256x8x8xf32>
  return %1 : tensor<2x256x8x8xf32>
}
"""
    args = (rng(2, 128, 8, 8), rng(256, 128, 1, 1, seed=1))
    diff_run(text, args, atol=5e-4, rtol=5e-4)


def test_brgemm_flat():
    text = """func @entry(%a: tensor<4x32x128xf32>, %b: tensor<4x128x128xf32>, %c: tensor<32x128xf32>) {
  %0 = tl.brgemm %a, %b, %c : tensor<32x128xf32>
  return %0 : tensor<32x128xf32>
}
"""
    args = (rng(4, 32, 128), rng(4, 128, 128, seed=1), rng(32, 128, seed=2))
    diff_run(text, args)


def test_check_ops_interpret():
    text = """func @entry(%x: tensor<8x128xf32>) {
  %0 = tl.relu %x : tensor<8x128xf32>
  %1 = tl.relu %x : tensor<8x128xf32>
  check.expect_almost_eq %0, %1 {threshold = 1e-06}
  check.expect_sane %0
  return %0 : tensor<8x128xf32>
}
"""
    m = parse_module(text)
    out = tpp_interpret(m, "entry", rng(8, 128))
    assert out[0].shape == (8, 128)

    bad = """func @entry(%x: tensor<8x128xf32>) {
  %0 = tl.relu %x : tensor<8x128xf32>
  %1 = tl.exp %x : tensor<8x128xf32>
  check.expect_almost_eq %0, %1 {threshold = 1e-06}
  return %0 : tensor<8x128xf32>
}
"""
    with pytest.raises(AssertionError, match="almost_eq"):
        tpp_interpret(parse_module(bad), "entry", rng(8, 128))


def test_jit_compile_path():
    m = parse_module(MLP1)
    run_pipeline(m, "default-tpp-passes")
    fn = tpp_compile(m, interpret_kernels=True)  # jit + interpret pallas
    args = (rng(32, 256), rng(256, 256, seed=1), rng(256, seed=2))
    out = fn(*args)
    ref = tpp_compile(parse_module(MLP1), jit=False)(*args)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-4, rtol=1e-4)


def test_conv2d_nhwc_relayout_free():
    """NHWC conv lowers to the NHWC-native conv-BRGEMM kernel: the channel
    blocking lives only in BlockSpec index space (zero relayout, not even a
    reshape), with the bias+relu fused as a BETA_0 epilogue."""
    text = """func @entry(%i: tensor<2x10x10x128xf32>, %w: tensor<3x3x128x128xf32>, %bias: tensor<128xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<2x8x8x128xf32>
  %1 = tl.conv2d_nhwc_hwcf %i, %w, %0 {strides = [1, 1]} : tensor<2x8x8x128xf32>
  %2 = tl.add %1, %bias : tensor<2x8x8x128xf32>
  %3 = tl.relu %2 : tensor<2x8x8x128xf32>
  return %3 : tensor<2x8x8x128xf32>
}
"""
    args = (rng(2, 10, 10, 128), rng(3, 3, 128, 128, seed=1) * 0.05,
            rng(128, seed=2))
    m = diff_run(text, args, atol=1e-3, rtol=1e-3)
    s = str(m)
    assert 'layout = "conv_nhwc"' in s
    assert '"beta_0"' in s and 'binary_kind = "add"' in s
    assert "tl.pack" not in s and "tl.transpose" not in s
    assert "tl.reshape" not in s  # truly relayout-free: not even reshapes


def test_check_ops_compiled_mode():
    """check.* lower INTO the compiled (jit) program as status tensors and
    are enforced on the host — the compiled artifact asserts itself
    (reference ConvertCheckToLoops.cpp:1-191). The failing case proves the
    check actually runs: a wrong kernel makes the compiled call raise."""
    good = """func @entry(%x: tensor<8x128xf32>) {
  %0 = tl.relu %x : tensor<8x128xf32>
  %1 = tl.relu %x : tensor<8x128xf32>
  check.expect_almost_eq %0, %1 {threshold = 1e-06}
  check.expect_sane %0
  return %0 : tensor<8x128xf32>
}
"""
    m = parse_module(good)
    run_pipeline(m, "default-tpp-passes")
    fn = tpp_compile(m, interpret_kernels=True)   # jit=True
    out = fn(rng(8, 128))
    assert out.shape == (8, 128)

    bad = """func @entry(%x: tensor<8x128xf32>) {
  %0 = tl.relu %x : tensor<8x128xf32>
  %1 = tl.exp %x : tensor<8x128xf32>
  check.expect_almost_eq %0, %1 {threshold = 1e-06}
  return %0 : tensor<8x128xf32>
}
"""
    mb = parse_module(bad)
    run_pipeline(mb, "default-tpp-passes")
    fnb = tpp_compile(mb, interpret_kernels=True)
    with pytest.raises(AssertionError, match="almost_eq"):
        fnb(rng(8, 128))

    nan = """func @entry(%x: tensor<8x128xf32>) {
  %0 = tl.div %x, %x : tensor<8x128xf32>
  check.expect_sane %0
  return %0 : tensor<8x128xf32>
}
"""
    mn = parse_module(nan)
    fnn = tpp_compile(mn, interpret_kernels=True)
    with pytest.raises(AssertionError, match="expect_sane"):
        fnn(jnp.zeros((8, 128), jnp.float32))
