"""Tests for split-reduction-dim, batch-matmul lowering, tiles plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.ir import parse_module, print_module
from tpp_mlir_tpu.passes import PassManager, make_pass, run_pipeline
from tpp_mlir_tpu.runtime import compile as tpp_compile


def rng(*shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def test_split_reduction_dim():
    text = """func @entry(%a: tensor<64x512xf32>, %b: tensor<512x128xf32>, %c: tensor<64x128xf32>) {
  %0 = tl.matmul %a, %b, %c : tensor<64x128xf32>
  return %0 : tensor<64x128xf32>
}
"""
    m = parse_module(text)
    PassManager([make_pass("split-reduction-dim", tile=128)]).run(m)
    s = print_module(m)
    assert "tl.brgemm" in s and "tl.matmul" not in s
    assert "tensor<4x64x128xf32>" in s  # A' [B, M, kb]

    args = (rng(64, 512), rng(512, 128, seed=1), rng(64, 128, seed=2))
    got = tpp_compile(m, jit=False)(*args)
    want = args[0] @ args[1] + args[2]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-3, rtol=1e-4)


def test_batch_matmul_lowering_and_exec():
    text = """func @entry(%a: tensor<8x32x128xf32>, %b: tensor<8x128x128xf32>) {
  %c = tl.constant {init = "zero"} : tensor<8x32x128xf32>
  %0 = tl.batch_matmul %a, %b, %c : tensor<8x32x128xf32>
  return %0 : tensor<8x32x128xf32>
}
"""
    m = parse_module(text)
    run_pipeline(m, "default-tpp-passes")
    s = str(m)
    assert "xsmm.batch_gemm" in s
    assert '"beta_0"' in s

    args = (rng(8, 32, 128), rng(8, 128, 128, seed=1))
    got = tpp_compile(m, jit=False, interpret_kernels=True)(*args)
    want = jnp.einsum("bmk,bkn->bmn", *args)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-4, rtol=1e-4)


def test_gemm_chain_without_epilogue_chains():
    """Bare GEMM chains (no bias/relu) also fuse into one kernel."""
    text = """func @entry(%x: tensor<32x128xf32>) {
  %w1 = tl.constant {init = "rand", seed = 1} : tensor<128x128xf32>
  %w2 = tl.constant {init = "rand", seed = 2} : tensor<128x128xf32>
  %z = tl.constant {init = "zero"} : tensor<32x128xf32>
  %1 = tl.matmul %x, %w1, %z : tensor<32x128xf32>
  %2 = tl.matmul %1, %w2, %z : tensor<32x128xf32>
  return %2 : tensor<32x128xf32>
}
"""
    m = parse_module(text)
    ref = tpp_compile(parse_module(text), jit=False)
    x = rng(32, 128)
    want = ref(x)
    run_pipeline(m, "default-tpp-passes")
    assert "xsmm.fused_chain" in str(m)
    got = tpp_compile(m, jit=False)(x)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-4, rtol=1e-4)


def test_gen_tiles_attr_reaches_pack():
    from tpp_mlir_tpu.models.mlp import MlpConfig, build_mlp

    cfg = MlpConfig(batch=256, layers=(512, 512), tiles=(128, 128, 128),
                    kernel="args")
    m = build_mlp(cfg)
    run_pipeline(m, "default-tpp-passes-packed")
    s = str(m)
    # blocked shapes reflect the 128^3 tile request, not target defaults
    assert "Mb = 2" in s and "Nb = 4" in s


def test_lower_packs_decomposition():
    """lower-packs: pack/unpack decompose to reshape+transpose
    (reference LowerPacksAndUnpacks.cpp) with identical semantics."""
    text = """func @entry(%a: tensor<64x96xf32>) {
  %0 = tl.pack %a {inner_dims = [0, 1], inner_tiles = [16, 32], outer_perm = [1, 0]} : tensor<3x4x16x32xf32>
  %1 = tl.unpack %0 {inner_dims = [0, 1], inner_tiles = [16, 32], outer_perm = [1, 0]} : tensor<64x96xf32>
  return %1 : tensor<64x96xf32>
}
"""
    m_ref = parse_module(text)
    x = rng(64, 96)
    want = tpp_compile(m_ref, jit=False)(x)

    m = parse_module(text)
    PassManager([make_pass("lower-packs")]).run(m)
    s = print_module(m)
    assert "tl.pack" not in s and "tl.unpack" not in s
    assert "tl.transpose" in s and "tl.reshape" in s
    got = tpp_compile(m, jit=False)(x)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_pipeline_idempotent():
    """Running the default pipeline twice is safe and stable (fixpoint)."""
    from tpp_mlir_tpu.models.mlp import MlpConfig, build_mlp

    m = build_mlp(MlpConfig(batch=16, layers=(64, 64, 64), bias=True,
                            relu=True, kernel="args"))
    run_pipeline(m, "default-tpp-passes")
    first = print_module(m)
    run_pipeline(m, "default-tpp-passes")
    assert print_module(m) == first
