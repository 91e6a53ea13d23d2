"""Whole-chain fused kernel tests (chain-fusion pass + ChainKey kernel)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.xsmm import build_kernel, reference_kernel
from tpp_mlir_tpu.xsmm.flags import ChainKey


def rng(*shape, dtype=jnp.float32, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape,
                             jnp.float32).astype(dtype)


def test_chain_kernel_matches_reference():
    key = ChainKey(m=32, dims=(64, 128, 64), dtype="f32")
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    x = rng(32, 64)
    wb = (rng(64, 128, seed=1), rng(128, seed=2),
          rng(128, 64, seed=3), rng(64, seed=4))
    np.testing.assert_allclose(np.asarray(kfn(x, *wb), np.float32),
                               np.asarray(rfn(x, *wb), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_chain_kernel_no_bias_gelu():
    key = ChainKey(m=16, dims=(32, 64, 32), dtype="f32", has_bias=False,
                   unary_kind="gelu", last_unary=None)
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    x = rng(16, 32)
    wb = (rng(32, 64, seed=1), rng(64, 32, seed=2))
    np.testing.assert_allclose(np.asarray(kfn(x, *wb), np.float32),
                               np.asarray(rfn(x, *wb), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_chain_kernel_bf16_multiblock_m():
    key = ChainKey(m=64, dims=(128, 128, 128), dtype="bf16",
                   out_dtype="f32", bm=32)
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    x = rng(64, 128, dtype=jnp.bfloat16)
    wb = (rng(128, 128, seed=1, dtype=jnp.bfloat16),
          rng(128, seed=2, dtype=jnp.bfloat16),
          rng(128, 128, seed=3, dtype=jnp.bfloat16),
          rng(128, seed=4, dtype=jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(kfn(x, *wb), np.float32),
                               np.asarray(rfn(x, *wb), np.float32),
                               atol=0.15, rtol=0.05)


def test_chain_vmem_gate():
    from tpp_mlir_tpu.xsmm.kernels import chain_fits_vmem

    small = ChainKey(m=32, dims=(128, 128), dtype="f32")
    assert chain_fits_vmem(small)
    huge = ChainKey(m=32, dims=(8192, 8192, 8192), dtype="f32")
    assert not chain_fits_vmem(huge)


def test_chain_fusion_pass_requires_uniform_bias():
    """Mixed bias/no-bias layers must not chain."""
    from tpp_mlir_tpu.ir import parse_module
    from tpp_mlir_tpu.passes import run_pipeline

    text = """func @entry(%x: tensor<16x64xf32>, %w0: tensor<64x64xf32>, %b0: tensor<64xf32>, %w1: tensor<64x64xf32>) {
  %z = tl.constant {init = "zero"} : tensor<16x64xf32>
  %1 = tl.matmul %x, %w0, %z : tensor<16x64xf32>
  %2 = tl.add %1, %b0 : tensor<16x64xf32>
  %3 = tl.relu %2 : tensor<16x64xf32>
  %4 = tl.matmul %3, %w1, %z : tensor<16x64xf32>
  %5 = tl.relu %4 : tensor<16x64xf32>
  return %5 : tensor<16x64xf32>
}
"""
    m = parse_module(text)
    run_pipeline(m, "default-tpp-passes-flat")
    assert "xsmm.fused_chain" not in str(m)


def test_chain_bench_repeats():
    """In-kernel perf.bench region: repeats applications == repeated calls."""
    key = ChainKey(m=16, dims=(64, 64, 64), dtype="f32", repeats=4)
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    x = rng(16, 64)
    wb = (rng(64, 64, seed=1) * 0.2, rng(64, seed=2) * 0.1,
          rng(64, 64, seed=3) * 0.2, rng(64, seed=4) * 0.1)
    np.testing.assert_allclose(np.asarray(kfn(x, *wb), np.float32),
                               np.asarray(rfn(x, *wb), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_pingpong_bench_matches_reference_sequence():
    """ChainKey.pingpong (non-square fc warm bench): the output is the state
    after the LAST forward step of the fwd/back sequence — every repeat has
    a hard data dependency on the previous one."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.xsmm import build_kernel
    from tpp_mlir_tpu.xsmm.flags import ChainKey

    key = ChainKey(m=32, dims=(64, 128), dtype="f32", has_bias=True,
                   unary_kind="relu", last_unary="relu", pingpong=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 128), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (128,), jnp.float32)
    R = 4
    h = np.asarray(x)
    hn = None
    for r in range(R - 1 if (R - 1) % 2 == 0 else R - 2 + 1):
        if r % 2 == 0:
            hn = np.maximum(h @ np.asarray(w) + np.asarray(b), 0)
        else:
            h = hn @ np.asarray(w).T
    fn = build_kernel(dataclasses.replace(key, repeats=R), interpret=True)
    got = np.asarray(fn(x, w, b), np.float32)
    np.testing.assert_allclose(got, hn, atol=1e-3, rtol=1e-3)


def test_extract_bench_kernel_nonsquare_fc_pingpong():
    """Non-square fc programs now qualify for warm extraction via the
    ping-pong mode instead of falling back to the streaming scan."""
    from tpp_mlir_tpu.ir import parse_module
    from tpp_mlir_tpu.passes import run_pipeline
    from tpp_mlir_tpu.runtime.executor import extract_bench_kernel
    from tpp_mlir_tpu.tools.mlir_gen import (build_parser, config_from_args,
                                             generate_text)

    text = generate_text(config_from_args(build_parser().parse_args(
        "--batch=64 --layers=128,256 --bias --relu".split())))
    m = parse_module(text)
    run_pipeline(m, "default-tpp-passes")
    hit = extract_bench_kernel(m)
    assert hit is not None
    key, _ = hit
    assert key.pingpong and key.dims == (128, 256)
