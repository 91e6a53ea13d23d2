"""Functional op API + trainable custom-VJP tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu import ops
from tpp_mlir_tpu.ops import trainable


def rng(*shape, dtype=jnp.float32, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape,
                             jnp.float32).astype(dtype)


def test_ops_gemm_and_brgemm():
    a, b = rng(16, 64), rng(64, 128, seed=1)
    np.testing.assert_allclose(np.asarray(ops.gemm(a, b, interpret=True)),
                               np.asarray(a @ b), atol=1e-4, rtol=1e-5)
    a3, b3 = rng(3, 16, 64), rng(3, 64, 128, seed=1)
    np.testing.assert_allclose(
        np.asarray(ops.brgemm(a3, b3, interpret=True)),
        np.asarray(jnp.einsum("bmk,bkn->mn", a3, b3)),
        atol=1e-3, rtol=1e-4)


def test_ops_fused_layer_and_conv():
    x, w, b = rng(16, 64), rng(64, 128, seed=1), rng(128, seed=2)
    got = ops.fused_mlp_layer(x, w, b, interpret=True)
    want = jnp.maximum(x @ w + b, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)

    i = rng(1, 1, 10, 10, 128).reshape(1, 1, 10, 10, 128)
    wgt = rng(1, 1, 3, 3, 128, 128, seed=1) * 0.05
    got = ops.conv2d_brgemm(i, wgt, interpret=True)
    assert got.shape == (1, 1, 8, 8, 128)


def test_ops_vnni_pack_roundtrip():
    w = rng(8, 128, dtype=jnp.bfloat16)
    packed = ops.vnni_pack(w, 2)
    assert packed.shape == (4, 128, 2)
    # element (kv, n, v) == w[kv*2+v, n]
    np.testing.assert_array_equal(
        np.asarray(packed, np.float32)[2, 5, 1],
        np.asarray(w, np.float32)[5, 5])


def test_trainable_grads_match_jnp():
    """Custom VJP over Pallas kernels == autodiff of the jnp equivalent."""
    x, w, b = rng(8, 32), rng(32, 64, seed=1), rng(64, seed=2)

    def ours(x, w, b):
        return jnp.sum(trainable.mlp_layer(x, w, b) ** 2)

    def ref(x, w, b):
        return jnp.sum(jnp.maximum(x @ w + b, 0) ** 2)

    g1 = jax.grad(ours, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(ref, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-3, rtol=1e-3)


def test_perf_timer_ops_interpret():
    from tpp_mlir_tpu.ir import parse_module
    from tpp_mlir_tpu.runtime import interpret as tpp_interpret

    text = """func @entry(%x: tensor<8x128xf32>) {
  %t = perf.timer_start : tensor<i64>
  %0 = tl.relu %x : tensor<8x128xf32>
  %dt = perf.timer_stop %t : tensor<f32>
  perf.sink %0
  return %0 : tensor<8x128xf32>
}
"""
    m = parse_module(text)
    out = tpp_interpret(m, "entry", rng(8, 128))
    assert out[0].shape == (8, 128)


def test_roundtrip_new_ops():
    from tpp_mlir_tpu.ir import parse_module, print_module

    text = """module {
  func @entry(%q: tensor<2x64x32xf32>, %k: tensor<2x64x32xf32>, %v: tensor<2x64x32xf32>) -> tensor<2x64x32xf32> {
    %0 = tl.attention %q, %k, %v {causal = true, scale = 0.125} : tensor<2x64x32xf32>
    return %0 : tensor<2x64x32xf32>
  }
}
"""
    m = parse_module(text)
    m.verify()
    assert print_module(m) == text
