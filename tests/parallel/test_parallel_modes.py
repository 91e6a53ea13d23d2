"""Differential tests for the pp/sp/ep parallelism modes on the
8-virtual-device CPU mesh: each sharded forward must match its unsharded
oracle (allclose, not just finiteness — the dryrun standard)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.parallel import (make_mesh, make_moe_forward,
                                   make_pipeline_forward,
                                   make_ring_attention, moe_init,
                                   moe_reference, pipeline_init,
                                   pipeline_reference,
                                   ring_attention_reference)


# ---------------------------------------------------------------- pipeline

@pytest.mark.parametrize("n_micro", [4, 8, 5])
def test_pipeline_matches_reference(n_micro):
    mesh = make_mesh({"pp": 4})
    d, mb = 32, 8
    params = pipeline_init(d, n_stages=4, seed=0)
    fwd = make_pipeline_forward(mesh, d, use_pallas=False)
    xs = jax.random.normal(jax.random.PRNGKey(1), (n_micro, mb, d),
                           jnp.float32)
    got = fwd(params, xs)
    want = pipeline_reference(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_8_stages():
    mesh = make_mesh({"pp": 8})
    d = 16
    params = pipeline_init(d, n_stages=8, seed=2)
    fwd = make_pipeline_forward(mesh, d, use_pallas=False)
    xs = jax.random.normal(jax.random.PRNGKey(3), (8, 4, d), jnp.float32)
    got = fwd(params, xs)
    want = pipeline_reference(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_pallas_interpret():
    """The per-stage layer runs the real fused-BRGEMM kernel (interpret
    mode on CPU) and still matches the jnp oracle."""
    mesh = make_mesh({"pp": 2})
    d, mb = 128, 128
    params = pipeline_init(d, n_stages=2, seed=4)
    fwd = make_pipeline_forward(mesh, d, use_pallas=True)
    xs = jax.random.normal(jax.random.PRNGKey(5), (4, mb, d), jnp.float32)
    got = fwd(params, xs)
    want = pipeline_reference(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


# -------------------------------------------------------------------- moe

@pytest.mark.parametrize("n_experts", [8, 16])
def test_moe_matches_reference(n_experts):
    mesh = make_mesh({"ep": 8})
    d_model, d_ff, tokens = 32, 64, 64
    params = moe_init(d_model, d_ff, n_experts, seed=0)
    fwd = make_moe_forward(mesh, d_model, d_ff, n_experts)
    x = jax.random.normal(jax.random.PRNGKey(1), (tokens, d_model),
                          jnp.float32)
    got = fwd(params, x)
    # sharded capacity defaults to the LOCAL token count (lossless when
    # routing is per-device); the fair oracle is the lossless global one
    want = moe_reference(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_moe_capacity_drops_tokens():
    """With capacity 1 per expert most tokens are dropped (output zero for
    them) — shapes stay static and nothing NaNs."""
    mesh = make_mesh({"ep": 4})
    d_model, d_ff, n_experts, tokens = 16, 32, 4, 32
    params = moe_init(d_model, d_ff, n_experts, seed=2)
    fwd = make_moe_forward(mesh, d_model, d_ff, n_experts, capacity=1)
    x = jax.random.normal(jax.random.PRNGKey(3), (tokens, d_model),
                          jnp.float32)
    got = np.asarray(fwd(params, x))
    assert np.isfinite(got).all()
    # some rows must be exactly zero (dropped tokens)
    assert (np.abs(got).sum(axis=1) == 0).any()


def test_moe_bf16():
    mesh = make_mesh({"ep": 8})
    d_model, d_ff, n_experts, tokens = 32, 64, 8, 64
    params = moe_init(d_model, d_ff, n_experts, dtype="bfloat16", seed=4)
    fwd = make_moe_forward(mesh, d_model, d_ff, n_experts)
    x = jax.random.normal(jax.random.PRNGKey(5), (tokens, d_model)
                          ).astype(jnp.bfloat16)
    got = fwd(params, x)
    want = moe_reference(params, x)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


# ------------------------------------------------------------ ring attention

@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_reference(causal):
    mesh = make_mesh({"sp": 8})
    b, s, h, d = 2, 64, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)
    attn = make_ring_attention(mesh, heads=h, causal=causal)
    got = attn(q, k, v)
    want = ring_attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_ring_attention_bf16():
    mesh = make_mesh({"sp": 4})
    b, s, h, d = 1, 32, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, s, h, d)).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h, d)).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, h, d)).astype(jnp.bfloat16)
    attn = make_ring_attention(mesh, heads=h, causal=True)
    got = attn(q, k, v)
    want = ring_attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)
