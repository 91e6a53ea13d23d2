"""Gradients THROUGH the sharded sp/ep forwards: ring attention and the
MoE all_to_all exchange are built from ppermute/all_to_all (correct
transposes by construction — point-to-point permutation collectives, no
replication ambiguity) and local ops, so reverse-mode AD through the
jitted shard_map'd forward must match the single-device oracle's grads
exactly. These pins make sp/ep training-ready: a future edit that
introduces a psum/all_gather of a replicated value (the check_vma=False
transpose hazard, see collectives.py) breaks them loudly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.parallel import (make_mesh, make_moe_forward,
                                   make_ring_attention, moe_init,
                                   moe_reference,
                                   ring_attention_reference)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_grads_match_reference(causal):
    mesh = make_mesh({"sp": 4})
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    shp = (2, 32, 2, 16)
    q, k, v = (jax.random.normal(kk, shp, jnp.float32) for kk in ks[:3])
    g = jax.random.normal(ks[3], shp, jnp.float32)

    ring = make_ring_attention(mesh, heads=2, causal=causal)
    got = jax.grad(lambda q, k, v: jnp.sum(ring(q, k, v) * g),
                   argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(
        lambda q, k, v: jnp.sum(
            ring_attention_reference(q, k, v, causal=causal) * g),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, want):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_moe_grads_match_reference():
    mesh = make_mesh({"ep": 4})
    params = moe_init(d_model=16, d_ff=32, n_experts=8, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (32, 16), jnp.float32)
    moe = make_moe_forward(mesh, 16, 32, 8)

    got = jax.grad(lambda p, x: jnp.sum(moe(p, x) * g),
                   argnums=(0, 1))(params, x)
    want = jax.grad(lambda p, x: jnp.sum(moe_reference(p, x) * g),
                    argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)
