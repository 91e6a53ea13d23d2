"""Flash-attention TRAINING kernels (xsmm/flash_train.py): the custom
VJP must reproduce composed_causal_attention's value AND gradients —
the train step's numerics contract (r7 bisect: composed attention
fwd+bwd is 34% of the dense train step; this kernel pair replaces it
with O(S·D) residuals)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.serving.engine import composed_causal_attention
from tpp_mlir_tpu.xsmm.flash_train import (FlashTrainKey,
                                           build_flash_train_bwd,
                                           build_flash_train_fwd,
                                           flash_attention_train,
                                           flash_train_fits)


def _qkv(B=2, S=32, H=3, D=16, kv_h=None, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    kv_h = kv_h or H
    q = jax.random.normal(ks[0], (B, S, H, D), dtype)
    k = jax.random.normal(ks[1], (B, S, kv_h, D), dtype)
    v = jax.random.normal(ks[2], (B, S, kv_h, D), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_flash_train_forward_matches_composed(causal):
    q, k, v = _qkv()
    scale = q.shape[-1] ** -0.5
    want = composed_causal_attention(q, k, v, scale, causal)
    got = flash_attention_train(q, k, v, scale, causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_train_grads_match_composed():
    q, k, v = _qkv(seed=1)
    scale = q.shape[-1] ** -0.5
    cot = jax.random.normal(jax.random.PRNGKey(9), q.shape, q.dtype)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) * cot)

    want = jax.grad(
        lambda *a: loss(
            lambda q, k, v: composed_causal_attention(q, k, v, scale),
            *a), argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(
        lambda *a: loss(
            lambda q, k, v: flash_attention_train(q, k, v, scale,
                                                  interpret=True),
            *a), argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"d{name}")


def test_flash_train_gqa_grads_sum_over_groups():
    """GQA (kv_h < H): the repeat sits OUTSIDE the custom VJP, so dk/dv
    must come back group-summed exactly like composed's."""
    q, k, v = _qkv(H=4, kv_h=2, seed=2)
    scale = q.shape[-1] ** -0.5

    def tot(fn, q, k, v):
        return jnp.sum(jnp.square(fn(q, k, v)))

    want = jax.grad(
        lambda *a: tot(
            lambda q, k, v: composed_causal_attention(q, k, v, scale),
            *a), argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(
        lambda *a: tot(
            lambda q, k, v: flash_attention_train(q, k, v, scale,
                                                  interpret=True),
            *a), argnums=(0, 1, 2))(q, k, v)
    assert got[1].shape == k.shape and got[2].shape == v.shape
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"d{name}")


def test_flash_train_bf16_close_to_f32():
    """bf16 operands run the same kernels (P/dS cast to bf16 for the
    MXU dots); values track the f32 path within bf16 tolerance."""
    q, k, v = _qkv(S=64, D=32, seed=3)
    scale = q.shape[-1] ** -0.5
    f32 = flash_attention_train(q, k, v, scale, interpret=True)
    b16 = flash_attention_train(q.astype(jnp.bfloat16),
                                k.astype(jnp.bfloat16),
                                v.astype(jnp.bfloat16), scale,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(b16), np.asarray(f32),
                               atol=0.05, rtol=0.05)


def test_flash_train_mosaic_lowerable():
    """Compiled-mode fwd and bwd jaxprs contain no Mosaic-unsupported
    primitives (the erf-family guard, test_mosaic_lowerable pattern)."""
    def assert_lowerable(fn, *args):   # test_mosaic_lowerable pattern
        text = str(jax.make_jaxpr(fn)(*args))
        for prim in ("erfc", "erf", "erf_inv"):
            assert f" {prim} " not in text and f"{prim}[" not in text

    key = FlashTrainKey(batch=1, heads=2, seq=128, head_dim=64,
                        dtype="bf16", causal=True, scale=0.125)
    fwd = build_flash_train_fwd(key, interpret=False)
    bwd = build_flash_train_bwd(key, interpret=False)
    q = jnp.zeros((1, 2, 128, 64), jnp.bfloat16)
    lse = jnp.zeros((1, 2, 128, 1), jnp.float32)
    assert_lowerable(fwd, q, q, q)
    assert_lowerable(bwd, q, q, q, q, lse, lse)


def test_prefill_flash_attn_matches_default():
    """GptConfig.flash_attn=True routes the prefill attention through
    the flash VJP: logits AND gradients through the prefill-based
    training loss must match the composed default (the exp_moe_train /
    exp_spec_real training path)."""
    from tpp_mlir_tpu.serving import (GptConfig, init_params,
                                      make_prefill, stack_params)

    import dataclasses

    cfg = GptConfig(vocab=64, embed=32, heads=4, layers=2, mlp_ratio=2,
                    max_seq=16, dtype="f32")
    fcfg = dataclasses.replace(cfg, flash_attn=True)
    params = stack_params(init_params(cfg, seed=4))
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab, (2, 12)), jnp.int32)

    def loss(prefill):
        def f(p):
            logits, _ = prefill(p, ids)
            lp = jax.nn.log_softmax(logits[:, :-1])
            return -jnp.mean(jnp.take_along_axis(
                lp, ids[:, 1:][..., None], -1))
        return f

    base = loss(make_prefill(cfg, use_pallas=False))
    flash = loss(make_prefill(fcfg, use_pallas=False))
    np.testing.assert_allclose(float(flash(params)), float(base(params)),
                               rtol=1e-5)
    gb = jax.grad(base)(params)
    gf = jax.grad(flash)(params)
    for b, f in zip(jax.tree.leaves(gb), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(f), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_flash_train_fits_gate():
    v5e = 16 * (1 << 20)
    ok = FlashTrainKey(batch=8, heads=12, seq=512, head_dim=64)
    big = FlashTrainKey(batch=8, heads=12, seq=2048, head_dim=64)
    assert flash_train_fits(ok, v5e)
    assert not flash_train_fits(big, v5e)
