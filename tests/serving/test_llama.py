"""LLaMA-class architecture axes (RoPE + RMSNorm + SwiGLU + GQA) through
the serving engine: a hand-written per-token oracle, prefill/decode
teacher forcing (RoPE across the cache boundary is where bugs live),
extend parity, slotted (per-slot position) RoPE decode, and the
generate/batching/quant compositions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.serving import (BatchingEngine, GptConfig, init_params,
                                  make_decode_step, make_extend,
                                  make_generate, make_prefill,
                                  quantize_params, stack_params)
from tpp_mlir_tpu.serving.engine import _rmsnorm, _rope

CFG = GptConfig.llama(vocab=97, embed=32, heads=4, layers=2, mlp_ratio=2,
                      max_seq=32, dtype="f32", kv_heads=2)


def test_llama_preset_flags():
    assert CFG.rope and CFG.rms_norm and CFG.swiglu and CFG.kv_h == 2
    p = init_params(CFG, seed=0)
    assert "wpe" not in p and "lnf_b" not in p
    blk = p["blocks"][0]
    assert "w3" in blk and "b1" not in blk and "ln1_b" not in blk


def test_rope_oracle_and_relative_property():
    """_rope matches the rotate-half formula, and scores depend only on
    RELATIVE position: <rope(q,m), rope(k,n)> == <rope(q,m+d), rope(k,n+d)>."""
    D = 8
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 1, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, D))

    def dot(m, n):
        qm = _rope(q, jnp.asarray([m]), 10000.0)
        kn = _rope(k, jnp.asarray([n]), 10000.0)
        return float(jnp.sum(qm * kn))

    np.testing.assert_allclose(dot(5, 3), dot(9, 7), rtol=1e-5)
    np.testing.assert_allclose(dot(0, 0), float(jnp.sum(q * k)), rtol=1e-6)

    # explicit rotate-half check at one position
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 1, 4)
    got = np.asarray(_rope(x, jnp.asarray([2]), 10000.0))[0, 0, 0]
    inv = 10000.0 ** (-np.arange(2, dtype=np.float32) / 2)
    ang = 2.0 * inv
    x1, x2 = np.array([0.0, 1.0]), np.array([2.0, 3.0])
    want = np.concatenate([x1 * np.cos(ang) - x2 * np.sin(ang),
                           x2 * np.cos(ang) + x1 * np.sin(ang)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_rmsnorm_oracle():
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 16), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(4), (16,), jnp.float32)
    want = (np.asarray(x) / np.sqrt(
        np.mean(np.asarray(x) ** 2, -1, keepdims=True) + 1e-5)
        * np.asarray(g))
    np.testing.assert_allclose(np.asarray(_rmsnorm(x, g)), want,
                               atol=1e-6, rtol=1e-6)


def test_llama_decode_teacher_forcing_matches_prefill():
    """RoPE across the prefill/decode boundary: stepping tokens one at a
    time (each rotated at its own position against the post-rotation
    cache) must reproduce the prefill logits."""
    params = stack_params(init_params(CFG, seed=5))
    ids = jnp.asarray(np.random.default_rng(5).integers(
        0, CFG.vocab, (2, 9)), jnp.int32)
    logits, _ = make_prefill(CFG, use_pallas=False)(params, ids)

    uparams = init_params(CFG, seed=5)
    _, cache = make_prefill(CFG, use_pallas=False)(
        stack_params(uparams), ids[:, :1])
    step = make_decode_step(CFG)
    for t in range(1, ids.shape[1]):
        got, cache = step(uparams, cache, ids[:, t])
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(logits[:, t]),
                                   atol=2e-4, rtol=2e-4)


def test_llama_extend_matches_prefill():
    params = stack_params(init_params(CFG, seed=6))
    ids = jnp.asarray(np.random.default_rng(6).integers(
        0, CFG.vocab, (2, 10)), jnp.int32)
    logits, _ = make_prefill(CFG, use_pallas=False)(params, ids)
    _, cache = make_prefill(CFG, use_pallas=False)(params, ids[:, :4])
    got, _ = make_extend(CFG)(params, cache, ids[:, 4:])
    np.testing.assert_allclose(np.asarray(got), np.asarray(logits[:, 4:]),
                               atol=2e-4, rtol=2e-4)


def test_llama_continuous_batching_matches_sequential():
    """Slotted decode rotates q/k at PER-SLOT positions — the batching
    engine must emit exactly the single-request streams."""
    params = init_params(CFG, seed=7)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, CFG.vocab, n).astype(np.int32)
               for n in (3, 8, 5)]
    eng = BatchingEngine(params, CFG, slots=2, sync_steps=2,
                         buckets=(4, 8), use_pallas=False)
    rids = [eng.submit(p, max_new=6) for p in prompts]
    got = eng.run()

    sparams = stack_params(params)
    step = make_decode_step(CFG)
    for rid, prompt in zip(rids, prompts):
        logits, cache = make_prefill(CFG, use_pallas=False)(
            sparams, jnp.asarray(prompt, jnp.int32)[None])
        tok = int(jnp.argmax(logits[0, -1]))
        want = [tok]
        while len(want) < 6:
            logits, cache = step(params, cache,
                                 jnp.asarray([want[-1]], jnp.int32))
            want.append(int(jnp.argmax(logits[0])))
        assert got[rid] == want, rid


def test_llama_quant_and_speculative():
    from tpp_mlir_tpu.serving import make_speculative_generate

    qparams = stack_params(quantize_params(init_params(CFG, seed=8)))
    from tpp_mlir_tpu.serving import QTensor
    assert isinstance(qparams["blocks"]["w3"], QTensor)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    out = make_generate(CFG, steps=4, use_pallas=False)(
        qparams, ids, jax.random.PRNGKey(0))
    assert np.asarray(out).shape == (1, 4)

    dcfg = GptConfig.llama(vocab=97, embed=32, heads=4, layers=1,
                           mlp_ratio=2, max_seq=32, dtype="f32")
    params = stack_params(init_params(CFG, seed=9))
    draft = stack_params(init_params(dcfg, seed=10))
    got, _ = make_speculative_generate(CFG, dcfg, steps=6, k=2,
                                       use_pallas=False)(params, draft,
                                                         ids)
    want = make_generate(CFG, steps=6, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
