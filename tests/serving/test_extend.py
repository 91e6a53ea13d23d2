"""Multi-token extend tests (engine.make_extend): chunked prefill and
the speculative-verification primitive must agree with the existing
prefill / single-token decode paths position by position."""

import numpy as np

import jax.numpy as jnp

from tpp_mlir_tpu.serving import (GptConfig, init_params, make_decode_step,
                                  make_extend, make_prefill,
                                  quantize_params, stack_params)

CFG = GptConfig(vocab=96, embed=64, heads=4, layers=2, mlp_ratio=4,
                max_seq=24, dtype="f32")


def _ids(seed, b, t, vocab=96):
    return jnp.asarray(np.random.default_rng(seed).integers(
        0, vocab, (b, t)), jnp.int32)


def test_extend_t1_matches_decode_step():
    params = init_params(CFG, seed=0)
    ids = _ids(0, 2, 6)
    _, cache = make_prefill(CFG, use_pallas=False)(params, ids)
    tok = jnp.asarray([3, 7], jnp.int32)
    want, wcache = make_decode_step(CFG)(params, cache, tok)
    got, gcache = make_extend(CFG)(params, cache, tok[:, None])
    np.testing.assert_allclose(np.asarray(got[:, 0]), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gcache["k"]),
                               np.asarray(wcache["k"]),
                               atol=1e-5, rtol=1e-5)
    assert int(gcache["pos"]) == int(wcache["pos"])


def _chunked_prefill_equivalence(cfg):
    params = init_params(cfg, seed=1)
    ids = _ids(1, 2, 12, cfg.vocab)
    prefill = make_prefill(cfg, use_pallas=False)
    full_logits, full_cache = prefill(params, ids)

    logits, cache = prefill(params, ids[:, :4])
    extend = make_extend(cfg)
    l2, cache = extend(params, cache, ids[:, 4:8])
    l3, cache = extend(params, cache, ids[:, 8:12])
    got = jnp.concatenate([logits, l2, l3], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full_logits),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(cache["k"]),
                               np.asarray(full_cache["k"]),
                               atol=1e-4, rtol=1e-4)
    assert int(cache["pos"]) == 12


def test_chunked_prefill_matches_full():
    _chunked_prefill_equivalence(CFG)


def test_chunked_prefill_gqa():
    _chunked_prefill_equivalence(
        GptConfig(vocab=96, embed=64, heads=4, layers=2, mlp_ratio=2,
                  max_seq=24, dtype="f32", kv_heads=2))


def test_chunked_prefill_int8_kv():
    """int8 KV: prefill attends over EXACT k/v (quantization happens at
    cache-write time), extend attends over the quantized cache — so the
    extended chunk tracks the full prefill within the quantization-noise
    budget, and the caches (both written through quantize_tokens on the
    same values) agree exactly."""
    cfg = GptConfig(vocab=96, embed=64, heads=4, layers=2, mlp_ratio=4,
                    max_seq=24, dtype="f32", kv_quant="int8")
    params = init_params(cfg, seed=1)
    ids = _ids(1, 2, 12, cfg.vocab)
    prefill = make_prefill(cfg, use_pallas=False)
    full_logits, full_cache = prefill(params, ids)

    _, cache = prefill(params, ids[:, :4])
    got, cache = make_extend(cfg)(params, cache, ids[:, 4:12])
    g = np.asarray(got).ravel()
    w = np.asarray(full_logits[:, 4:12]).ravel()
    rel = np.linalg.norm(g - w) / np.linalg.norm(w)
    assert rel < 0.05, rel
    # the residual stream itself drifts by quantization noise through
    # the prefix, so later-position k/v differ slightly too: compare
    # DEQUANTIZED caches on the same noise budget over written positions
    def deq(c):
        return (np.asarray(c["k"], np.float32)[:, :, :12]
                * np.asarray(c["k_s"])[:, :, :12, :, None])

    dg, dw = deq(cache), deq(full_cache)
    rel = np.linalg.norm(dg - dw) / np.linalg.norm(dw)
    assert rel < 0.05, rel
    assert int(cache["pos"]) == 12


def test_extend_quantized_weights_stacked():
    params = stack_params(quantize_params(init_params(CFG, seed=2)))
    ids = _ids(2, 2, 10)
    prefill = make_prefill(CFG, use_pallas=False)
    full_logits, _ = prefill(params, ids)
    logits, cache = prefill(params, ids[:, :5])
    got, cache = make_extend(CFG)(params, cache, ids[:, 5:])
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([logits, got], axis=1)),
        np.asarray(full_logits), atol=2e-3, rtol=2e-3)


def test_extend_then_decode_chain():
    """A realistic serving flow: prefill, extend a chunk, then step one
    token — every stage reads the cache the previous one wrote."""
    params = init_params(CFG, seed=3)
    ids = _ids(3, 2, 11)
    prefill = make_prefill(CFG, use_pallas=False)
    full_logits, _ = prefill(params, ids)

    _, cache = prefill(params, ids[:, :6])
    _, cache = make_extend(CFG)(params, cache, ids[:, 6:10])
    got, cache = make_decode_step(CFG)(params, cache, ids[:, 10])
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(full_logits[:, 10]),
                               atol=2e-3, rtol=2e-3)
