"""Serving engine tests: prefill matches torch eager, KV-cache decode is
teacher-forcing-equivalent to the full causal forward, and generate's
greedy path equals the stepwise argmax chain."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpp_mlir_tpu.serving import (GptConfig, init_params,  # noqa: E402
                                  make_decode_step, make_generate,
                                  make_prefill, params_from_torch)

CFG = GptConfig(vocab=96, embed=64, heads=4, layers=2, mlp_ratio=4,
                max_seq=24, dtype="f32")


def _torch_model():
    from tpp_mlir_tpu.models.gpt import GptTorch

    torch.manual_seed(0)
    return GptTorch(CFG.vocab, CFG.embed, CFG.heads, CFG.layers,
                    CFG.mlp_ratio, max_seq=CFG.max_seq).eval()


def test_prefill_matches_torch():
    # the torch module needs a full-length prompt (static wpe/mask); the
    # engine itself handles shorter prompts (next test)
    tm = _torch_model()
    params = params_from_torch(tm, CFG)
    ids = np.random.default_rng(0).integers(
        0, CFG.vocab, (2, CFG.max_seq)).astype(np.int32)
    with torch.no_grad():
        want = tm(torch.from_numpy(ids).long()).numpy()
    logits, cache = make_prefill(CFG, use_pallas=False)(
        params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), want,
                               atol=1e-4, rtol=1e-4)
    assert cache["k"].shape == (CFG.layers, 2, CFG.heads, CFG.max_seq,
                                CFG.head_dim)
    assert int(cache["pos"]) == CFG.max_seq


def test_decode_teacher_forcing_equivalence():
    """Feeding the true next tokens through decode_step reproduces the
    full causal forward's logits at every position — the KV cache, the
    position masking, and the dynamic_update_slice writes are all
    exercised."""
    params = init_params(CFG, seed=1)
    ids = np.random.default_rng(1).integers(
        0, CFG.vocab, (2, 12)).astype(np.int32)
    full_logits, _ = make_prefill(CFG, use_pallas=False)(
        params, jnp.asarray(ids))

    S0 = 5
    logits, cache = make_prefill(CFG, use_pallas=False)(
        params, jnp.asarray(ids[:, :S0]))
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full_logits[:, :S0]),
                               atol=1e-4, rtol=1e-4)
    step = make_decode_step(CFG)
    for t in range(S0, ids.shape[1]):
        logits_t, cache = step(params, cache, jnp.asarray(ids[:, t]))
        np.testing.assert_allclose(np.asarray(logits_t),
                                   np.asarray(full_logits[:, t]),
                                   atol=1e-4, rtol=1e-4)
    assert int(cache["pos"]) == ids.shape[1]


def test_generate_greedy_matches_stepwise():
    params = init_params(CFG, seed=2)
    ids = np.random.default_rng(2).integers(
        0, CFG.vocab, (2, 6)).astype(np.int32)
    steps = 5
    toks = make_generate(CFG, steps, temperature=0.0, use_pallas=False)(
        params, jnp.asarray(ids), jax.random.PRNGKey(0))
    assert toks.shape == (2, steps)

    # manual greedy chain through prefill + decode_step
    logits, cache = make_prefill(CFG, use_pallas=False)(
        params, jnp.asarray(ids))
    step = make_decode_step(CFG)
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    want = [tok]
    for _ in range(steps - 1):
        logits, cache = step(params, cache, tok)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        want.append(tok)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.stack([np.asarray(w) for w in want],
                                           axis=1))


def test_generate_sampling_shape_and_range():
    params = init_params(CFG, seed=3)
    ids = np.random.default_rng(3).integers(
        0, CFG.vocab, (1, 4)).astype(np.int32)
    toks = make_generate(CFG, 4, temperature=0.8, use_pallas=False)(
        params, jnp.asarray(ids), jax.random.PRNGKey(7))
    t = np.asarray(toks)
    assert t.shape == (1, 4) and t.min() >= 0 and t.max() < CFG.vocab


def test_sampler_top_k_truncation():
    """top-k sampling only ever draws from the k most-likely tokens; with
    a sharply peaked distribution, top-k=1 equals argmax."""
    from tpp_mlir_tpu.serving import make_sampler

    logits = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 64)), jnp.float32)
    topk = set(np.argsort(np.asarray(logits), axis=-1)[:, -8:].ravel())
    sample = make_sampler(temperature=1.0, top_k=8)
    draws = [np.asarray(sample(logits, jax.random.PRNGKey(i)))
             for i in range(32)]
    for d in draws:
        for b in range(4):
            assert d[b] in set(
                np.argsort(np.asarray(logits[b]))[-8:]), (d, b)
    # top_k=1 is argmax regardless of rng
    s1 = make_sampler(temperature=0.7, top_k=1)
    np.testing.assert_array_equal(
        np.asarray(s1(logits, jax.random.PRNGKey(3))),
        np.argmax(np.asarray(logits), axis=-1))


def test_sampler_top_p_nucleus():
    """top-p keeps the smallest prefix reaching mass p: with one dominant
    token at p=0.5 the nucleus is that token alone; p=1.0 keeps all."""
    from tpp_mlir_tpu.serving import make_sampler

    logits = jnp.zeros((2, 16), jnp.float32).at[:, 5].set(10.0)
    s = make_sampler(temperature=1.0, top_p=0.5)
    for i in range(8):
        np.testing.assert_array_equal(
            np.asarray(s(logits, jax.random.PRNGKey(i))), [5, 5])
    # p=1.0 must not mask anything: flat logits sample across the range
    flat = jnp.zeros((1, 16), jnp.float32)
    sall = make_sampler(temperature=1.0, top_p=1.0)
    seen = {int(sall(flat, jax.random.PRNGKey(i))[0]) for i in range(64)}
    assert len(seen) > 4


def test_generate_top_k_in_scan():
    params = init_params(CFG, seed=5)
    ids = np.random.default_rng(5).integers(
        0, CFG.vocab, (1, 4)).astype(np.int32)
    toks = make_generate(CFG, 4, temperature=0.9, top_k=10, top_p=0.9,
                         use_pallas=False)(
        params, jnp.asarray(ids), jax.random.PRNGKey(11))
    t = np.asarray(toks)
    assert t.shape == (1, 4) and t.min() >= 0 and t.max() < CFG.vocab


GQA_CFG = GptConfig(vocab=96, embed=64, heads=4, kv_heads=2, layers=2,
                    mlp_ratio=4, max_seq=24, dtype="f32")


def test_gqa_cache_holds_kv_heads_only():
    params = init_params(GQA_CFG, seed=9)
    assert params["blocks"][0]["wk"].shape == (64, GQA_CFG.kv_dim)
    ids = np.random.default_rng(9).integers(
        0, GQA_CFG.vocab, (2, 8)).astype(np.int32)
    _, cache = make_prefill(GQA_CFG, use_pallas=False)(
        params, jnp.asarray(ids))
    assert cache["k"].shape == (2, 2, 2, GQA_CFG.max_seq,
                                GQA_CFG.head_dim)


def test_gqa_decode_teacher_forcing_equivalence():
    """GQA decode (grouped attention over the un-repeated cache) must
    reproduce GQA prefill (KV broadcast to full heads) at every
    position — pins the q-head -> kv-head mapping (h // G) consistent
    across both paths."""
    params = init_params(GQA_CFG, seed=10)
    ids = np.random.default_rng(10).integers(
        0, GQA_CFG.vocab, (2, 10)).astype(np.int32)
    full_logits, _ = make_prefill(GQA_CFG, use_pallas=False)(
        params, jnp.asarray(ids))
    S0 = 4
    _, cache = make_prefill(GQA_CFG, use_pallas=False)(
        params, jnp.asarray(ids[:, :S0]))
    step = make_decode_step(GQA_CFG)
    for t in range(S0, ids.shape[1]):
        logits_t, cache = step(params, cache, jnp.asarray(ids[:, t]))
        np.testing.assert_allclose(np.asarray(logits_t),
                                   np.asarray(full_logits[:, t]),
                                   atol=1e-4, rtol=1e-4)


def test_gqa_attention_matches_torch_sdpa():
    """The repeat-based GQA prefill attention equals torch's
    scaled_dot_product_attention(enable_gqa=True) — pins the standard
    (LLaMA) grouping convention against an external oracle."""
    from tpp_mlir_tpu.serving.engine import _attention_full

    B, S, H, Hkv, D = 2, 8, 4, 2, 16
    cfg = GptConfig(vocab=8, embed=H * D, heads=H, kv_heads=Hkv,
                    layers=1, max_seq=S, dtype="f32")
    rng = np.random.default_rng(11)
    q = rng.normal(size=(B, S, H * D)).astype(np.float32)
    k = rng.normal(size=(B, S, Hkv * D)).astype(np.float32)
    v = rng.normal(size=(B, S, Hkv * D)).astype(np.float32)

    got = np.asarray(_attention_full(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cfg,
        use_pallas=False))

    def heads_first(x, n):
        return torch.from_numpy(x).reshape(B, S, n, D).permute(0, 2, 1, 3)

    import torch.nn.functional as F
    want = F.scaled_dot_product_attention(
        heads_first(q, H), heads_first(k, Hkv), heads_first(v, Hkv),
        is_causal=True, enable_gqa=True)
    want = want.permute(0, 2, 1, 3).reshape(B, S, H * D).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_gqa_tp_decode_matches_single_device():
    from tpp_mlir_tpu.parallel import make_mesh
    from tpp_mlir_tpu.serving import make_tp_decode_step, stack_params

    params = init_params(GQA_CFG, seed=12)
    ids = np.random.default_rng(12).integers(
        0, GQA_CFG.vocab, (2, 6)).astype(np.int32)
    _, cache = make_prefill(GQA_CFG, use_pallas=False)(
        params, jnp.asarray(ids))
    tok = jnp.asarray([5, 9], jnp.int32)
    ref_logits, ref_cache = make_decode_step(GQA_CFG)(params, cache, tok)

    mesh = make_mesh({"tp": 2})
    tp_logits, tp_cache = make_tp_decode_step(
        mesh, GQA_CFG, stacked=True)(stack_params(params), cache, tok)
    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(ref_logits),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tp_cache["k"]),
                               np.asarray(ref_cache["k"]),
                               atol=1e-5, rtol=1e-5)


def test_stacked_params_match_unstacked():
    """stack_params switches prefill/decode to one lax.scan over layers
    (L x smaller HLO for the remote-compile tunnel); numerics must be
    identical to the unrolled per-layer path."""
    from tpp_mlir_tpu.serving import stack_params

    params = init_params(CFG, seed=6)
    sp = stack_params(params)
    assert isinstance(sp["blocks"], dict)
    assert sp["blocks"]["wq"].shape[0] == CFG.layers
    assert stack_params(sp) is not sp or True  # idempotent, no raise
    ids = np.random.default_rng(6).integers(
        0, CFG.vocab, (2, 9)).astype(np.int32)

    prefill = make_prefill(CFG, use_pallas=False)
    l1, c1 = prefill(params, jnp.asarray(ids))
    l2, c2 = prefill(sp, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c2["k"]), np.asarray(c1["k"]),
                               atol=1e-6, rtol=1e-6)

    step = make_decode_step(CFG)
    tok = jnp.asarray([3, 11], jnp.int32)
    t1, d1 = step(params, c1, tok)
    t2, d2 = step(sp, c2, tok)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d2["k"]), np.asarray(d1["k"]),
                               atol=1e-6, rtol=1e-6)
    assert int(d2["pos"]) == int(d1["pos"])


def test_stacked_generate_matches_unstacked():
    from tpp_mlir_tpu.serving import stack_params

    params = init_params(CFG, seed=7)
    ids = np.random.default_rng(7).integers(
        0, CFG.vocab, (2, 5)).astype(np.int32)
    gen = make_generate(CFG, 4, temperature=0.0, use_pallas=False)
    t1 = gen(params, jnp.asarray(ids), jax.random.PRNGKey(0))
    t2 = gen(stack_params(params), jnp.asarray(ids), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_tp_decode_stacked_matches_single_device():
    """tp decode with stacked (scan-over-layers) params: the leading layer
    dim is unsharded, heads still shard over tp."""
    from tpp_mlir_tpu.parallel import make_mesh
    from tpp_mlir_tpu.serving import make_tp_decode_step, stack_params

    params = init_params(CFG, seed=8)
    ids = np.random.default_rng(8).integers(
        0, CFG.vocab, (2, 6)).astype(np.int32)
    _, cache = make_prefill(CFG, use_pallas=False)(params, jnp.asarray(ids))
    tok = jnp.asarray([1, 2], jnp.int32)
    ref_logits, ref_cache = make_decode_step(CFG)(params, cache, tok)

    mesh = make_mesh({"tp": 4})
    sp = stack_params(params)
    tp_logits, tp_cache = make_tp_decode_step(
        mesh, CFG, stacked=True)(sp, cache, tok)
    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(ref_logits),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tp_cache["k"]),
                               np.asarray(ref_cache["k"]),
                               atol=1e-5, rtol=1e-5)


def test_tp_decode_matches_single_device():
    """Megatron tp decode over the 8-device mesh (tp=4) reproduces the
    single-device decode step bit-for-bit-close: column/row sharding, the
    two psums per block, and the head-sharded KV cache are all exercised."""
    from tpp_mlir_tpu.parallel import make_mesh
    from tpp_mlir_tpu.serving import make_tp_decode_step

    params = init_params(CFG, seed=4)
    ids = np.random.default_rng(4).integers(
        0, CFG.vocab, (2, 7)).astype(np.int32)
    _, cache = make_prefill(CFG, use_pallas=False)(params, jnp.asarray(ids))
    tok = jnp.asarray(ids[:, -1] * 0 + 3, jnp.int32)

    ref_logits, ref_cache = make_decode_step(CFG)(params, cache, tok)
    mesh = make_mesh({"tp": 4})
    tp_logits, tp_cache = make_tp_decode_step(mesh, CFG)(params, cache, tok)
    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(ref_logits),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tp_cache["k"]),
                               np.asarray(ref_cache["k"]),
                               atol=1e-5, rtol=1e-5)
    assert int(tp_cache["pos"]) == int(ref_cache["pos"])


def test_decode_attn_pallas_matches_xla():
    """The streaming Pallas decode-attention kernel (decode_attn.py,
    per-head-contiguous cache) matches the XLA einsum decode path
    through the full decode step — scalar-pos form."""
    import dataclasses

    params = init_params(CFG, seed=0)
    ids = np.random.default_rng(0).integers(
        0, CFG.vocab, (2, 8)).astype(np.int32)
    _, cache = make_prefill(CFG, use_pallas=False)(params, jnp.asarray(ids))
    tok = jnp.asarray([3, 5], jnp.int32)
    lx, cx = make_decode_step(
        dataclasses.replace(CFG, decode_attn="xla"))(params, cache, tok)
    lp, cp = make_decode_step(
        dataclasses.replace(CFG, decode_attn="pallas"))(params, cache, tok)
    np.testing.assert_allclose(np.asarray(lp, np.float32),
                               np.asarray(lx, np.float32),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cp["k"], np.float32),
                               np.asarray(cx["k"], np.float32),
                               atol=1e-6, rtol=1e-6)


def test_decode_attn_pallas_slotted():
    """Slotted (per-row pos) decode attention through the Pallas kernel
    matches the XLA path — the continuous-batching form."""
    import dataclasses

    from tpp_mlir_tpu.serving import init_slot_cache, make_insert

    params = init_params(CFG, seed=0)
    prefill = make_prefill(CFG, use_pallas=False)
    insert = make_insert(CFG)
    cache = init_slot_cache(CFG, slots=2)
    for slot, n in ((0, 5), (1, 8)):
        ids = np.random.default_rng(slot).integers(
            0, CFG.vocab, (1, 8)).astype(np.int32)
        _, pc = prefill(params, jnp.asarray(ids))
        cache = insert(cache, pc, slot, n)
    tok = jnp.asarray([3, 5], jnp.int32)
    lx, _ = make_decode_step(
        dataclasses.replace(CFG, decode_attn="xla"))(params, cache, tok)
    lp, _ = make_decode_step(
        dataclasses.replace(CFG, decode_attn="pallas"))(params, cache, tok)
    np.testing.assert_allclose(np.asarray(lp, np.float32),
                               np.asarray(lx, np.float32),
                               atol=1e-4, rtol=1e-4)


def test_decode_attn_pallas_gqa():
    """GQA (groups > 1) through the streaming decode-attention kernel
    matches the XLA grouped-einsum path."""
    import dataclasses

    params = init_params(GQA_CFG, seed=0)
    ids = np.random.default_rng(0).integers(
        0, GQA_CFG.vocab, (2, 8)).astype(np.int32)
    _, cache = make_prefill(GQA_CFG, use_pallas=False)(
        params, jnp.asarray(ids))
    tok = jnp.asarray([3, 5], jnp.int32)
    lx, _ = make_decode_step(
        dataclasses.replace(GQA_CFG, decode_attn="xla"))(params, cache,
                                                         tok)
    lp, _ = make_decode_step(
        dataclasses.replace(GQA_CFG, decode_attn="pallas"))(params, cache,
                                                            tok)
    np.testing.assert_allclose(np.asarray(lp, np.float32),
                               np.asarray(lx, np.float32),
                               atol=1e-4, rtol=1e-4)


def test_decode_attn_pallas_int8_kv():
    """int8-KV cache through the streaming decode-attention kernel:
    the in-kernel scale folding (K scale into logits, V scale into the
    softmax weights) must match the XLA dequant-einsum path through the
    full decode step."""
    import dataclasses

    qcfg = dataclasses.replace(CFG, kv_quant="int8")
    params = init_params(qcfg, seed=0)
    ids = np.random.default_rng(0).integers(
        0, qcfg.vocab, (2, 8)).astype(np.int32)
    _, cache = make_prefill(qcfg, use_pallas=False)(params,
                                                    jnp.asarray(ids))
    tok = jnp.asarray([3, 5], jnp.int32)
    lx, cx = make_decode_step(
        dataclasses.replace(qcfg, decode_attn="xla"))(params, cache, tok)
    lp, cp = make_decode_step(
        dataclasses.replace(qcfg, decode_attn="pallas"))(params, cache,
                                                         tok)
    np.testing.assert_allclose(np.asarray(lp, np.float32),
                               np.asarray(lx, np.float32),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(cp["k"]), np.asarray(cx["k"]))
    np.testing.assert_allclose(np.asarray(cp["k_s"], np.float32),
                               np.asarray(cx["k_s"], np.float32),
                               atol=1e-7, rtol=1e-7)


def test_decode_attn_pallas_int8_kv_slotted():
    """int8 KV + slotted (per-row pos) through the kernel — the
    continuous-batching composition."""
    import dataclasses

    from tpp_mlir_tpu.serving import init_slot_cache, make_insert

    qcfg = dataclasses.replace(CFG, kv_quant="int8")
    params = init_params(qcfg, seed=0)
    prefill = make_prefill(qcfg, use_pallas=False)
    insert = make_insert(qcfg)
    cache = init_slot_cache(qcfg, slots=2)
    for slot, n in ((0, 5), (1, 8)):
        ids = np.random.default_rng(slot).integers(
            0, qcfg.vocab, (1, 8)).astype(np.int32)
        _, pc = prefill(params, jnp.asarray(ids))
        cache = insert(cache, pc, slot, n)
    tok = jnp.asarray([3, 5], jnp.int32)
    lx, _ = make_decode_step(
        dataclasses.replace(qcfg, decode_attn="xla"))(params, cache, tok)
    lp, _ = make_decode_step(
        dataclasses.replace(qcfg, decode_attn="pallas"))(params, cache,
                                                         tok)
    np.testing.assert_allclose(np.asarray(lp, np.float32),
                               np.asarray(lx, np.float32),
                               atol=1e-4, rtol=1e-4)


def test_decode_attn_packed_pairs_matches_xla():
    """r5 verdict #4: the pack2 head-pair cache layout ((L,B,H/2,S,2D),
    two heads per 128-lane group) through the full decode loop matches
    the baseline XLA einsum path — logits AND (unpacked) cache rows."""
    import dataclasses

    params = init_params(CFG, seed=0)
    ids = np.random.default_rng(0).integers(
        0, CFG.vocab, (2, 8)).astype(np.int32)
    base = dataclasses.replace(CFG, decode_attn="xla")
    packd = dataclasses.replace(CFG, decode_attn="pallas", kv_packed=True)
    _, cache_x = make_prefill(base, use_pallas=False)(
        params, jnp.asarray(ids))
    _, cache_p = make_prefill(packd, use_pallas=False)(
        params, jnp.asarray(ids))
    # packed cache == pack(unpacked cache)
    L, B, H, S, D = cache_x["k"].shape
    want_packed = np.asarray(cache_x["k"]).reshape(
        L, B, H // 2, 2, S, D).swapaxes(3, 4).reshape(
        L, B, H // 2, S, 2 * D)
    np.testing.assert_allclose(np.asarray(cache_p["k"]), want_packed,
                               atol=0, rtol=0)
    tok = jnp.asarray([3, 5], jnp.int32)
    step_x = make_decode_step(base)
    step_p = make_decode_step(packd)
    for _ in range(3):
        lx, cache_x = step_x(params, cache_x, tok)
        lp, cache_p = step_p(params, cache_p, tok)
        np.testing.assert_allclose(np.asarray(lp, np.float32),
                                   np.asarray(lx, np.float32),
                                   atol=1e-4, rtol=1e-4)
        tok = jnp.argmax(lx, axis=-1).astype(jnp.int32)
    assert int(cache_p["pos"]) == int(cache_x["pos"])
