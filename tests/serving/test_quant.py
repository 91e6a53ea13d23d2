"""Weight-only int8 serving tests (serving/quant.py).

The sharp check everywhere: the QUANTIZED engine must match the
FULL-PRECISION engine run on DEQUANTIZED params to float tolerance —
per-out-column scales factor out of the contraction exactly, so the two
computations differ only in f32 rounding order. Quantization ERROR
(quantized vs original params) is checked separately with the
round-to-nearest bound."""

import numpy as np

import jax
import jax.numpy as jnp

from tpp_mlir_tpu.serving import (GptConfig, QTensor, dequantize,
                                  dequantize_params, init_params,
                                  make_decode_step, make_generate,
                                  make_prefill, make_tp_decode_step,
                                  quantize, quantize_params,
                                  quantized_bytes, stack_params)

CFG = GptConfig(vocab=96, embed=64, heads=4, layers=2, mlp_ratio=4,
                max_seq=24, dtype="f32")


def test_quantize_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (48, 96), jnp.float32)
    qt = quantize(w)
    assert qt.q.dtype == jnp.int8 and qt.q.shape == w.shape
    assert qt.scale.shape == (1, 96)
    err = np.abs(np.asarray(dequantize(qt)) - np.asarray(w))
    # round-to-nearest: |err| <= scale/2 per element (per column)
    bound = np.asarray(qt.scale)[0] / 2 + 1e-7
    assert (err <= bound[None, :]).all()


def test_quantize_zero_column_safe():
    w = jnp.zeros((8, 16), jnp.float32)
    qt = quantize(w)
    assert np.asarray(dequantize(qt)).max() == 0.0
    assert np.isfinite(np.asarray(qt.scale)).all()


def test_quantized_bytes_shrink():
    params = init_params(CFG, seed=0)
    qparams = quantize_params(params)
    full = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    assert quantized_bytes(qparams) < 0.45 * full  # f32 -> int8 on matmuls


def test_quantized_prefill_matches_dequantized_reference():
    params = init_params(CFG, seed=1)
    qparams = quantize_params(params)
    ids = jnp.asarray(np.random.default_rng(1).integers(
        0, CFG.vocab, (2, 10)), jnp.int32)
    prefill = make_prefill(CFG, use_pallas=False)
    got, _ = prefill(qparams, ids)
    want, _ = prefill(dequantize_params(qparams), ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_quantized_decode_teacher_forcing():
    """Quantized prefill+decode chain == full-precision engine on the
    dequantized params, token by token."""
    params = init_params(CFG, seed=2)
    qparams = quantize_params(params)
    dparams = dequantize_params(qparams)
    ids = np.random.default_rng(2).integers(
        0, CFG.vocab, (2, 12)).astype(np.int32)
    prefill = make_prefill(CFG, use_pallas=False)
    step = make_decode_step(CFG)

    S0 = 5
    qlog, qcache = prefill(qparams, jnp.asarray(ids[:, :S0]))
    dlog, dcache = prefill(dparams, jnp.asarray(ids[:, :S0]))
    np.testing.assert_allclose(np.asarray(qlog), np.asarray(dlog),
                               atol=1e-3, rtol=1e-3)
    for t in range(S0, ids.shape[1]):
        qlog, qcache = step(qparams, qcache, jnp.asarray(ids[:, t]))
        dlog, dcache = step(dparams, dcache, jnp.asarray(ids[:, t]))
        np.testing.assert_allclose(np.asarray(qlog), np.asarray(dlog),
                                   atol=1e-3, rtol=1e-3)


def test_quantization_error_small_vs_original():
    """Loose end-to-end sanity: int8 per-channel on random-normal weights
    perturbs logits by a small relative amount (it must not change the
    distribution wholesale)."""
    params = init_params(CFG, seed=3)
    qparams = quantize_params(params)
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, CFG.vocab, (2, 8)), jnp.int32)
    prefill = make_prefill(CFG, use_pallas=False)
    got, _ = prefill(qparams, ids)
    want, _ = prefill(params, ids)
    g, w = np.asarray(got).ravel(), np.asarray(want).ravel()
    cos = np.dot(g, w) / (np.linalg.norm(g) * np.linalg.norm(w))
    assert cos > 0.999, cos
    rel = np.linalg.norm(g - w) / np.linalg.norm(w)
    assert rel < 0.05, rel


def test_quantized_stacked_matches_unstacked():
    """stack_params stacks QTensor leaves leaf-wise; the scan'd decode
    body must reproduce the unstacked loop."""
    params = init_params(CFG, seed=4)
    qparams = quantize_params(params)
    sq = stack_params(qparams)
    blk = sq["blocks"]["wq"]
    assert isinstance(blk, QTensor)
    assert blk.q.shape == (CFG.layers, CFG.embed, CFG.embed)
    assert blk.scale.shape == (CFG.layers, 1, CFG.embed)

    ids = jnp.asarray(np.random.default_rng(4).integers(
        0, CFG.vocab, (2, 7)), jnp.int32)
    prefill = make_prefill(CFG, use_pallas=False)
    lu, cu = prefill(qparams, ids)
    ls, cs = prefill(sq, ids)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lu),
                               atol=1e-4, rtol=1e-4)
    step = make_decode_step(CFG)
    tok = jnp.asarray([5, 9], jnp.int32)
    lu2, _ = step(qparams, cu, tok)
    ls2, _ = step(sq, cs, tok)
    np.testing.assert_allclose(np.asarray(ls2), np.asarray(lu2),
                               atol=1e-4, rtol=1e-4)


def test_quantized_tp_decode_matches_single_device():
    """Megatron tp decode with QTensor params: int8 payloads shard like
    the weights, scales shard with the out dim (column-parallel) or stay
    replicated (row-parallel); each shard dequant-scales its local
    partial before the psum."""
    from tpp_mlir_tpu.parallel import make_mesh

    params = init_params(CFG, seed=5)
    qparams = quantize_params(params)
    ids = np.random.default_rng(5).integers(
        0, CFG.vocab, (2, 7)).astype(np.int32)
    _, cache = make_prefill(CFG, use_pallas=False)(qparams,
                                                   jnp.asarray(ids))
    tok = jnp.asarray([3, 4], jnp.int32)
    ref_logits, ref_cache = make_decode_step(CFG)(qparams, cache, tok)

    mesh = make_mesh({"tp": 4})
    tp_logits, tp_cache = make_tp_decode_step(
        mesh, CFG, quantized=True)(qparams, cache, tok)
    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(ref_logits),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tp_cache["k"]),
                               np.asarray(ref_cache["k"]),
                               atol=1e-5, rtol=1e-5)


def test_quantized_checkpoint_roundtrip(tmp_path):
    """QTensor leaves are plain pytree structure, so orbax checkpointing
    of a quantized serving model needs no special handling — the
    deployment flow (quantize once, checkpoint, restore in the server)."""
    from tpp_mlir_tpu.parallel.checkpoint import (restore_checkpoint,
                                                  save_checkpoint)

    params = stack_params(quantize_params(init_params(CFG, seed=13)))
    save_checkpoint(str(tmp_path / "q"), params, step=1)
    got, step = restore_checkpoint(str(tmp_path / "q"), params, step=1)
    assert step == 1
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(params)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    blk = got["blocks"]["wq"]
    assert isinstance(blk, QTensor) and blk.q.dtype == jnp.int8


def test_quantized_generate_smoke():
    params = init_params(CFG, seed=6)
    qparams = stack_params(quantize_params(params, include_embed=True))
    ids = jnp.asarray(np.random.default_rng(6).integers(
        0, CFG.vocab, (2, 6)), jnp.int32)
    toks = make_generate(CFG, 5, temperature=0.0, use_pallas=False)(
        qparams, ids, jax.random.PRNGKey(0))
    assert toks.shape == (2, 5)
    t = np.asarray(toks)
    assert ((t >= 0) & (t < CFG.vocab)).all()


def test_quantize_tokens_error_bound():
    from tpp_mlir_tpu.serving.quant import quantize_tokens

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 64), jnp.float32)
    q, s = quantize_tokens(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 4)
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(deq - np.asarray(x))
    assert (err <= np.asarray(s)[..., None] / 2 + 1e-7).all()


KVCFG = GptConfig(vocab=96, embed=64, heads=4, layers=2, mlp_ratio=4,
                  max_seq=24, dtype="f32", kv_quant="int8")


def test_kv_quant_cache_layout():
    params = init_params(KVCFG, seed=8)
    ids = jnp.asarray(np.random.default_rng(8).integers(
        0, KVCFG.vocab, (2, 6)), jnp.int32)
    _, cache = make_prefill(KVCFG, use_pallas=False)(params, ids)
    assert cache["k"].dtype == jnp.int8
    assert cache["k_s"].shape == (KVCFG.layers, 2, KVCFG.heads,
                                  KVCFG.max_seq)
    # written positions carry real scales; padding is zero
    assert (np.asarray(cache["k_s"])[:, :, :, :6] > 0).all()
    assert (np.asarray(cache["k_s"])[:, :, :, 6:] == 0).all()


def test_kv_quant_decode_close_to_full_precision():
    """int8 KV decode tracks the full-precision decode within the
    quantization-noise budget, token by token (teacher forcing)."""
    fcfg = GptConfig(vocab=96, embed=64, heads=4, layers=2, mlp_ratio=4,
                     max_seq=24, dtype="f32")
    params = init_params(fcfg, seed=9)
    ids = np.random.default_rng(9).integers(
        0, fcfg.vocab, (2, 12)).astype(np.int32)
    S0 = 5
    _, qcache = make_prefill(KVCFG, use_pallas=False)(
        params, jnp.asarray(ids[:, :S0]))
    _, fcache = make_prefill(fcfg, use_pallas=False)(
        params, jnp.asarray(ids[:, :S0]))
    qstep = make_decode_step(KVCFG)
    fstep = make_decode_step(fcfg)
    for t in range(S0, ids.shape[1]):
        qlog, qcache = qstep(params, qcache, jnp.asarray(ids[:, t]))
        flog, fcache = fstep(params, fcache, jnp.asarray(ids[:, t]))
        g, w = np.asarray(qlog).ravel(), np.asarray(flog).ravel()
        rel = np.linalg.norm(g - w) / np.linalg.norm(w)
        assert rel < 0.05, (t, rel)


def test_kv_quant_stacked_matches_unstacked():
    params = init_params(KVCFG, seed=10)
    sparams = stack_params(params)
    ids = jnp.asarray(np.random.default_rng(10).integers(
        0, KVCFG.vocab, (2, 7)), jnp.int32)
    prefill = make_prefill(KVCFG, use_pallas=False)
    _, cu = prefill(params, ids)
    _, cs = prefill(sparams, ids)
    step = make_decode_step(KVCFG)
    tok = jnp.asarray([5, 9], jnp.int32)
    lu, _ = step(params, cu, tok)
    ls, _ = step(sparams, cs, tok)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lu),
                               atol=1e-4, rtol=1e-4)


def test_kv_quant_tp_decode_matches_single_device():
    """tp decode with an int8 cache: payload AND scale arrays shard the
    KV-head dim; logits must match the single-device quantized step."""
    from tpp_mlir_tpu.parallel import make_mesh

    params = init_params(KVCFG, seed=11)
    ids = np.random.default_rng(11).integers(
        0, KVCFG.vocab, (2, 7)).astype(np.int32)
    _, cache = make_prefill(KVCFG, use_pallas=False)(params,
                                                     jnp.asarray(ids))
    tok = jnp.asarray([3, 4], jnp.int32)
    ref_logits, ref_cache = make_decode_step(KVCFG)(params, cache, tok)
    mesh = make_mesh({"tp": 4})
    tp_logits, tp_cache = make_tp_decode_step(mesh, KVCFG)(
        params, cache, tok)
    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(ref_logits),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tp_cache["k_s"]),
                               np.asarray(ref_cache["k_s"]),
                               atol=1e-6, rtol=1e-6)


def test_kv_quant_composes_with_weight_quant_and_gqa():
    """The full low-bit serving stack: int8 weights + int8 KV + GQA,
    through generate."""
    cfg = GptConfig(vocab=96, embed=64, heads=4, layers=2, mlp_ratio=2,
                    max_seq=24, dtype="bf16", kv_heads=2, kv_quant="int8")
    params = stack_params(quantize_params(init_params(cfg, seed=12)))
    ids = jnp.asarray(np.random.default_rng(12).integers(
        0, cfg.vocab, (2, 6)), jnp.int32)
    toks = make_generate(cfg, 5, temperature=0.0, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    t = np.asarray(toks)
    assert t.shape == (2, 5) and ((t >= 0) & (t < cfg.vocab)).all()


def test_quantized_gqa_decode():
    """GQA + int8 compose: grouped decode attention over the un-repeated
    cache with quantized projections."""
    cfg = GptConfig(vocab=96, embed=64, heads=4, layers=2, mlp_ratio=2,
                    max_seq=24, dtype="f32", kv_heads=2)
    params = init_params(cfg, seed=7)
    qparams = quantize_params(params)
    dparams = dequantize_params(qparams)
    ids = jnp.asarray(np.random.default_rng(7).integers(
        0, cfg.vocab, (2, 6)), jnp.int32)
    prefill = make_prefill(cfg, use_pallas=False)
    _, qcache = prefill(qparams, ids)
    _, dcache = prefill(dparams, ids)
    step = make_decode_step(cfg)
    tok = jnp.asarray([1, 2], jnp.int32)
    qlog, _ = step(qparams, qcache, tok)
    dlog, _ = step(dparams, dcache, tok)
    np.testing.assert_allclose(np.asarray(qlog), np.asarray(dlog),
                               atol=1e-3, rtol=1e-3)


def test_int4_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(9), (48, 96), jnp.float32)
    qt = quantize(w, bits=4)
    assert qt.q.dtype == jnp.int4 and qt.q.shape == w.shape
    err = np.abs(np.asarray(dequantize(qt)) - np.asarray(w))
    bound = np.asarray(qt.scale)[0] / 2 + 1e-7   # |err| <= scale/2
    assert (err <= bound[None, :]).all()


def test_int4_prefill_matches_dequantized_reference():
    """The factoring (x @ q) * scale is exact for int4 too: the int4
    engine must match the full-precision engine on DEQUANTIZED params
    to float tolerance (quantization error itself cancels out)."""
    params = stack_params(init_params(CFG, seed=10))
    qparams = quantize_params(params, bits=4)
    ids = jnp.asarray(np.random.default_rng(10).integers(
        0, CFG.vocab, (2, 8)), jnp.int32)
    prefill = make_prefill(CFG, use_pallas=False)
    ql, qc = prefill(qparams, ids)
    from tpp_mlir_tpu.serving import dequantize_params
    fl, fc = prefill(dequantize_params(qparams), ids)
    np.testing.assert_allclose(np.asarray(ql), np.asarray(fl),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(qc["k"]), np.asarray(fc["k"]),
                               atol=2e-4, rtol=2e-4)


def test_int4_bytes_half_of_int8():
    params = init_params(CFG, seed=0)
    b8 = quantized_bytes(quantize_params(params))
    b4 = quantized_bytes(quantize_params(params, bits=4))
    assert b4 < b8   # matmul weights halve again (0.5 B/elem packed)
    w = params["blocks"][0]["wq"]
    scale_bytes = quantize(w).scale.size * 4
    payload8 = quantized_bytes({"w": quantize(w)}) - scale_bytes
    payload4 = quantized_bytes({"w": quantize(w, bits=4)}) - scale_bytes
    assert payload4 * 2 == payload8


def test_int4_generate_and_batching_smoke():
    params = init_params(CFG, seed=11)
    q = quantize_params(params, bits=4)
    from tpp_mlir_tpu.serving import BatchingEngine
    eng = BatchingEngine(q, CFG, slots=2, sync_steps=2, buckets=(8,),
                         use_pallas=False)
    rids = [eng.submit(np.arange(1, 6) % CFG.vocab, max_new=4)
            for _ in range(3)]
    out = eng.run()
    assert all(len(out[r]) == 4 for r in rids)


def test_int8_compute_prefill_drift_bounded():
    """int8_compute=True (int8 MXU GEMMs with per-row activation quant)
    stays within the activation-quantization drift bound of the
    weight-only dequant engine on the same quantized params, and the
    argmax token predictions agree on a margin-filtered majority."""
    params = init_params(CFG, seed=2)
    qparams = quantize_params(params)
    ids = jnp.asarray(np.random.default_rng(2).integers(
        0, CFG.vocab, (2, 16)), jnp.int32)
    import dataclasses
    base = make_prefill(CFG, use_pallas=False)
    i8cfg = dataclasses.replace(CFG, int8_compute=True)
    i8 = make_prefill(i8cfg, use_pallas=False)
    want, _ = base(qparams, ids)
    got, _ = i8(qparams, ids)
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    # logits drift: int8 activations add ~0.4% relative error per GEMM;
    # 2 layers + head compound to ~a few percent of the logit scale
    assert np.abs(g - w).max() / np.abs(w).max() < 0.08
    agree = (g.argmax(-1) == w.argmax(-1)).mean()
    assert agree > 0.8, f"argmax agreement {agree}"


def test_int8_compute_small_batch_falls_back():
    """Below 32 activation rows (decode-class shapes) the int8 flag is a
    no-op: _mm routes to the weight-only dequant dot, so results match
    the base engine EXACTLY."""
    from tpp_mlir_tpu.serving.engine import _mm

    w = quantize(jax.random.normal(jax.random.PRNGKey(3), (64, 96)))
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 64))
    np.testing.assert_array_equal(np.asarray(_mm(x, w, int8=True)),
                                  np.asarray(_mm(x, w, int8=False)))
