"""Mixtral-class sparse-expert GPT through the serving engine: the two
exact MoE FFN forms (scan-over-experts for prefill, gather for decode)
against a dense-selection oracle, prefill/decode teacher forcing,
generation, continuous batching, and the composability guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.serving import (BatchingEngine, GptConfig, init_params,
                                  make_decode_step, make_extend,
                                  make_generate, make_prefill,
                                  quantize_params, stack_params)
from tpp_mlir_tpu.serving.engine import (_moe_ffn_gather, _moe_ffn_scan,
                                         _moe_gates)

CFG = GptConfig(vocab=97, embed=32, heads=4, layers=2, mlp_ratio=2,
                max_seq=32, dtype="f32", n_experts=4, top_k=2)


def _blk(seed=0, E=32, F=64, n_e=4):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {"wr": jax.random.normal(k[0], (E, n_e), jnp.float32),
            "w1": jax.random.normal(k[1], (n_e, E, F), jnp.float32) * 0.1,
            "w2": jax.random.normal(k[2], (F, E), jnp.float32)[None]
            .repeat(n_e, 0) * 0.1}


def _moe_oracle(h, blk, top_k):
    """Dense oracle: every expert FFN on every token, explicit top-k
    gate selection in numpy."""
    gates, idx = _moe_gates(h, blk["wr"], top_k)
    h = np.asarray(h, np.float32)
    out = np.zeros_like(h)
    for t in range(h.shape[0]):
        for j in range(top_k):
            e = int(idx[t, j])
            a = h[t] @ np.asarray(blk["w1"][e], np.float32)
            a = np.asarray(jax.nn.gelu(jnp.asarray(a), approximate=False))
            out[t] += float(gates[t, j]) * (
                a @ np.asarray(blk["w2"][e], np.float32))
    return out


def test_moe_forms_match_oracle_and_each_other():
    blk = _blk()
    h = jax.random.normal(jax.random.PRNGKey(9), (8, 32), jnp.float32)
    want = _moe_oracle(h, blk, 2)
    scan = np.asarray(_moe_ffn_scan(h, blk, 2))
    gath = np.asarray(_moe_ffn_gather(h, blk, 2))
    np.testing.assert_allclose(scan, want, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(gath, want, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(scan, gath, atol=1e-6, rtol=1e-6)


def test_moe_gates_renormalized_topk():
    blk = _blk(seed=1)
    h = jax.random.normal(jax.random.PRNGKey(2), (16, 32), jnp.float32)
    gates, idx = _moe_gates(h, blk["wr"], 2)
    np.testing.assert_allclose(np.asarray(jnp.sum(gates, -1)), 1.0,
                               atol=1e-6)
    assert (np.asarray(idx[:, 0]) != np.asarray(idx[:, 1])).all()


def test_moe_decode_teacher_forcing_matches_prefill():
    """Feeding prefill's tokens one-by-one through the decode step must
    reproduce the prefill logits (the gather form == the scan form
    through the whole model)."""
    params = stack_params(init_params(CFG, seed=3))
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, CFG.vocab, (2, 9)), jnp.int32)
    logits, _ = make_prefill(CFG, use_pallas=False)(params, ids)

    uparams = init_params(CFG, seed=3)
    _, cache = make_prefill(CFG, use_pallas=False)(
        stack_params(uparams), ids[:, :1])
    step = make_decode_step(CFG)
    for t in range(1, ids.shape[1]):
        # ids[:, t] sits at position t; the step returns the prediction
        # after consuming tokens 0..t == prefill logits[:, t]
        got, cache = step(uparams, cache, ids[:, t])
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(logits[:, t]),
                                   atol=2e-4, rtol=2e-4)


def test_moe_extend_matches_prefill():
    params = stack_params(init_params(CFG, seed=4))
    ids = jnp.asarray(np.random.default_rng(4).integers(
        0, CFG.vocab, (2, 10)), jnp.int32)
    logits, _ = make_prefill(CFG, use_pallas=False)(params, ids)
    _, cache = make_prefill(CFG, use_pallas=False)(params, ids[:, :4])
    got, _ = make_extend(CFG)(params, cache, ids[:, 4:])
    np.testing.assert_allclose(np.asarray(got), np.asarray(logits[:, 4:]),
                               atol=2e-4, rtol=2e-4)


def test_moe_generate_and_batching():
    params = init_params(CFG, seed=5)
    gen = make_generate(CFG, steps=5, use_pallas=False)
    ids = jnp.asarray(np.random.default_rng(5).integers(
        0, CFG.vocab, (1, 6)), jnp.int32)
    want = np.asarray(gen(stack_params(params), ids,
                          jax.random.PRNGKey(0)))[0].tolist()

    eng = BatchingEngine(params, CFG, slots=2, sync_steps=2,
                         buckets=(8,), use_pallas=False)
    rid = eng.submit(np.asarray(ids[0]), max_new=5)
    got = eng.run()[rid]
    assert got == want


def test_moe_quantize_skips_experts_keeps_attention():
    from tpp_mlir_tpu.serving import QTensor

    q = quantize_params(init_params(CFG, seed=6))
    blk = q["blocks"][0]
    assert isinstance(blk["wq"], QTensor) and isinstance(q["lm_head"],
                                                         QTensor)
    assert not isinstance(blk["w1"], QTensor)
    # quantized attention + raw experts still serves
    gen = make_generate(CFG, steps=3, use_pallas=False)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    out = gen(stack_params(q), ids, jax.random.PRNGKey(0))
    assert np.asarray(out).shape == (1, 3)


def test_moe_tp_decode_guarded():
    from tpp_mlir_tpu.parallel import make_mesh
    from tpp_mlir_tpu.serving import make_tp_decode_step

    with pytest.raises(AssertionError, match="MoE"):
        make_tp_decode_step(make_mesh({"tp": 2}), CFG)


def test_tpp_serve_moe_cli(capsys):
    from tpp_mlir_tpu.tools import tpp_serve

    rc = tpp_serve.main(["--platform", "cpu", "--embed", "32", "--heads",
                         "4", "--layers", "2", "--mlp-ratio", "2",
                         "--vocab", "97", "--max-seq", "32",
                         "--prompt-len", "6", "--steps", "4",
                         "--experts", "4", "--top-k-experts", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()[-1].split()) == 4


def test_moe_speculative_exact():
    """Speculative decoding over a MoE target (the extend verify pass
    runs the scan-form experts) stays exactly the target's greedy."""
    from tpp_mlir_tpu.serving import make_speculative_generate

    dcfg = GptConfig(vocab=97, embed=32, heads=4, layers=1, mlp_ratio=2,
                     max_seq=32, dtype="f32")
    params = stack_params(init_params(CFG, seed=7))
    draft = stack_params(init_params(dcfg, seed=8))
    ids = jnp.asarray(np.random.default_rng(7).integers(
        0, CFG.vocab, (1, 5)), jnp.int32)
    got, _ = make_speculative_generate(CFG, dcfg, steps=8, k=3,
                                       use_pallas=False)(params, draft,
                                                         ids)
    want = make_generate(CFG, steps=8, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
