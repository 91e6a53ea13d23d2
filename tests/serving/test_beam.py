"""Beam search (serving/beam.py): beam-1 equals greedy decode, the
reported score is the true teacher-forced log-probability, W=V steps=2
is exhaustively optimal, and EOS freezing works."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.serving import (GptConfig, init_params, make_generate,
                                  make_prefill, stack_params)
from tpp_mlir_tpu.serving.beam import make_beam_generate

CFG = GptConfig(vocab=23, embed=32, heads=4, layers=2, mlp_ratio=2,
                max_seq=24, dtype="f32")
PARAMS = stack_params(init_params(CFG, seed=0))


def _ids(b=2, s=6, seed=0):
    return jnp.asarray(np.random.default_rng(seed).integers(
        0, CFG.vocab, (b, s)), jnp.int32)


def _seq_logp(params, prompt, cont):
    """Teacher-forced log-prob of continuation tokens given prompt."""
    full = jnp.concatenate([prompt, cont], axis=1)
    logits, _ = make_prefill(CFG, use_pallas=False)(params, full)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    s0 = prompt.shape[1]
    total = 0.0
    for t in range(cont.shape[1]):
        total = total + jnp.take_along_axis(
            logp[:, s0 - 1 + t], cont[:, t:t + 1], axis=-1)[:, 0]
    return total


def test_beam1_equals_greedy():
    steps = 6
    ids = _ids()
    greedy = make_generate(CFG, steps=steps, use_pallas=False)
    gtoks = greedy(PARAMS, ids, jax.random.PRNGKey(0))
    beam = make_beam_generate(CFG, steps=steps, beams=1,
                              use_pallas=False)
    btoks, _ = beam(PARAMS, ids)
    np.testing.assert_array_equal(np.asarray(btoks),
                                  np.asarray(gtoks)[:, -steps:])


def test_reported_score_is_true_logp():
    ids = _ids(b=3, s=5, seed=1)
    beam = make_beam_generate(CFG, steps=4, beams=3, use_pallas=False)
    toks, scores = beam(PARAMS, ids)
    want = _seq_logp(PARAMS, ids, toks)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(want),
                               atol=2e-4)


def test_beam_width_vocab_steps2_is_exhaustive():
    """W = V keeps every first token, so 2-step beam search scores ALL
    V*V continuations — must return the brute-force optimum."""
    cfg = GptConfig(vocab=7, embed=32, heads=4, layers=2, mlp_ratio=2,
                    max_seq=16, dtype="f32")
    params = stack_params(init_params(cfg, seed=3))
    ids = jnp.asarray(np.random.default_rng(2).integers(
        0, cfg.vocab, (2, 4)), jnp.int32)
    beam = make_beam_generate(cfg, steps=2, beams=cfg.vocab,
                              use_pallas=False)
    toks, scores = beam(params, ids)

    prefill = make_prefill(cfg, use_pallas=False)
    best = np.full((2,), -np.inf)
    argbest = np.zeros((2, 2), np.int64)
    for c1, c2 in itertools.product(range(cfg.vocab), repeat=2):
        cont = jnp.tile(jnp.asarray([[c1, c2]], jnp.int32), (2, 1))
        full = jnp.concatenate([ids, cont], axis=1)
        logits, _ = prefill(params, full)
        logp = np.asarray(jax.nn.log_softmax(
            logits.astype(jnp.float32), -1))
        s0 = ids.shape[1]
        tot = logp[:, s0 - 1, c1] + logp[:, s0, c2]
        for b in range(2):
            if tot[b] > best[b]:
                best[b] = tot[b]
                argbest[b] = (c1, c2)
    np.testing.assert_allclose(np.asarray(scores), best, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(toks), argbest)


def test_eos_freezes_beam():
    """With eos_id = the greedy first token, the beam finishes at t=1:
    every later position on the best beam is EOS and the score is the
    single-token log-prob (no accumulation after finishing)."""
    ids = _ids(b=1, s=5, seed=4)
    logits, _ = make_prefill(CFG, use_pallas=False)(PARAMS, ids)
    eos = int(jnp.argmax(logits[0, -1]))
    beam = make_beam_generate(CFG, steps=5, beams=2, eos_id=eos,
                              use_pallas=False)
    toks, scores = beam(PARAMS, ids)
    t = np.asarray(toks)[0]
    assert t[0] == eos and (t == eos).all(), t
    logp0 = float(jax.nn.log_softmax(
        logits[0, -1].astype(jnp.float32))[eos])
    np.testing.assert_allclose(float(scores[0]), logp0, atol=2e-4)


def test_length_penalty_changes_norm_not_tokens_without_eos():
    """Without EOS every beam has identical length, so length_penalty
    rescales scores but cannot reorder beams."""
    ids = _ids(b=2, s=5, seed=6)
    b0 = make_beam_generate(CFG, steps=3, beams=3, length_penalty=0.0,
                            use_pallas=False)
    b1 = make_beam_generate(CFG, steps=3, beams=3, length_penalty=1.0,
                            use_pallas=False)
    t0, s0 = b0(PARAMS, ids)
    t1, s1 = b1(PARAMS, ids)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(s1) * 3.0, np.asarray(s0),
                               atol=1e-5)


def test_tpp_serve_beams_cli(capsys):
    from tpp_mlir_tpu.tools import tpp_serve

    rc = tpp_serve.main(["--platform", "cpu", "--embed", "32", "--heads",
                         "4", "--layers", "2", "--mlp-ratio", "2",
                         "--vocab", "97", "--max-seq", "32",
                         "--prompt-len", "6", "--steps", "4", "--batch",
                         "2", "--beams", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "# beam search: width 3" in out
    rows = [ln for ln in out.splitlines()
            if ln and not ln.startswith("#")]
    assert len(rows) == 2 and all(len(r.split()) == 4 for r in rows)
