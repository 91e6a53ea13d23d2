"""Speculative decoding tests: the headline property is EXACTNESS —
greedy speculative output must equal the target model's own greedy
continuation regardless of the draft (the draft only changes speed)."""

import numpy as np

import jax
import jax.numpy as jnp

from tpp_mlir_tpu.serving import (GptConfig, init_params, make_generate,
                                  make_speculative_generate,
                                  quantize_params, stack_params)

TCFG = GptConfig(vocab=96, embed=64, heads=4, layers=3, mlp_ratio=4,
                 max_seq=48, dtype="f32")
DCFG = GptConfig(vocab=96, embed=32, heads=2, layers=1, mlp_ratio=2,
                 max_seq=48, dtype="f32")

STEPS = 10


def _prompt(seed, t=6):
    return jnp.asarray(np.random.default_rng(seed).integers(
        0, TCFG.vocab, (1, t)), jnp.int32)


def test_speculative_equals_target_greedy():
    """An unrelated random draft model: acceptance will be poor, output
    must STILL be exactly the target greedy stream."""
    params = init_params(TCFG, seed=0)
    draft = init_params(DCFG, seed=99)
    ids = _prompt(0)
    want = make_generate(TCFG, STEPS, temperature=0.0, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    got, stats = make_speculative_generate(
        TCFG, DCFG, STEPS, k=3, use_pallas=False)(params, draft, ids)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(stats["accepted"]) <= int(stats["drafted"])
    assert int(stats["macro_steps"]) >= 1


def test_speculative_self_draft_accepts_everything():
    """Draft == target: every proposal matches the target argmax, so
    every macro step emits k+1 tokens and acceptance is 100%."""
    params = init_params(TCFG, seed=1)
    ids = _prompt(1)
    k = 4
    got, stats = make_speculative_generate(
        TCFG, TCFG, STEPS, k=k, use_pallas=False)(params, params, ids)
    want = make_generate(TCFG, STEPS, temperature=0.0, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(stats["accepted"]) == int(stats["drafted"])


def test_speculative_with_quantized_draft():
    """The production combo: full-precision target, int8 draft — still
    exactly the target's greedy output."""
    params = init_params(TCFG, seed=2)
    draft = stack_params(quantize_params(init_params(DCFG, seed=3)))
    ids = _prompt(2)
    want = make_generate(TCFG, STEPS, temperature=0.0, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    got, _ = make_speculative_generate(
        TCFG, DCFG, STEPS, k=3, use_pallas=False)(params, draft, ids)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_speculative_prompt_budget_guard():
    params = init_params(TCFG, seed=4)
    draft = init_params(DCFG, seed=5)
    gen = make_speculative_generate(TCFG, DCFG, steps=40, k=4,
                                    use_pallas=False)
    try:
        gen(params, draft, _prompt(4, t=8))
    except AssertionError as e:
        assert "max_seq" in str(e)
    else:
        raise AssertionError("expected the max_seq budget assert")


def test_speculative_self_draft_long_horizon():
    """Regression: with only k draft steps per round, the last consumed
    proposal's KV row was never written to the draft cache, so after the
    first fully-accepted round the draft attended a garbage row forever
    and acceptance silently degraded (measured 35/52 at 60 steps before
    the k+1-step fix). A long horizon forces many fully-accepted rounds;
    self-draft acceptance must stay exactly 100% the whole way."""
    cfg = GptConfig(vocab=96, embed=64, heads=4, layers=2, mlp_ratio=2,
                    max_seq=96, dtype="f32")
    params = init_params(cfg, seed=4)
    ids = jnp.asarray(np.random.default_rng(4).integers(
        0, cfg.vocab, (1, 6)), jnp.int32)
    steps, k = 60, 4
    got, stats = make_speculative_generate(
        cfg, cfg, steps, k=k, use_pallas=False)(params, params, ids)
    want = make_generate(cfg, steps, temperature=0.0, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(stats["accepted"]) == int(stats["drafted"]), stats


def test_speculative_truncated_draft_vocab_exact():
    """draft_vocab truncates the DRAFT head only: proposals are limited
    to the vocab prefix, output must STILL be exactly the target greedy
    stream (out-of-prefix target tokens simply mismatch and are emitted
    by the verify pass)."""
    params = init_params(TCFG, seed=5)
    draft = init_params(DCFG, seed=6)
    ids = _prompt(5)
    want = make_generate(TCFG, STEPS, temperature=0.0, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    for dv in (16, 96):
        got, stats = make_speculative_generate(
            TCFG, DCFG, STEPS, k=3, use_pallas=False,
            draft_vocab=dv)(params, draft, ids)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_speculative_truncated_self_draft_only_loses_rare_tokens():
    """Self-draft with a truncated head: rounds whose target token falls
    inside the prefix still accept; the stream stays exact."""
    params = init_params(TCFG, seed=1)
    ids = _prompt(1)
    got, stats = make_speculative_generate(
        TCFG, TCFG, STEPS, k=4, use_pallas=False,
        draft_vocab=TCFG.vocab)(params, params, ids)
    want = make_generate(TCFG, STEPS, temperature=0.0, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # full-width "truncation" is a no-op: acceptance stays 100%
    assert int(stats["accepted"]) == int(stats["drafted"])


def test_speculative_trunk_draft_exact():
    """Tied-trunk (self-speculative) draft: the target's first N blocks
    + shared head propose; output must be exactly the target greedy
    stream, with NO separate draft params or prefill."""
    params = stack_params(init_params(TCFG, seed=7))
    ids = _prompt(7)
    want = make_generate(TCFG, STEPS, temperature=0.0, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    for n in (1, 2):
        got, stats = make_speculative_generate(
            TCFG, None, STEPS, k=3, use_pallas=False,
            trunk_layers=n)(params, ids)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert int(stats["accepted"]) <= int(stats["drafted"])


def test_speculative_full_trunk_accepts_everything():
    """trunk_layers == layers makes the draft the target itself (shared
    cache init included): acceptance must be 100%."""
    params = stack_params(init_params(TCFG, seed=8))
    ids = _prompt(8)
    got, stats = make_speculative_generate(
        TCFG, None, STEPS, k=4, use_pallas=False,
        trunk_layers=TCFG.layers)(params, ids)
    want = make_generate(TCFG, STEPS, temperature=0.0, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(stats["accepted"]) == int(stats["drafted"])


def test_speculative_trunk_composes_with_draft_vocab():
    """Trunk draft + truncated draft head: still exactly target-greedy."""
    params = stack_params(init_params(TCFG, seed=9))
    ids = _prompt(9)
    want = make_generate(TCFG, STEPS, temperature=0.0, use_pallas=False)(
        params, ids, jax.random.PRNGKey(0))
    got, _ = make_speculative_generate(
        TCFG, None, STEPS, k=3, use_pallas=False, trunk_layers=2,
        draft_vocab=32)(params, ids)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
