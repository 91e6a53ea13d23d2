"""MoE decode-FFN forms (engine._moe_ffn_{scan,gather,slice} and the
_moe_ffn_decode traffic-policy dispatch) are numerically one function,
standalone and through the full decode step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.serving import (GptConfig, init_params, make_decode_step,
                                  make_prefill, stack_params)
from tpp_mlir_tpu.serving.engine import (_moe_ffn_decode, _moe_ffn_gather,
                                         _moe_ffn_scan, _moe_ffn_slice)


def _blk(E=32, F=64, n=8):
    return {
        "wr": jax.random.normal(jax.random.PRNGKey(0), (E, n)) * 0.3,
        "w1": jax.random.normal(jax.random.PRNGKey(1), (n, E, F)) * 0.1,
        "w2": jax.random.normal(jax.random.PRNGKey(2), (n, F, E)) * 0.1,
    }


@pytest.mark.parametrize("B", [1, 4, 8])
def test_ffn_forms_agree(B):
    blk = _blk()
    h = jax.random.normal(jax.random.PRNGKey(B), (B, 32))
    ref = np.asarray(_moe_ffn_scan(h, blk, 2))
    np.testing.assert_allclose(np.asarray(_moe_ffn_gather(h, blk, 2)),
                               ref, atol=2e-5)
    if B == 1:
        np.testing.assert_allclose(np.asarray(_moe_ffn_slice(h, blk, 2)),
                                   ref, atol=2e-5)
    cfg = GptConfig(embed=32, heads=4, n_experts=8, top_k=2)
    np.testing.assert_allclose(np.asarray(_moe_ffn_decode(h, blk, cfg)),
                               ref, atol=2e-5)


def test_auto_policy_selection():
    """auto picks slice at B=1, scan once B*k covers the expert table,
    gather in between — pure traffic policy, no tracing needed."""
    blk = _blk()
    cfg = GptConfig(embed=32, heads=4, n_experts=8, top_k=2)
    # policy is internal; assert through equality of the dispatched
    # result with the form it should pick (all forms agree numerically,
    # so instead check the dispatch branches don't crash at each B)
    for B in (1, 2, 4):
        h = jax.random.normal(jax.random.PRNGKey(B), (B, 32))
        out = _moe_ffn_decode(h, blk, cfg)
        assert out.shape == (B, 32)


@pytest.mark.parametrize("T", [16, 64, 256])
def test_sorted_prefill_form(T):
    """GShard sorted dispatch == exact scan at ample capacity; default
    capacity stays finite and converges to exact as T grows (balanced
    routing)."""
    from tpp_mlir_tpu.serving.engine import _moe_ffn_sorted

    blk = _blk()
    h = jax.random.normal(jax.random.PRNGKey(T), (T, 32))
    ref = np.asarray(_moe_ffn_scan(h, blk, 2))
    ample = np.asarray(_moe_ffn_sorted(h, blk, 2, capacity_factor=8.0))
    np.testing.assert_allclose(ample, ref, atol=3e-5)
    dflt = np.asarray(_moe_ffn_sorted(h, blk, 2, capacity_factor=1.25))
    assert np.isfinite(dflt).all()
    if T >= 256:
        np.testing.assert_allclose(dflt, ref, atol=3e-5)


def test_sorted_prefill_through_engine():
    """moe_prefill_form='sorted' with ample capacity matches the exact
    default through make_prefill."""
    kw = dict(vocab=67, embed=32, heads=4, layers=2, mlp_ratio=2,
              max_seq=32, dtype="f32", n_experts=4, top_k=2)
    exact = GptConfig(**kw)
    sortd = GptConfig(moe_prefill_form="sorted", moe_capacity_factor=4.0,
                      **kw)
    params = stack_params(init_params(exact, seed=0))
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, exact.vocab, (2, 24)), jnp.int32)
    want, _ = make_prefill(exact, use_pallas=False)(params, ids)
    got, _ = make_prefill(sortd, use_pallas=False)(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


@pytest.mark.parametrize("T,bm", [(16, 8), (64, 8), (64, 16), (256, 32)])
def test_grouped_prefill_form_exact(T, bm):
    """The dropless grouped-expert form is EXACT vs the scan oracle (no
    capacity drops) at every row-block quantum, including multi-block
    expert groups and the static padding tail."""
    from tpp_mlir_tpu.serving.engine import _moe_ffn_grouped

    blk = _blk()
    cfg = GptConfig(embed=32, heads=4, n_experts=8, top_k=2,
                    moe_group_bm=bm)
    h = jax.random.normal(jax.random.PRNGKey(T + bm), (T, 32))
    ref = np.asarray(_moe_ffn_scan(h, blk, 2))
    got = np.asarray(_moe_ffn_grouped(h, blk, cfg))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_grouped_prefill_form_unbalanced_routing():
    """Extreme routing skew (router biased so most tokens pick one
    expert) still matches exactly — the per-expert padding bound covers
    any distribution, dropping nothing."""
    from tpp_mlir_tpu.serving.engine import _moe_ffn_grouped

    blk = _blk()
    # bias the router hard toward expert 3
    blk = dict(blk, wr=blk["wr"].at[:, 3].add(4.0))
    cfg = GptConfig(embed=32, heads=4, n_experts=8, top_k=2,
                    moe_group_bm=8)
    h = jax.random.normal(jax.random.PRNGKey(7), (96, 32))
    ref = np.asarray(_moe_ffn_scan(h, blk, 2))
    got = np.asarray(_moe_ffn_grouped(h, blk, cfg))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_grouped_prefill_through_engine():
    """moe_prefill_form='grouped' matches the exact default through
    make_prefill (logits-level differential, both paths jitted)."""
    kw = dict(vocab=67, embed=32, heads=4, layers=2, mlp_ratio=2,
              max_seq=32, dtype="f32", n_experts=4, top_k=2)
    exact = GptConfig(**kw)
    grouped = GptConfig(moe_prefill_form="grouped", moe_group_bm=8, **kw)
    params = stack_params(init_params(exact, seed=0))
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, exact.vocab, (2, 24)), jnp.int32)
    want, _ = make_prefill(exact, use_pallas=False)(params, ids)
    got, _ = make_prefill(grouped, use_pallas=False)(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


@pytest.mark.parametrize("form", ["gather", "scan", "slice"])
def test_decode_step_forced_form_matches_auto(form):
    cfg_kw = dict(vocab=67, embed=32, heads=4, layers=2, mlp_ratio=2,
                  max_seq=16, dtype="f32", n_experts=4, top_k=2)
    base = GptConfig(**cfg_kw)
    forced = GptConfig(moe_decode_form=form, **cfg_kw)
    params = init_params(base, seed=0)
    sp = stack_params(params)
    B = 1 if form == "slice" else 2
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, base.vocab, (B, 6)), jnp.int32)
    _, cache = make_prefill(base, use_pallas=False)(sp, ids)
    tok = jnp.full((B,), 3, jnp.int32)
    want, _ = make_decode_step(base)(params, cache, tok)
    got, _ = make_decode_step(forced)(params, cache, tok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def _grad_leaves(ffn, h, blk):
    def loss(h, wr, w1, w2):
        o = ffn(h, {"wr": wr, "w1": w1, "w2": w2})
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))
    return jax.grad(loss, argnums=(0, 1, 2, 3))(
        h, blk["wr"], blk["w1"], blk["w2"])


@pytest.mark.parametrize("T,bm", [(16, 8), (96, 8), (64, 16)])
def test_grouped_ffn_grads_match_scan_oracle(T, bm):
    """The custom-VJP grouped form is differentiable and its grads on
    EVERY leaf (h, router, w1, w2) match jax.grad through the exact
    scan oracle — the megablocks training form, pinned leaf-by-leaf
    (CLAUDE.md: a loss-only differential proves nothing about grads)."""
    from tpp_mlir_tpu.serving.engine import _moe_ffn_grouped

    blk = _blk()
    cfg = GptConfig(embed=32, heads=4, n_experts=8, top_k=2,
                    moe_group_bm=bm)
    h = jax.random.normal(jax.random.PRNGKey(T + bm + 1), (T, 32))
    want = _grad_leaves(lambda h, b: _moe_ffn_scan(h, b, 2), h, blk)
    got = _grad_leaves(lambda h, b: _moe_ffn_grouped(h, b, cfg), h, blk)
    for g, w, name in zip(got, want, ("dh", "dwr", "dw1", "dw2")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=5e-5, rtol=5e-4, err_msg=name)


def test_grouped_ffn_grads_unbalanced_routing():
    """Empty experts (router biased hard to one expert) must produce
    EXACTLY ZERO weight grads for untouched experts — the min-1-block
    padding keeps every expert indexed so the wgrad kernel writes every
    output block (its documented coverage contract)."""
    from tpp_mlir_tpu.serving.engine import _moe_ffn_grouped

    blk = _blk()
    blk = dict(blk, wr=blk["wr"].at[:, 3].add(6.0))
    cfg = GptConfig(embed=32, heads=4, n_experts=8, top_k=2,
                    moe_group_bm=8)
    h = jax.random.normal(jax.random.PRNGKey(11), (48, 32))
    want = _grad_leaves(lambda h, b: _moe_ffn_scan(h, b, 2), h, blk)
    got = _grad_leaves(lambda h, b: _moe_ffn_grouped(h, b, cfg), h, blk)
    for g, w, name in zip(got, want, ("dh", "dwr", "dw1", "dw2")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=5e-5, rtol=5e-4, err_msg=name)
    # untouched experts: identically zero (not just small)
    touched = np.unique(np.asarray(
        jax.lax.top_k(h @ blk["wr"], 2)[1]).ravel())
    for e in range(8):
        if e not in touched:
            assert not np.asarray(got[2][e]).any(), e
            assert not np.asarray(got[3][e]).any(), e


def test_grouped_training_through_prefill():
    """End-to-end: jax.grad of a CE loss through make_prefill with the
    grouped form (moe_group_stacked=False — the training layout)
    matches the exact-scan configuration on the expert-weight leaves."""
    kw = dict(vocab=67, embed=32, heads=4, layers=2, mlp_ratio=2,
              max_seq=32, dtype="f32", n_experts=4, top_k=2)
    exact = GptConfig(**kw)
    grouped = GptConfig(moe_prefill_form="grouped", moe_group_bm=8,
                        moe_group_stacked=False, **kw)
    params = stack_params(init_params(exact, seed=0))
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, 67, (2, 24)), jnp.int32)

    def loss_fn(cfg):
        prefill = make_prefill(cfg, use_pallas=False)

        def loss(params):
            logits, _ = prefill(params, ids)
            lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            tgt = ids[:, 1:]
            return -jnp.mean(jnp.take_along_axis(
                lp, tgt[..., None], axis=-1))
        return loss

    g_exact = jax.grad(loss_fn(exact))(params)
    g_group = jax.grad(loss_fn(grouped))(params)
    for leaf in ("w1", "w2", "wr", "wq"):
        np.testing.assert_allclose(
            np.asarray(g_group["blocks"][leaf]),
            np.asarray(g_exact["blocks"][leaf]),
            atol=5e-5, rtol=5e-4, err_msg=leaf)


@pytest.mark.parametrize("remat", [False, True])
def test_grouped_stacked_training_through_prefill(remat):
    """r5 verdict #1a: jax.grad of a CE loss through make_prefill with
    the grouped form in the STACKED layout (moe_group_stacked=True —
    expert tables held out of the scan xs, layer index in the kernel
    BlockSpec, custom-VJP backward on the same stacked kernels) matches
    the exact-scan configuration leaf-by-leaf; remat=True additionally
    wraps each layer in jax.checkpoint (same grads, less live memory)."""
    kw = dict(vocab=67, embed=32, heads=4, layers=3, mlp_ratio=2,
              max_seq=32, dtype="f32", n_experts=4, top_k=2)
    exact = GptConfig(**kw)
    stacked = GptConfig(moe_prefill_form="grouped", moe_group_bm=8,
                        moe_group_stacked=True, remat=remat, **kw)
    params = stack_params(init_params(exact, seed=0))
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, 67, (2, 24)), jnp.int32)

    def loss_fn(cfg):
        prefill = make_prefill(cfg, use_pallas=False)

        def loss(params):
            logits, _ = prefill(params, ids)
            lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            tgt = ids[:, 1:]
            return -jnp.mean(jnp.take_along_axis(
                lp, tgt[..., None], axis=-1))
        return loss

    g_exact = jax.grad(loss_fn(exact))(params)
    g_stack = jax.grad(loss_fn(stacked))(params)
    for leaf in ("w1", "w2", "wr", "wq"):
        np.testing.assert_allclose(
            np.asarray(g_stack["blocks"][leaf]),
            np.asarray(g_exact["blocks"][leaf]),
            atol=5e-5, rtol=5e-4, err_msg=leaf)
    np.testing.assert_allclose(
        np.asarray(g_stack["wte"]), np.asarray(g_exact["wte"]),
        atol=5e-5, rtol=5e-4, err_msg="wte")


def test_grouped_stacked_matches_per_layer_grads():
    """The stacked (layers=L, in-kernel indexing) training path and the
    r5a per-layer path (moe_group_stacked=False, weights in the scan xs)
    are the SAME math: grads must agree to float noise, not just both
    match the oracle within tolerance."""
    kw = dict(vocab=67, embed=32, heads=4, layers=2, mlp_ratio=2,
              max_seq=32, dtype="f32", n_experts=4, top_k=2,
              moe_prefill_form="grouped", moe_group_bm=8)
    per_layer = GptConfig(moe_group_stacked=False, **kw)
    stacked = GptConfig(moe_group_stacked=True, **kw)
    params = stack_params(init_params(per_layer, seed=1))
    ids = jnp.asarray(np.random.default_rng(1).integers(
        0, 67, (2, 16)), jnp.int32)

    def grad_of(cfg):
        prefill = make_prefill(cfg, use_pallas=False)

        def loss(params):
            logits, _ = prefill(params, ids)
            return jnp.mean(jnp.sin(logits.astype(jnp.float32)))
        return jax.grad(loss)(params)

    ga, gb = grad_of(per_layer), grad_of(stacked)
    for leaf in ("w1", "w2", "wr"):
        np.testing.assert_allclose(
            np.asarray(gb["blocks"][leaf]), np.asarray(ga["blocks"][leaf]),
            atol=1e-6, rtol=1e-5, err_msg=leaf)
