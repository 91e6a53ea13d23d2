"""LoRA / QLoRA fine-tuning (serving/lora.py): zero-delta init is exactly
the base model, the train step moves ONLY the adapters, merged weights
reproduce the adapted forward through every engine path, loss actually
decreases, and the QTensor (int8) base composes — the QLoRA path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpp_mlir_tpu.parallel.gpt_train import next_token_loss
from tpp_mlir_tpu.serving import (GptConfig, init_params, lora_init,
                                  make_lora_train_step, make_prefill,
                                  merge_lora, quantize_params, stack_params)

CFG = GptConfig(vocab=89, embed=32, heads=4, layers=2, mlp_ratio=2,
                max_seq=24, dtype="f32")


def _ids(b=2, s=12, seed=0):
    return jnp.asarray(np.random.default_rng(seed).integers(
        0, CFG.vocab, (b, s)), jnp.int32)


def test_zero_delta_init_is_base_model():
    params = init_params(CFG, seed=0)
    ad = lora_init(params, rank=4, targets="all", seed=1)
    merged = merge_lora(params, ad)
    base, _ = make_prefill(CFG, use_pallas=False)(params, _ids())
    got, _ = make_prefill(CFG, use_pallas=False)(merged, _ids())
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=1e-6)


def test_adapter_shapes_and_target_selection():
    params = init_params(CFG, seed=0)
    ad = lora_init(params, rank=4, targets=("wq", "wv"))
    blk = ad["blocks"][0]
    assert set(blk) == {"wq", "wv"}
    E = CFG.embed
    assert blk["wq"]["a"].shape == (E, 4)
    assert blk["wq"]["b"].shape == (4, E)
    assert float(jnp.max(jnp.abs(blk["wq"]["b"]))) == 0.0
    # stacked params -> stacked adapters with the leading L dim
    sad = lora_init(stack_params(params), rank=4, targets=("wq",))
    assert sad["blocks"]["wq"]["a"].shape == (CFG.layers, E, 4)


def test_train_step_moves_only_adapters_and_loss_drops():
    params = stack_params(init_params(CFG, seed=0))
    ad = lora_init(params, rank=8, targets=("wq", "wv", "w2"))
    step, init = make_lora_train_step(CFG, optax.adam(3e-2),
                                      use_pallas=False)
    st = init(ad)
    ids = _ids(b=4, s=16)
    prefill = make_prefill(CFG, use_pallas=False)
    logits0, _ = prefill(params, ids)
    loss0 = float(next_token_loss(logits0, ids))
    losses = []
    for _ in range(8):
        ad, st, loss = step(params, ad, st, ids)
        losses.append(float(loss))
    assert abs(losses[0] - loss0) < 1e-4, (losses[0], loss0)
    assert losses[-1] < 0.7 * loss0, (losses[-1], loss0)
    # adapters moved; the base params object was never touched
    assert float(jnp.max(jnp.abs(ad["blocks"]["wq"]["b"]))) > 0


def test_merge_matches_trained_adapter_forward():
    """Baking the deltas in (merge_lora eager) must equal the in-graph
    adapted forward, and the merged pytree keeps the engine layout
    (decode runs on it unchanged)."""
    from tpp_mlir_tpu.serving import make_decode_step

    params = stack_params(init_params(CFG, seed=0))
    ad = lora_init(params, rank=4, targets=("wq", "wv"))
    step, init = make_lora_train_step(CFG, optax.sgd(1e-1),
                                      use_pallas=False)
    st = init(ad)
    ids = _ids(b=2, s=10, seed=3)
    for _ in range(3):
        ad, st, _ = step(params, ad, st, ids)
    merged = merge_lora(params, ad)
    want, _ = make_prefill(CFG, use_pallas=False)(
        merge_lora(params, ad, train=True), ids)
    got, cache = make_prefill(CFG, use_pallas=False)(merged, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)
    tok = jnp.full((2,), 5, jnp.int32)
    logits, _ = make_decode_step(CFG)(merged, cache, tok)
    assert np.isfinite(np.asarray(logits)).all()


def test_qlora_int8_base():
    """Adapters over a QTensor base: init reads payload shapes, the
    train step moves the loss with the int8 payload untouched, and the
    merged model is float (ready to re-quantize)."""
    params = stack_params(quantize_params(init_params(CFG, seed=0)))
    ad = lora_init(params, rank=8, targets=("wq", "wv"))
    step, init = make_lora_train_step(CFG, optax.adam(3e-2),
                                      use_pallas=False)
    st = init(ad)
    ids = _ids(b=4, s=16, seed=5)
    q0 = np.asarray(params["blocks"]["wq"].q).copy()
    first = last = None
    for i in range(8):
        ad, st, loss = step(params, ad, st, ids)
        first = first if first is not None else float(loss)
        last = float(loss)
    assert last < 0.8 * first, (first, last)
    np.testing.assert_array_equal(np.asarray(params["blocks"]["wq"].q), q0)
    merged = merge_lora(params, ad)
    assert not hasattr(merged["blocks"]["wq"], "q")
    logits, _ = make_prefill(CFG, use_pallas=False)(merged, ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_lora_llama_and_moe_families():
    """Shape-generic adapters: SwiGLU (w1/w3/w2) and per-expert MoE
    (n, E, F) weights adapt through the same code."""
    lcfg = GptConfig.llama(vocab=67, embed=32, heads=4, layers=2,
                           mlp_ratio=2, max_seq=16, dtype="f32",
                           kv_heads=2)
    lp = stack_params(init_params(lcfg, seed=1))
    lad = lora_init(lp, rank=4, targets="all")
    assert "w3" in lad["blocks"]
    ids = jnp.asarray(np.random.default_rng(7).integers(
        0, lcfg.vocab, (2, 10)), jnp.int32)
    base, _ = make_prefill(lcfg, use_pallas=False)(lp, ids)
    got, _ = make_prefill(lcfg, use_pallas=False)(merge_lora(lp, lad), ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-6)

    mcfg = GptConfig(vocab=67, embed=32, heads=4, layers=2, mlp_ratio=2,
                     max_seq=16, dtype="f32", n_experts=4, top_k=2)
    mp = stack_params(init_params(mcfg, seed=2))
    mad = lora_init(mp, rank=4, targets=("w1", "w2"))
    a = mad["blocks"]["w1"]["a"]
    assert a.shape[:2] == (mcfg.layers, 4) and a.shape[-1] == 4
    mbase, _ = make_prefill(mcfg, use_pallas=False)(mp, ids % mcfg.vocab)
    mgot, _ = make_prefill(mcfg, use_pallas=False)(
        merge_lora(mp, mad), ids % mcfg.vocab)
    np.testing.assert_allclose(np.asarray(mgot), np.asarray(mbase),
                               atol=1e-6)
