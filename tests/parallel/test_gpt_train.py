"""GPT dp x tp training step (parallel/gpt_train.py): forward parity
with the serving prefill, and the sharded optax update pinned against
the 1x1-mesh oracle — MHA, GQA, and ZeRO-1 modes."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpp_mlir_tpu.parallel import make_mesh
from tpp_mlir_tpu.parallel.gpt_train import (make_gpt_train_step,
                                             next_token_loss)
from tpp_mlir_tpu.serving import (GptConfig, init_params, make_prefill,
                                  stack_params)

CFG = GptConfig(vocab=64, embed=32, heads=4, layers=2, mlp_ratio=2,
                max_seq=16, dtype="f32")


def _ids(batch=8, s=12, seed=0):
    return jnp.asarray(np.random.default_rng(seed).integers(
        0, CFG.vocab, (batch, s)), jnp.int32)


def _run(mesh_shape, cfg, params, ids, n_steps, **kw):
    mesh = make_mesh(mesh_shape)
    # eps=1e-4, not the 1e-8 default: bk's TRUE gradient is exactly zero
    # (softmax is invariant to a per-head constant shift of k), so adam
    # at tiny eps normalizes float-noise grads (~1e-9, different under
    # any two compilations) into O(lr) updates — that is adam-on-noise,
    # not a sharding defect (SGD matches across meshes to 1e-7). The
    # larger eps keeps the differential meaningful for real directions.
    step, init = make_gpt_train_step(mesh, cfg,
                                     optax.adamw(1e-2, eps=1e-4), **kw)
    state = init(params)
    losses = []
    for _ in range(n_steps):
        params, state, loss = step(params, state, ids)
        losses.append(float(loss))
    return params, state, losses


def _assert_tree_close(got, want, tol=2e-5):
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=tol, rtol=tol)


def test_step0_loss_matches_prefill_ce():
    """The sharded forward is the serving prefill: the first reported
    loss equals the cross-entropy of make_prefill's logits."""
    params = stack_params(init_params(CFG, seed=0))
    ids = _ids()
    logits, _ = make_prefill(CFG, use_pallas=False)(params, ids)
    want = float(next_token_loss(logits, ids))
    _, _, losses = _run({"dp": 4, "tp": 2}, CFG, params, ids, 1)
    np.testing.assert_allclose(losses[0], want, rtol=1e-5)


def test_gpt_train_matches_single_device():
    params = stack_params(init_params(CFG, seed=1))
    ids = _ids(seed=1)
    want, _, ref_losses = _run({"dp": 1, "tp": 1}, CFG, params, ids, 3)
    got, _, losses = _run({"dp": 4, "tp": 2}, CFG, params, ids, 3)
    np.testing.assert_allclose(losses, ref_losses, atol=1e-5, rtol=1e-5)
    _assert_tree_close(got, want)
    assert ref_losses[-1] < ref_losses[0]   # it actually learns


def test_gpt_train_flash_attention_matches_composed():
    """flash_attn=True (the Pallas flash training VJP, interpret mode
    on CPU) must track the composed-attention oracle step for step —
    losses and updated params — including over a dp x tp mesh."""
    params = stack_params(init_params(CFG, seed=7))
    ids = _ids(seed=7)
    want, _, ref_losses = _run({"dp": 1, "tp": 1}, CFG, params, ids, 2,
                               flash_attn=False)
    got, _, losses = _run({"dp": 1, "tp": 1}, CFG, params, ids, 2,
                          flash_attn=True)
    np.testing.assert_allclose(losses, ref_losses, atol=2e-5, rtol=2e-5)
    _assert_tree_close(got, want, tol=5e-5)
    got2, _, losses2 = _run({"dp": 2, "tp": 2}, CFG, params, ids, 2,
                            flash_attn=True)
    np.testing.assert_allclose(losses2, ref_losses, atol=2e-5,
                               rtol=2e-5)
    _assert_tree_close(got2, want, tol=5e-5)


def test_gpt_train_gqa():
    cfg = GptConfig(vocab=64, embed=32, heads=4, layers=2, mlp_ratio=2,
                    max_seq=16, dtype="f32", kv_heads=2)
    params = stack_params(init_params(cfg, seed=2))
    ids = _ids(seed=2)
    want, _, ref_losses = _run({"dp": 1, "tp": 1}, cfg, params, ids, 2)
    got, _, losses = _run({"dp": 2, "tp": 2}, cfg, params, ids, 2)
    np.testing.assert_allclose(losses, ref_losses, atol=1e-5, rtol=1e-5)
    _assert_tree_close(got, want)


def test_gpt_train_zero1_shards_moments():
    params = stack_params(init_params(CFG, seed=3))
    ids = _ids(seed=3)
    want, _, ref_losses = _run({"dp": 4, "tp": 2}, CFG, params, ids, 2)
    got, state, losses = _run({"dp": 4, "tp": 2}, CFG, params, ids, 2,
                              zero1=True)
    np.testing.assert_allclose(losses, ref_losses, atol=1e-5, rtol=1e-5)
    _assert_tree_close(got, want)
    # stacked block moments: (L, in, out) leaves gain a dp split on the
    # first dp-divisible unsharded dim
    mu_wq = state[0].mu["blocks"]["wq"]
    n_shard = mu_wq.addressable_shards[0].data.size
    assert n_shard < mu_wq.size, "zero1 moment not sharded"


def test_gpt_train_moe():
    """Sparse-expert GPT trains: dp-sharded MoE step matches the 1x1
    oracle and the loss decreases (gates differentiable, expert grads
    flow through the scan form)."""
    cfg = GptConfig(vocab=64, embed=32, heads=4, layers=2, mlp_ratio=2,
                    max_seq=16, dtype="f32", n_experts=4, top_k=2)
    params = stack_params(init_params(cfg, seed=5))
    ids = _ids(seed=5)
    want, _, ref_losses = _run({"dp": 1, "tp": 1}, cfg, params, ids, 3)
    got, _, losses = _run({"dp": 4, "tp": 1}, cfg, params, ids, 3)
    np.testing.assert_allclose(losses, ref_losses, atol=1e-5, rtol=1e-5)
    _assert_tree_close(got, want)
    assert ref_losses[-1] < ref_losses[0]

    with pytest.raises(AssertionError, match="ep"):
        _run({"dp": 2, "tp": 2}, cfg, params, ids, 1)


def test_gpt_train_vocab_parallel_matches_replicated_head():
    """Megatron vocab-parallel LM head + CE: the tp-sharded head must
    produce exactly the replicated-head step's losses and params."""
    params = stack_params(init_params(CFG, seed=6))
    ids = _ids(seed=6)
    want, _, ref_losses = _run({"dp": 2, "tp": 2}, CFG, params, ids, 3)
    got, state, losses = _run({"dp": 2, "tp": 2}, CFG, params, ids, 3,
                              vocab_parallel=True)
    np.testing.assert_allclose(losses, ref_losses, atol=1e-5, rtol=1e-5)
    _assert_tree_close(got, want)
    # the head is physically column-sharded over tp
    lm = got["lm_head"]
    assert lm.addressable_shards[0].data.shape[1] == CFG.vocab // 2
