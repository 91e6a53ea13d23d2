"""Distributed optimizer step (parallel/optim.py) on the 8-virtual-device
CPU mesh: optax integration, gradient accumulation, and ZeRO-1 sharded
optimizer state — each pinned differentially to the plain unsharded
optax step on one device."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpp_mlir_tpu.parallel import make_mesh, mlp_init
from tpp_mlir_tpu.parallel.optim import (make_optim_train_step,
                                         opt_state_shardings)

LAYERS = (64, 128, 64, 64)


def _data(batch=32, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(k1, (batch, LAYERS[0]), jnp.float32)
    y = jax.random.normal(k2, (batch, LAYERS[-1]), jnp.float32)
    return x, y


def _reference_steps(optimizer, params, x, y, n_steps):
    """Plain single-device optax loop on the same model math."""
    def loss_fn(p):
        h = x
        for i, (w, b) in enumerate(p):
            h = jnp.maximum(h @ w + b, 0)
        return jnp.mean((h - y) ** 2)

    state = optimizer.init(params)
    losses = []
    for _ in range(n_steps):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = optimizer.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    return params, losses


def _run_sharded(mesh, optimizer, params, x, y, n_steps, **kw):
    step, init_state = make_optim_train_step(
        mesh, LAYERS, optimizer, use_pallas=False, **kw)
    state = init_state(params)
    losses = []
    for _ in range(n_steps):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss))
    return params, state, losses


def _assert_params_close(got, want, tol=1e-5):
    for (gw, gb), (ww, wb) in zip(got, want):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(ww),
                                   atol=tol, rtol=tol)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(wb),
                                   atol=tol, rtol=tol)


@pytest.mark.parametrize("opt_name", ["adamw", "sgd_momentum"])
def test_optim_step_matches_single_device(opt_name):
    optimizer = (optax.adamw(1e-2) if opt_name == "adamw"
                 else optax.sgd(1e-2, momentum=0.9))
    params = mlp_init(LAYERS, seed=0)
    x, y = _data()
    want, ref_losses = _reference_steps(optimizer, params, x, y, 3)
    mesh = make_mesh({"dp": 4, "tp": 2})
    got, _, losses = _run_sharded(mesh, optimizer, params, x, y, 3)
    np.testing.assert_allclose(losses, ref_losses, atol=1e-5, rtol=1e-5)
    _assert_params_close(got, want)


def test_grad_accumulation_matches_full_batch():
    """accum_steps=4 over the same samples == one full-batch step."""
    optimizer = optax.adamw(1e-2)
    params = mlp_init(LAYERS, seed=1)
    x, y = _data(batch=32, seed=1)
    mesh = make_mesh({"dp": 2, "tp": 2})
    want, _, _ = _run_sharded(mesh, optimizer, params, x, y, 2)
    got, _, _ = _run_sharded(mesh, optimizer, params, x, y, 2,
                             accum_steps=4)
    _assert_params_close(got, want)


def test_zero1_matches_replicated_and_shards_moments():
    optimizer = optax.adamw(1e-2)
    params = mlp_init(LAYERS, seed=2)
    x, y = _data(batch=32, seed=2)
    mesh = make_mesh({"dp": 4, "tp": 2})

    want, _, ref_losses = _run_sharded(mesh, optimizer, params, x, y, 3)
    got, state, losses = _run_sharded(mesh, optimizer, params, x, y, 3,
                                      zero1=True)
    np.testing.assert_allclose(losses, ref_losses, atol=1e-5, rtol=1e-5)
    _assert_params_close(got, want)

    # the point of ZeRO-1: each adam moment leaf is physically split
    # over dp — a local shard holds 1/dp of the (tp-local) elements
    mu = state[0].mu  # adamw state: (ScaleByAdamState, ...)
    w0 = mu[0][0]     # first layer weight moment
    ndp, ntp = mesh.shape["dp"], mesh.shape["tp"]
    shard_elems = w0.addressable_shards[0].data.size
    assert shard_elems == w0.size // (ndp * ntp), \
        (shard_elems, w0.size, ndp, ntp)


def test_zero1_spec_picks_first_free_divisible_dim():
    from jax.sharding import PartitionSpec as P

    from tpp_mlir_tpu.parallel.optim import _zero1_spec

    assert _zero1_spec(P(None, "tp"), (64, 128), "dp", 4) == \
        P("dp", "tp")
    assert _zero1_spec(P("tp", None), (64, 128), "dp", 4) == \
        P("tp", "dp")
    # nothing divisible -> unchanged (replicated over dp)
    assert _zero1_spec(P("tp",), (66,), "dp", 4) == P("tp")


def test_zero1_checkpoint_resume_matches_uninterrupted(tmp_path):
    """The production loop: train, checkpoint {params, opt_state}, crash,
    restore, continue — the resumed run must match the uninterrupted one
    leaf-by-leaf, and the restored ZeRO-1 moments must keep their
    dp-sharding (orbax restores to the `like` tree's shardings)."""
    from tpp_mlir_tpu.parallel.checkpoint import (restore_checkpoint,
                                                  save_checkpoint)

    optimizer = optax.adamw(1e-2)
    params0 = mlp_init(LAYERS, seed=9)
    x, y = _data(batch=32, seed=9)
    mesh = make_mesh({"dp": 4, "tp": 2})
    step, init_state = make_optim_train_step(
        mesh, LAYERS, optimizer, zero1=True, use_pallas=False)

    # uninterrupted: 4 steps
    p, s = params0, init_state(params0)
    for _ in range(4):
        p, s, _ = step(p, s, x, y)

    # interrupted: 2 steps, checkpoint, restore, 2 more
    q, t = params0, init_state(params0)
    for _ in range(2):
        q, t, _ = step(q, t, x, y)
    save_checkpoint(str(tmp_path / "ck"), {"params": q, "opt": t}, step=2)
    like = {"params": q, "opt": t}
    restored, got_step = restore_checkpoint(str(tmp_path / "ck"), like,
                                            step=2)
    assert got_step == 2
    q2, t2 = restored["params"], restored["opt"]
    # moments stay dp-sharded after restore
    mu = t2[0].mu[0][0]
    assert mu.addressable_shards[0].data.size == mu.size // 8
    for _ in range(2):
        q2, t2, _ = step(q2, t2, x, y)

    for a, b in zip(jax.tree.leaves(q2), jax.tree.leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
