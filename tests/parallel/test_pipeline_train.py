"""GPipe pipeline-parallel TRAINING (parallel/pipeline.py): reverse-mode
AD through the tick schedule, pinned against a single-device optax loop
on the same stacked stage params."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpp_mlir_tpu.parallel import (make_mesh, make_pipeline_train_step,
                                   pipeline_init)

D, NSTAGES, NMICRO, MB = 32, 4, 6, 8


def _data(seed=0, n_micro=NMICRO, mb=MB):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    xs = jax.random.normal(k1, (n_micro, mb, D), jnp.float32)
    ys = jax.random.normal(k2, (n_micro, mb, D), jnp.float32)
    return xs, ys


def _reference_steps(optimizer, params, xs, ys, n_steps):
    """Single-device oracle: apply every stage in order, MSE, optax."""
    def loss_fn(p):
        out = xs
        for s in range(p["w"].shape[0]):
            out = jnp.maximum(
                jnp.einsum("nmd,df->nmf", out, p["w"][s]) + p["b"][s], 0)
        return jnp.mean((out - ys) ** 2)

    state = optimizer.init(params)
    losses = []
    for _ in range(n_steps):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = optimizer.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    return params, losses


def test_pipeline_train_matches_single_device():
    optimizer = optax.adamw(1e-2, eps=1e-5)
    params = pipeline_init(D, NSTAGES, seed=0)
    xs, ys = _data()
    want, ref_losses = _reference_steps(optimizer, params, xs, ys, 3)

    mesh = make_mesh({"pp": NSTAGES})
    step, init = make_pipeline_train_step(mesh, D, optimizer,
                                          use_pallas=False)
    state = init(params)
    losses = []
    for _ in range(3):
        params, state, loss = step(params, state, xs, ys)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, ref_losses, atol=1e-5, rtol=1e-5)
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(params[k]),
                                   np.asarray(want[k]),
                                   atol=1e-5, rtol=1e-5)
    assert ref_losses[-1] < ref_losses[0]


def test_pipeline_train_pp_dp():
    """pp x dp: microbatch dim sharded over dp on top of the stage
    pipeline — same oracle."""
    optimizer = optax.sgd(5e-2)
    params = pipeline_init(D, 2, seed=1)
    xs, ys = _data(seed=1, n_micro=4, mb=8)
    want, ref_losses = _reference_steps(optimizer, params, xs, ys, 2)

    mesh = make_mesh({"pp": 2, "dp": 4})
    step, init = make_pipeline_train_step(mesh, D, optimizer,
                                          dp_axis="dp",
                                          use_pallas=False)
    state = init(params)
    losses = []
    for _ in range(2):
        params, state, loss = step(params, state, xs, ys)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, ref_losses, atol=1e-5, rtol=1e-5)
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(params[k]),
                                   np.asarray(want[k]),
                                   atol=1e-5, rtol=1e-5)


def test_pipeline_train_pallas_interpret():
    """Same step through the custom-VJP Pallas layer (interpret mode):
    loss decreases and matches the jnp path."""
    optimizer = optax.sgd(5e-2)
    params = pipeline_init(D, 2, seed=2)
    xs, ys = _data(seed=2, n_micro=3, mb=8)
    mesh = make_mesh({"pp": 2})
    stepj, initj = make_pipeline_train_step(mesh, D, optimizer,
                                            use_pallas=False)
    stepp, initp = make_pipeline_train_step(mesh, D, optimizer,
                                            use_pallas=True)
    pj, sj = dict(params), initj(params)
    pp_, sp = dict(params), initp(params)
    for _ in range(2):
        pj, sj, lj = stepj(pj, sj, xs, ys)
        pp_, sp, lp = stepp(pp_, sp, xs, ys)
    np.testing.assert_allclose(float(lj), float(lp), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pj["w"]), np.asarray(pp_["w"]),
                               atol=1e-4, rtol=1e-4)
