"""Sharded execution tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from tpp_mlir_tpu.parallel import (data_parallel_run, make_mesh,
                                   make_train_step, mlp_init, task_grid_mesh)


def test_make_mesh():
    mesh = make_mesh({"dp": 4, "tp": 2})
    assert mesh.shape == {"dp": 4, "tp": 2}
    g = task_grid_mesh((2, 4))
    assert g.shape == {"dp": 2, "tp": 4}


def test_data_parallel_mlp_forward():
    """--def-parallel equivalent: batch sharded over dp, weights replicated."""
    from tpp_mlir_tpu.ir import parse_module
    from tpp_mlir_tpu.passes import run_pipeline
    from tpp_mlir_tpu.runtime import compile as tpp_compile

    text = """func @entry(%x: tensor<64x128xf32>, %w: tensor<128x128xf32>, %b: tensor<128xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<64x128xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<64x128xf32>
  %2 = tl.add %1, %b : tensor<64x128xf32>
  %3 = tl.relu %2 : tensor<64x128xf32>
  return %3 : tensor<64x128xf32>
}
"""
    m = parse_module(text)
    run_pipeline(m, "default-tpp-passes")
    base = tpp_compile(m, jit=False, interpret_kernels=True)

    mesh = make_mesh({"dp": 8})
    fn = data_parallel_run(base, mesh, batch_arg_indices=[0], num_args=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 128), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (128,), jnp.float32)
    got = fn(x, w, b)
    want = jnp.maximum(x @ w + b, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_train_step_dp_tp():
    """Full dp x tp training step: loss decreases, params update."""
    mesh = make_mesh({"dp": 4, "tp": 2})
    layers = (64, 128, 64)
    params = mlp_init(layers, seed=0)
    step = make_train_step(mesh, layers, lr=1e-2, use_pallas=False)

    x = jax.random.normal(jax.random.PRNGKey(3), (32, 64), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(4), (32, 64), jnp.float32)

    losses = []
    for _ in range(5):
        params, loss = step(params, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_train_step_matches_single_device():
    """The sharded step computes the same loss AND the same parameter
    update as an unsharded reference. (Regression: with lr=0 this test
    once hid a real gradient bug — shard_map's check_vma=False
    transposes over-counted collective duals by the tp degree and never
    reduced grads over dp; see parallel/collectives.py.)"""
    mesh = make_mesh({"dp": 2, "tp": 2})
    layers = (32, 64, 32)
    lr = 1e-2
    params = mlp_init(layers, seed=1)
    step = make_train_step(mesh, layers, lr=lr, use_pallas=False)

    x = jax.random.normal(jax.random.PRNGKey(5), (16, 32), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(6), (16, 32), jnp.float32)

    # unsharded reference: same loss and the same SGD update, twice
    def loss_fn(p):
        h = x
        for w, b in p:
            h = jnp.maximum(h @ w + b, 0)
        return jnp.mean((h - y) ** 2)

    ref = params
    ref_losses = []
    for _ in range(2):
        l, g = jax.value_and_grad(loss_fn)(ref)
        ref = jax.tree.map(lambda p, gg: p - lr * gg, ref, g)
        ref_losses.append(float(l))

    losses = []
    for _ in range(2):
        params, loss = step(params, x, y)
        losses.append(float(loss))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5)
    for (gw, gb), (ww, wb) in zip(params, ref):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(ww),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(wb),
                                   atol=1e-5, rtol=1e-5)


def test_train_step_pallas_interpret():
    """Same step with the Pallas custom-VJP kernels (interpret mode)."""
    mesh = make_mesh({"dp": 2, "tp": 2})
    layers = (32, 64, 32)
    params = mlp_init(layers, seed=2)
    step = make_train_step(mesh, layers, lr=1e-2, use_pallas=True)
    x = jax.random.normal(jax.random.PRNGKey(7), (16, 32), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(8), (16, 32), jnp.float32)
    p2, l0 = step(params, x, y)
    _, l1 = step(p2, x, y)
    assert float(l1) < float(l0)


def test_checkpoint_roundtrip(tmp_path):
    import numpy as np

    from tpp_mlir_tpu.parallel.checkpoint import (latest_step,
                                                  restore_checkpoint,
                                                  save_checkpoint)

    params = mlp_init((32, 64, 32), seed=7)
    save_checkpoint(str(tmp_path / "ckpt"), params, step=3)
    assert latest_step(str(tmp_path / "ckpt")) == 3
    like = jax.tree.map(jnp.zeros_like, params)
    restored, step = restore_checkpoint(str(tmp_path / "ckpt"), like, step=3)
    assert step == 3
    for (w1, b1), (w2, b2) in zip(params, restored):
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_tp_sharded_mha_matches_unsharded():
    """Megatron-sharded MHA (heads on tp, batch on dp) over the 8-device
    mesh matches the single-device reference; the token-layout core keeps
    the heads dim local with no relayout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.parallel import make_mesh, make_mha_forward, mha_params

    E, H, B, S = 64, 8, 4, 32
    mesh = make_mesh({"dp": 2, "tp": 4})
    params = mha_params(E, H, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, E), jnp.float32)

    fwd = make_mha_forward(mesh, E, H, use_pallas=False)
    got = np.asarray(fwd(params, x), np.float32)

    # unsharded reference
    def ref():
        flat = x.reshape(B * S, E)
        def proj(w, b):
            return (flat @ w + b).reshape(B, S, H, E // H)
        q, k, v = (proj(params[w], params[b])
                   for w, b in (("wq", "bq"), ("wk", "bk"), ("wv", "bv")))
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (E // H) ** -0.5
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B * S, E)
        return (o @ params["wo"] + params["bo"]).reshape(B, S, E)

    np.testing.assert_allclose(got, np.asarray(ref(), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_tp_sharded_mha_pallas_kernels():
    """The sharded forward also runs with the Pallas token-layout kernel
    inside each shard (interpret mode on the CPU mesh)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.parallel import make_mesh, make_mha_forward, mha_params

    E, H, B, S = 64, 4, 2, 128
    mesh = make_mesh({"dp": 1, "tp": 2})
    params = mha_params(E, H, seed=3)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, S, E), jnp.float32)
    want = np.asarray(make_mha_forward(mesh, E, H, use_pallas=False)(
        params, x), np.float32)
    got = np.asarray(make_mha_forward(mesh, E, H, use_pallas=True)(
        params, x), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
