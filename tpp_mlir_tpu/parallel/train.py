"""Sharded MLP training step (dp x tp) over a device mesh.

The flagship model is the mlir-gen MLP chain; this module trains it SPMD:

  * dp: batch dimension sharded over the 'dp' mesh axis; the loss is
    dp-LOCAL and the grads take one explicit pmean over dp (shard_map's
    check_vma=False transposes must not be relied on — collectives.py).
  * tp: Megatron-style alternating tensor parallelism over the 'tp' axis —
    even layers column-parallel (W sharded on N, bias local, relu local,
    fused Pallas kernel per shard), odd layers row-parallel (W sharded on K,
    psum over tp, bias+relu after the collective).

The reference has no distribution at all (SURVEY.md 2.12), so this is the
TPU-native extension of its `parallel-task-grid` to multiple chips; the
collectives ride ICI via the mesh.
"""

from __future__ import annotations

import numpy as np


def mlp_init(layers, dtype="float32", seed: int = 0):
    """He-initialized weights/biases for the layer-size chain `layers`."""
    import jax
    import jax.numpy as jnp

    params = []
    key = jax.random.PRNGKey(seed)
    for i in range(len(layers) - 1):
        key, k1 = jax.random.split(key)
        K, N = layers[i], layers[i + 1]
        w = (jax.random.normal(k1, (K, N), jnp.float32)
             * np.sqrt(2.0 / K)).astype(dtype)
        b = jnp.zeros((N,), dtype)
        params.append((w, b))
    return tuple(params)


def param_specs(n_layers: int, tp_axis: str = "tp"):
    """PartitionSpecs for alternating column/row tensor parallelism."""
    from jax.sharding import PartitionSpec as P

    specs = []
    for i in range(n_layers):
        if i % 2 == 0:     # column parallel: shard N
            specs.append((P(None, tp_axis), P(tp_axis)))
        else:              # row parallel: shard K
            specs.append((P(tp_axis, None), P()))
    return specs


def _forward_local(params, x, tp_axis: str, use_pallas: bool):
    """Per-shard forward. Shapes are local to the shard. Every collective
    (and every point where a tp-replicated activation meets a tp-sharded
    weight) goes through the custom-VJP wrappers in collectives.py so the
    backward pass is correct under shard_map's check_vma=False (see that
    module: unchecked transposes over-count by the tp degree)."""
    import jax
    import jax.numpy as jnp

    from ..ops import trainable
    from .collectives import gather_cols, mark_replicated, row_parallel_psum

    h = x
    n = len(params)
    for i, (w, b) in enumerate(params):
        if i % 2 == 0:
            # column parallel: local fused kernel, output sharded on tp.
            # h is tp-replicated here; its cotangent from the sliced
            # contraction is partial — mark it.
            h = mark_replicated(h, tp_axis)
            if use_pallas:
                h = trainable.mlp_layer(h, w, b)
            else:
                h = jnp.maximum(
                    jnp.dot(h, w, preferred_element_type=jnp.float32)
                    + b, 0).astype(h.dtype)
        else:
            # row parallel: partial matmul, psum over tp, then bias+relu
            if use_pallas:
                z = trainable.matmul(h, w)
            else:
                z = jnp.dot(h, w, preferred_element_type=jnp.float32)
            z = row_parallel_psum(z, tp_axis)
            h = jnp.maximum(z + b, 0).astype(h.dtype)
    if n % 2 == 1:
        # odd layer count ends column-parallel: gather the feature dim
        h = gather_cols(h, tp_axis, 1)
    return h


def make_train_step(mesh, layers, lr: float = 1e-3, dp_axis: str = "dp",
                    tp_axis: str = "tp", use_pallas: bool | None = None):
    """Return jitted `step(params, x, y) -> (params, loss)` over `mesh`."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..utils.target import on_tpu

    if use_pallas is None:
        use_pallas = on_tpu()

    n_layers = len(layers) - 1
    pspecs = tuple(param_specs(n_layers, tp_axis))

    def local_step(params, x, y):
        def loss_fn(p):
            # dp-LOCAL loss only: no collective inside the differentiated
            # region (collectives.py convention); the dp mean is applied
            # to the grads afterwards, where no transpose is involved
            out = _forward_local(p, x, tp_axis, use_pallas)
            return jnp.mean((out.astype(jnp.float32)
                             - y.astype(jnp.float32)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, dp_axis), grads)
        new_params = jax.tree.map(lambda p, g: (p - lr * g).astype(p.dtype),
                                  params, grads)
        return new_params, jax.lax.pmean(loss, dp_axis)

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspecs, P(dp_axis, None), P(dp_axis, None)),
        out_specs=(pspecs, P()),
        # pallas_call outputs carry no varying-mesh-axes metadata
        check_vma=False,
    )
    return jax.jit(sharded)
