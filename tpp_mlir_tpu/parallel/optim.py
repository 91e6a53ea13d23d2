"""Distributed optimizer step: optax integration, gradient accumulation,
and ZeRO-1 sharded optimizer state over the dp axis.

`make_train_step` (train.py) is the minimal SGD step; production training
needs the rest of the loop, built the TPU way:

- **optax transformations** plug in directly — optimizer state is a
  pytree, so it rides `jit` like the params do. `make_optim_train_step`
  returns a jitted `step(params, opt_state, x, y) ->
  (params, opt_state, loss)` plus the matching state initializer.
- **Gradient accumulation** is a `lax.scan` over microbatch slices of
  the (already dp-sharded) local batch — one compiled body regardless of
  the accumulation count, grads summed in f32, ONE optimizer update per
  step (bit-comparable to a single large-batch step).
- **ZeRO-1** (`zero1=True`): dp shards are redundant for params and
  grads (dp only splits the batch), so the optimizer MOMENTS — 2x param
  bytes for adam — need not be replicated. The GSPMD formulation: grads
  come out of the shard_map per-shard; the optax update runs OUTSIDE
  with the moment arrays annotated dp-sharded along each param's first
  dp-divisible unsharded dim, and a sharding constraint on the updated
  params makes XLA insert the one all-gather per step. Optimizer-state
  HBM drops by the dp degree; the collective rides ICI — the classic
  ZeRO-1 bargain, expressed entirely through shardings (no manual
  chunk/gather bookkeeping to get wrong).

The reference framework has no training loop at all (SURVEY.md §2.12) —
this extends the beyond-parity train step to the full production recipe.
Differential tests pin each mode to the unsharded optax step and assert
the actual moment-shard sizes (tests/parallel/test_optim.py).
"""

from __future__ import annotations

from .train import _forward_local, param_specs


def _zero1_spec(spec, shape, dp_axis: str, ndp: int):
    """Extend a param PartitionSpec with dp on the first dim that is
    unsharded and dp-divisible; replicate (unchanged) if none fits."""
    from jax.sharding import PartitionSpec as P

    parts = list(spec) + [None] * (len(shape) - len(spec))
    for i, (ax, n) in enumerate(zip(parts, shape)):
        if ax is None and n % ndp == 0 and n > 0:
            parts[i] = dp_axis
            return P(*parts)
    return P(*parts)


def opt_state_shardings(optimizer, params, mesh, pspec_tree,
                        dp_axis: str = "dp", zero1: bool = False):
    """NamedSharding tree for `optimizer.init(params)`: param-shaped
    moment leaves follow the param's spec (plus the dp split when
    zero1), non-param leaves (step counts, ...) replicate."""
    import jax
    import optax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    ndp = mesh.shape[dp_axis]

    def moment_spec(leaf, spec):
        if zero1:
            spec = _zero1_spec(spec, leaf.shape, dp_axis, ndp)
        return NamedSharding(mesh, spec)

    return optax.tree_map_params(
        optimizer, moment_spec, jax.eval_shape(optimizer.init, params),
        pspec_tree,
        transform_non_params=lambda _: NamedSharding(mesh, P()))


def make_sharded_optim_step(mesh, optimizer, pspec_tree, grads_fn,
                            dp_axis: str = "dp", zero1: bool = False,
                            donate: bool = False):
    """Generic sharded-optimizer wiring: `grads_fn(params, *batch) ->
    (loss, grads)` (already shard_mapped; grads laid out per pspec_tree),
    optax update under GSPMD with the moment shardings (dp-split when
    zero1), param sharding constraint re-forming the updated params.
    Returns (jitted step, init_opt_state)."""
    import jax
    import optax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspec_tree,
                            is_leaf=lambda x: isinstance(x, P))
    state_sh_cell = []        # filled by init_opt_state (lazy: needs params)

    def step(params, opt_state, *batch):
        loss, grads = grads_fn(params, *batch)
        # the update runs OUTSIDE shard_map: GSPMD computes each moment
        # where it lives (dp-sharded under zero1 — each dp shard updates
        # its slice), and the param constraint re-gathers the result
        updates, opt_state = optimizer.update(grads, opt_state, params)
        if state_sh_cell:
            # pin the UPDATED state too: elementwise optimizers preserve
            # the dp split by propagation, but one whose update does
            # cross-element work could legally come out replicated —
            # silently forfeiting the ZeRO-1 memory saving
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, state_sh_cell[0])
        new_params = optax.apply_updates(params, updates)
        new_params = jax.lax.with_sharding_constraint(new_params, param_sh)
        return new_params, opt_state, loss

    def init_opt_state(params):
        shardings = opt_state_shardings(optimizer, params, mesh,
                                        pspec_tree, dp_axis, zero1)
        state_sh_cell[:] = [shardings]
        return jax.jit(optimizer.init, out_shardings=shardings)(params)

    # donate=True aliases params+state buffers across steps (the
    # production loop); off by default so callers may keep references
    return jax.jit(step, donate_argnums=(0, 1) if donate else ()), \
        init_opt_state


def make_optim_train_step(mesh, layers, optimizer, dp_axis: str = "dp",
                          tp_axis: str = "tp", accum_steps: int = 1,
                          zero1: bool = False, donate: bool = False,
                          use_pallas: bool | None = None):
    """Return `(step, init_opt_state)` for the mlir-gen MLP chain with
    the same model sharding as train.make_train_step (batch over dp,
    alternating Megatron column/row layers over tp).

    optimizer: any optax GradientTransformation (e.g. optax.adamw(3e-4)).
    accum_steps: microbatches per step; the per-shard batch must divide.
    zero1: shard optimizer state over dp (see module docstring).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..utils.target import on_tpu

    if use_pallas is None:
        use_pallas = on_tpu()

    n_layers = len(layers) - 1
    pspecs = tuple(param_specs(n_layers, tp_axis))

    # --- per-shard loss/grads, with optional microbatch accumulation ----
    # loss_fn is dp-LOCAL (no collective inside the differentiated
    # region, collectives.py convention); the dp mean is applied to the
    # accumulated grads at the end, outside any transpose.
    def local_grads(params, x, y):
        def loss_fn(p, xs, ys):
            out = _forward_local(p, xs, tp_axis, use_pallas)
            return jnp.mean((out.astype(jnp.float32)
                             - ys.astype(jnp.float32)) ** 2)

        def dp_mean(loss, grads):
            return (jax.lax.pmean(loss, dp_axis),
                    jax.tree.map(lambda g: jax.lax.pmean(g, dp_axis),
                                 grads))

        if accum_steps == 1:
            return dp_mean(*jax.value_and_grad(loss_fn)(params, x, y))
        B = x.shape[0]
        assert B % accum_steps == 0, \
            f"local batch {B} must be divisible by accum_steps {accum_steps}"
        xm = x.reshape(accum_steps, B // accum_steps, *x.shape[1:])
        ym = y.reshape(accum_steps, B // accum_steps, *y.shape[1:])

        def body(acc, xy):
            loss, g = jax.value_and_grad(loss_fn)(params, *xy)
            g = jax.tree.map(lambda t: t.astype(jnp.float32), g)
            acc_loss, acc_g = acc
            return (acc_loss + loss, jax.tree.map(jnp.add, acc_g, g)), None

        zero = (jnp.zeros((), jnp.float32),
                jax.tree.map(lambda t: jnp.zeros(t.shape, jnp.float32),
                             params))
        (loss, grads), _ = jax.lax.scan(body, zero, (xm, ym))
        inv = 1.0 / accum_steps
        return dp_mean(loss * inv, jax.tree.map(
            lambda g, p: (g * inv).astype(p.dtype), grads, params))

    grads_fn = jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(pspecs, P(dp_axis, None), P(dp_axis, None)),
        out_specs=(P(), pspecs),
        check_vma=False)

    return make_sharded_optim_step(mesh, optimizer, pspecs, grads_fn,
                                   dp_axis, zero1, donate)
