"""Pipeline parallelism (pp): GPipe-style microbatch pipeline over a mesh
axis, activations flowing stage-to-stage with `lax.ppermute` over ICI.

Stage s holds layer s's weights (weights sharded over pp — the model no
longer fits one chip is the production motivation). The schedule runs
n_micro + P - 1 ticks; each tick every stage computes its layer on the
microbatch it currently holds and permutes the result forward. Stage 0
injects a fresh microbatch per tick, the last stage collects outputs —
the textbook GPipe forward (the scaling-book pipelining recipe), with
bubble fraction (P-1)/(n_micro+P-1).

The reference has no cross-chip execution at all (SURVEY.md 2.12); this
extends its single-node MLP chain to stage-sharded execution with the
same per-layer fused-BRGEMM semantics.
"""

from __future__ import annotations


def pipeline_init(d: int, n_stages: int, dtype="float32", seed: int = 0):
    """Per-stage (w, b) for an n_stage chain of square d->d layers,
    stacked on the leading (stage) axis: w (P, d, d), b (P, d)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    ks = jax.random.split(jax.random.PRNGKey(seed), n_stages)
    w = jnp.stack([
        (jax.random.normal(k, (d, d), jnp.float32)
         * np.sqrt(1.0 / d)).astype(dtype) for k in ks])
    b = jnp.zeros((n_stages, d), dtype)
    return {"w": w, "b": b}


def make_pipeline_forward(mesh, d: int, pp_axis: str = "pp",
                          use_pallas: bool | None = None):
    """Return jitted `forward(params, xs) -> ys` over `mesh`:

    xs (n_micro, mb, d) microbatches, replicated in; weights sharded one
    stage per device over `pp_axis`; ys (n_micro, mb, d) = the chain of
    all P stages applied in order (bias + relu per stage, matching the
    reference's canonical fused MLP layer)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from ..utils.target import on_tpu

    if use_pallas is None:
        use_pallas = on_tpu()
    nstages = mesh.shape[pp_axis]

    if use_pallas:
        from ..xsmm import build_kernel
        from ..xsmm.flags import BrgemmKey

    def local_forward(params, xs):
        w, b = params["w"][0], params["b"][0]   # this device's stage
        idx = lax.axis_index(pp_axis)
        n_micro, mb, _ = xs.shape
        ticks = n_micro + nstages - 1

        if use_pallas:
            key = BrgemmKey(batch=1, m=mb, n=d, k=d,
                            dtype={"float32": "f32",
                                   "bfloat16": "bf16"}.get(
                                       str(xs.dtype), "f32"),
                            beta0=True, binary_kind="add",
                            binary_bcast="bcast_col", unary_kind="relu")
            kern = build_kernel(key)

            def layer(x):
                return kern(x[None], w[None], None, b).astype(x.dtype)
        else:
            def layer(x):
                y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
                return jnp.maximum(y, 0).astype(x.dtype)

        perm = [(i, (i + 1) % nstages) for i in range(nstages)]

        def tick(t, carry):
            state, out = carry
            # stage 0 injects microbatch t (older injections have drained
            # past it); other stages consume what arrived last tick
            feed = xs[jnp.clip(t, 0, n_micro - 1)]
            x_in = jnp.where(idx == 0, feed, state)
            y = layer(x_in)
            # the last stage emits microbatch t-(P-1)
            pos = t - (nstages - 1)
            write = (idx == nstages - 1) & (pos >= 0)
            posc = jnp.clip(pos, 0, n_micro - 1)
            out = out.at[posc].set(jnp.where(write, y, out[posc]))
            state = lax.ppermute(y, pp_axis, perm)
            return state, out

        state = jnp.zeros((mb, d), xs.dtype)
        out = jnp.zeros_like(xs)
        _, out = lax.fori_loop(0, ticks, tick, (state, out))
        # outputs live on the last stage, zeros elsewhere: one psum
        # broadcasts them (everything rides ICI)
        return lax.psum(out, pp_axis)

    sharded = jax.shard_map(
        local_forward, mesh=mesh,
        in_specs=({"w": P(pp_axis, None, None), "b": P(pp_axis, None)},
                  P(None, None, None)),
        out_specs=P(None, None, None),
        check_vma=False,
    )
    return jax.jit(sharded)


def pipeline_reference(params, xs):
    """Unsharded oracle: every stage applied in order to each microbatch."""
    import jax.numpy as jnp

    def layer(x, w, b):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        return jnp.maximum(y, 0).astype(x.dtype)

    out = xs
    for s in range(params["w"].shape[0]):
        out = jnp.stack([layer(out[i], params["w"][s], params["b"][s])
                         for i in range(out.shape[0])])
    return out
