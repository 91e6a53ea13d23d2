"""Expert parallelism (ep): a switch-routed MoE FFN with experts sharded
over a mesh axis and GShard-style `lax.all_to_all` token exchange.

Tokens and experts shard over the SAME axis (the GShard/Switch layout):
each device routes its local tokens (top-1, fixed capacity so shapes stay
static for XLA), builds the dense dispatch tensor, all_to_alls the
per-expert token buffers to the expert owners, runs the local experts'
FFNs, all_to_alls results back and combines with the gate weights. Two
all_to_alls per layer, both riding ICI.

The reference has no MoE and no distribution; this extends its FC
benchmark family (fc = the FFN expert body) to the sparse-expert regime
production LLM serving uses.
"""

from __future__ import annotations


def moe_init(d_model: int, d_ff: int, n_experts: int, dtype="float32",
             seed: int = 0):
    """Router + per-expert FFN weights (experts stacked on the lead axis)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    s1, s2 = np.sqrt(1.0 / d_model), np.sqrt(1.0 / d_ff)
    return {
        "wr": (jax.random.normal(ks[0], (d_model, n_experts), jnp.float32)
               * s1).astype(dtype),
        "w1": (jax.random.normal(ks[1], (n_experts, d_model, d_ff),
                                 jnp.float32) * s1).astype(dtype),
        "w2": (jax.random.normal(ks[2], (n_experts, d_ff, d_model),
                                 jnp.float32) * s2).astype(dtype),
    }


def _dispatch(x, wr, n_experts: int, capacity: int):
    """Top-1 switch routing with a fixed per-expert capacity.

    Returns (dispatch (T,E,C) f32 one-hot, combine (T,E,C) f32 gate
    weights). Tokens past an expert's capacity are dropped (standard
    Switch semantics; capacity >= T makes routing lossless, which the
    differential tests use)."""
    import jax
    import jax.numpy as jnp

    logits = jnp.dot(x.astype(jnp.float32), wr.astype(jnp.float32))
    gates = jax.nn.softmax(logits, axis=-1)            # (T, E)
    idx = jnp.argmax(gates, axis=-1)                   # (T,)
    gate = jnp.take_along_axis(gates, idx[:, None], axis=-1)[:, 0]
    onehot_e = jax.nn.one_hot(idx, n_experts, dtype=jnp.float32)
    # position of each token within its expert's buffer
    pos = (jnp.cumsum(onehot_e, axis=0) - 1.0) * onehot_e  # (T, E)
    pos_tok = jnp.sum(pos, axis=-1).astype(jnp.int32)      # (T,)
    keep = pos_tok < capacity
    onehot_c = jax.nn.one_hot(pos_tok, capacity, dtype=jnp.float32)
    dispatch = (onehot_e[:, :, None] * onehot_c[:, None, :]
                * keep[:, None, None].astype(jnp.float32))
    combine = dispatch * gate[:, None, None]
    return dispatch, combine


def make_moe_forward(mesh, d_model: int, d_ff: int, n_experts: int,
                     capacity: int | None = None, ep_axis: str = "ep"):
    """Return jitted `forward(params, x) -> y` over `mesh`:

    x (tokens, d_model) sharded over ep (tokens = the flattened batch);
    params["w1"]/["w2"] sharded on the expert axis over ep, router
    replicated. capacity defaults to the local token count (lossless for
    the balanced/test case)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    ep = mesh.shape[ep_axis]
    assert n_experts % ep == 0, (n_experts, ep)
    e_local = n_experts // ep

    def local_forward(params, x):
        t_local = x.shape[0]
        cap = capacity or t_local
        dispatch, combine = _dispatch(x, params["wr"], n_experts, cap)
        # per-expert token buffers from MY tokens: (E, C, d)
        buf = jnp.einsum("tec,td->ecd", dispatch, x.astype(jnp.float32))
        # exchange: expert owner receives its experts' buffers from every
        # device -> (e_local, ep*C, d)
        buf = buf.reshape(ep, e_local, cap, d_model)
        # tiled=True: concat axis grows ep-fold, blocks ordered by source
        # device (untiled would INSERT the source axis at concat_axis,
        # scrambling the (source, position) layout the reshape assumes)
        buf = lax.all_to_all(buf, ep_axis, split_axis=0, concat_axis=2,
                             tiled=True)
        buf = buf.reshape(e_local, ep * cap, d_model)
        # local experts' FFN (relu MLP — the fc benchmark body per expert)
        w1, w2 = params["w1"].astype(jnp.float32), \
            params["w2"].astype(jnp.float32)
        h = jnp.maximum(jnp.einsum("ecd,edf->ecf", buf, w1), 0.0)
        out = jnp.einsum("ecf,efd->ecd", h, w2)
        # route results back to the token owners
        out = out.reshape(e_local, ep, cap, d_model)
        out = lax.all_to_all(out, ep_axis, split_axis=1, concat_axis=0,
                             tiled=True)
        out = out.reshape(n_experts, cap, d_model)
        y = jnp.einsum("tec,ecd->td", combine, out)
        return y.astype(x.dtype)

    sharded = jax.shard_map(
        local_forward, mesh=mesh,
        in_specs=({"wr": P(None, None), "w1": P(ep_axis, None, None),
                   "w2": P(ep_axis, None, None)}, P(ep_axis, None)),
        out_specs=P(ep_axis, None),
        check_vma=False,
    )
    return jax.jit(sharded)


def moe_reference(params, x, capacity: int | None = None):
    """Unsharded oracle: the same routing + expert math on one device."""
    import jax.numpy as jnp

    n_experts = params["wr"].shape[1]
    cap = capacity or x.shape[0]
    dispatch, combine = _dispatch(x, params["wr"], n_experts, cap)
    buf = jnp.einsum("tec,td->ecd", dispatch, x.astype(jnp.float32))
    w1 = params["w1"].astype(jnp.float32)
    w2 = params["w2"].astype(jnp.float32)
    h = jnp.maximum(jnp.einsum("ecd,edf->ecf", buf, w1), 0.0)
    out = jnp.einsum("ecf,efd->ecd", h, w2)
    return jnp.einsum("tec,ecd->td", combine, out).astype(x.dtype)
