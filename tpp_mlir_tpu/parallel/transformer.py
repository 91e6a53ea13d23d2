"""Megatron-sharded multi-head attention forward over a dp x tp mesh.

Heads shard over tp: the Q/K/V projections are COLUMN-parallel (each
device holds H/tp whole heads' columns), the attention core runs entirely
locally on the device's heads — with the token-layout flash kernel the
heads dim never crosses devices and no relayout exists anywhere — and the
output projection is ROW-parallel with one psum over tp. Batch shards
over dp. One all-reduce per attention block, the Megatron-LM recipe; the
collectives ride ICI via the mesh (SURVEY.md 2.12 'TPU plan').

The reference has no distribution; this is the multi-chip extension of
its single-node attention benchmarks.
"""

from __future__ import annotations

import numpy as np


def mha_params(embed: int, heads: int, dtype="float32", seed: int = 0):
    """Xavier-ish init for (wq, wk, wv, wo) + biases."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    scale = np.sqrt(1.0 / embed)

    def w(k):
        return (jax.random.normal(k, (embed, embed), jnp.float32)
                * scale).astype(dtype)

    return {
        "wq": w(ks[0]), "wk": w(ks[1]), "wv": w(ks[2]), "wo": w(ks[3]),
        "bq": jnp.zeros((embed,), dtype), "bk": jnp.zeros((embed,), dtype),
        "bv": jnp.zeros((embed,), dtype), "bo": jnp.zeros((embed,), dtype),
    }


def mha_param_specs(dp_axis: str = "dp", tp_axis: str = "tp"):
    """PartitionSpecs: QKV column-parallel (heads on tp), out row-parallel."""
    from jax.sharding import PartitionSpec as P

    col = P(None, tp_axis)
    return {
        "wq": col, "wk": col, "wv": col, "wo": P(tp_axis, None),
        "bq": P(tp_axis), "bk": P(tp_axis), "bv": P(tp_axis), "bo": P(),
    }


def make_mha_forward(mesh, embed: int, heads: int, scale: float | None = None,
                     causal: bool = False, dp_axis: str = "dp",
                     tp_axis: str = "tp", use_pallas: bool | None = None):
    """Return jitted `forward(params, x) -> out` sharded over `mesh`.

    x: (batch, seq, embed) sharded on batch over dp; params as
    `mha_param_specs`. Inside each shard the attention core sees the
    device's local heads in TOKEN layout (batch, seq, local_heads*D)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..utils.target import on_tpu

    if use_pallas is None:
        use_pallas = on_tpu()
    tp_size = mesh.shape[tp_axis]
    assert heads % tp_size == 0, (heads, tp_size)
    h_local = heads // tp_size
    D = embed // heads
    att_scale = scale if scale is not None else D ** -0.5

    def local_forward(params, x):
        B, S, _ = x.shape
        flat = x.reshape(B * S, embed)

        def proj(w, b):
            return (jnp.dot(flat, w, preferred_element_type=jnp.float32)
                    + b).astype(x.dtype).reshape(B, S, -1)

        q = proj(params["wq"], params["bq"])     # (B, S, h_local*D)
        k = proj(params["wk"], params["bk"])
        v = proj(params["wv"], params["bv"])

        if use_pallas:
            from ..xsmm import build_kernel
            from ..xsmm.flags import FlashMhaKey

            key = FlashMhaKey(
                batch=B, seq=S, seq_kv=S, head_dim=D, heads=h_local,
                dtype={"float32": "f32", "bfloat16": "bf16"}.get(
                    str(x.dtype), "f32"),
                scale=att_scale, causal=causal)
            att = build_kernel(key)(q, k, v)
        else:
            from ..serving.engine import composed_causal_attention

            def sp(t):
                return t.reshape(B, S, h_local, D)
            att = composed_causal_attention(
                sp(q), sp(k), sp(v), att_scale, causal=causal
            ).reshape(B, S, -1).astype(x.dtype)

        # row-parallel out projection: local contraction + ONE psum over tp
        z = jnp.dot(att.reshape(B * S, -1), params["wo"],
                    preferred_element_type=jnp.float32)
        z = jax.lax.psum(z, tp_axis)
        return (z + params["bo"]).astype(x.dtype).reshape(B, S, embed)

    sharded = jax.shard_map(
        local_forward, mesh=mesh,
        in_specs=(mha_param_specs(dp_axis, tp_axis), P(dp_axis, None, None)),
        out_specs=P(dp_axis, None, None),
        check_vma=False,
    )
    return jax.jit(sharded)
