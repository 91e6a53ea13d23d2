"""Sequence parallelism (sp): ring attention over a mesh axis.

The sequence dim shards over sp — each device holds a contiguous Q/K/V
block of its own tokens. K/V blocks rotate around the ring with
`lax.ppermute` (one hop per step, sp steps total); every device folds
each arriving block into its local queries' attention with an ONLINE
softmax carry (running max m, normalizer l, accumulator acc) — the same
rescale algebra the flash kernels use (xsmm/kernels.py), lifted to the
cross-chip ring so no device ever materializes the full (S, S) scores or
the full K/V. Communication is sp ppermutes of the local KV block, all
riding ICI; compute and the next hop overlap under XLA's async
collectives.

Causal masking uses global positions reconstructed from the ring step:
the KV block arriving at step t on device i is device (i - t) mod sp's
tokens, so its global offset is known statically per step.

The reference has no distribution and no attention beyond its MHA
benchmark kernels (SURVEY.md 2.12); this is the long-context scaling
extension of the same attention math.
"""

from __future__ import annotations

import math


def ring_attention_params(embed: int, dtype="float32", seed: int = 0):
    """No weights — ring attention operates on pre-projected q/k/v.
    Kept for API symmetry; returns {}."""
    return {}


def make_ring_attention(mesh, heads: int, causal: bool = False,
                        sp_axis: str = "sp"):
    """Return jitted `attn(q, k, v) -> out` over `mesh`.

    q/k/v: (batch, seq, heads, head_dim), seq sharded over `sp_axis`
    (batch/heads/D replicated or sharded by the caller's outer specs —
    this function only manages the seq axis). Out matches q's shape and
    sharding. Softmax runs in f32 regardless of input dtype (the flash
    kernel policy, kernels.py `_build_flash_mha`)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    sp = mesh.shape[sp_axis]

    def local_attn(q, k, v):
        b, sq, h, d = q.shape
        scale = 1.0 / math.sqrt(d)
        idx = lax.axis_index(sp_axis)
        # fold the log2e trick: scores in exp2 domain (attention lesson:
        # +4-11 roofline points on-chip; here it just saves VPU work)
        qf = q.astype(jnp.float32) * (scale * 1.4426950408889634)

        perm = [(i, (i + 1) % sp) for i in range(sp)]
        q_pos = idx * sq + lax.broadcasted_iota(jnp.int32, (sq, sq), 0)

        def step(t, carry):
            kb, vb, m, l, acc = carry
            # kb holds device (idx - t) mod sp's tokens
            src = (idx - t) % sp
            s = jnp.einsum("bqhd,bkhd->bhqk", qf, kb.astype(jnp.float32))
            if causal:
                k_pos = src * sq + lax.broadcasted_iota(
                    jnp.int32, (sq, sq), 1)
                s = jnp.where(q_pos >= k_pos, s, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            # exp2 of -inf rows: keep the carry finite when a whole row is
            # masked (early causal steps) — exp2(-inf - finite) = 0 is
            # fine, but m_new may still be -inf; guard the rescale
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.exp2(s - m_safe[..., None])
            corr = jnp.exp2(jnp.where(jnp.isfinite(m), m - m_safe, -jnp.inf))
            corr = jnp.where(jnp.isfinite(m), corr, 0.0)
            l = l * corr + jnp.sum(p, axis=-1)
            pv = jnp.einsum("bhqk,bkhd->bhqd", p, vb.astype(jnp.float32))
            acc = acc * corr[..., None] + pv
            kb = lax.ppermute(kb, sp_axis, perm)
            vb = lax.ppermute(vb, sp_axis, perm)
            return kb, vb, m_new, l, acc

        m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, h, sq), jnp.float32)
        acc0 = jnp.zeros((b, h, sq, d), jnp.float32)
        _, _, _, l, acc = lax.fori_loop(
            0, sp, step, (k, v, m0, l0, acc0))
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)

    seq_spec = P(None, sp_axis, None, None)
    sharded = jax.shard_map(
        local_attn, mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec),
        out_specs=seq_spec,
        check_vma=False,
    )
    return jax.jit(sharded)


def ring_attention_reference(q, k, v, causal: bool = False):
    """Unsharded oracle: plain softmax attention in f32, exp2 domain."""
    import jax.numpy as jnp
    from jax import lax

    b, s, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    qf = q.astype(jnp.float32) * (scale * 1.4426950408889634)
    sc = jnp.einsum("bqhd,bkhd->bhqk", qf, k.astype(jnp.float32))
    if causal:
        qp = lax.broadcasted_iota(jnp.int32, (s, s), 0)
        kp = lax.broadcasted_iota(jnp.int32, (s, s), 1)
        sc = jnp.where(qp >= kp, sc, -jnp.inf)
    m = jnp.max(sc, axis=-1, keepdims=True)
    p = jnp.exp2(sc - m)
    out = jnp.einsum("bhqk,bkhd->bhqd", p / jnp.sum(p, -1, keepdims=True),
                     v.astype(jnp.float32))
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)
