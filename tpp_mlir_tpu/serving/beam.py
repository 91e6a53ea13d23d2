"""Beam-search decoding over the KV-cache engine (engine.py).

Standard batched beam search, TPU-shaped: the B·W beams ride the decode
step as one batch (every array static-shape), beam reshuffles are one
`jnp.take` along the cache's batch axis per step, and the whole loop is
a single `lax.scan` under jit. Log-probabilities accumulate in f32;
finished beams (optional `eos_id`) freeze their score and extend only
with EOS at zero cost (the standard convention), and the returned beam
maximizes `score / (t_effective ** length_penalty)` (GNMT length norm;
0 = plain sum of log-probs).

Cache layout contract (tested): every array leaf of the decode cache
carries batch at AXIS 1 — (L, B, H, S, D) KV slabs and their int8
scale arrays alike — and `pos` is a batch-free scalar, so beam
expansion (`jnp.repeat`) and parent reorder (`jnp.take`) are two
tree_maps with one rule. A wrong-axis leaf would desync a beam's cache
from its history; tests pin beam-1 == greedy and exhaustive-W == brute
force over all length-T sequences.
"""

from __future__ import annotations


def _cache_map(cache, fn):
    """Apply fn to every batched array leaf (axis-1 batch); pass the
    batch-free 'pos' scalar through."""
    return {k: (v if k == "pos" else fn(v)) for k, v in cache.items()}


def make_beam_generate(cfg, steps: int, beams: int,
                       length_penalty: float = 0.0,
                       eos_id: int | None = None,
                       use_pallas: bool | None = None):
    """Return jitted `generate(params, ids) -> (tokens, scores)`:
    tokens (B, steps) — the best beam's continuation of each prompt,
    scores (B,) — its length-normalized log-probability."""
    import functools

    import jax
    import jax.numpy as jnp

    from .engine import make_decode_step, make_prefill

    assert beams >= 1 and steps >= 1
    # top_k(logp0, W) needs W <= vocab; fail here with a clear message
    # instead of an opaque trace-time error (ADVICE r3 #4)
    assert beams <= cfg.vocab, \
        f"beams={beams} exceeds vocab={cfg.vocab}"
    prefill = make_prefill(cfg, use_pallas=use_pallas)
    step = make_decode_step(cfg)
    W, V = beams, cfg.vocab
    NEG = jnp.float32(-1e30)

    @jax.jit
    def generate(params, ids):
        B = ids.shape[0]
        logits, cache = prefill(params, ids)
        logp0 = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)
        scores, tok = jax.lax.top_k(logp0, W)              # (B, W)
        # expand the cache to B*W beams, beam-minor (b0w0, b0w1, ...)
        cache = _cache_map(cache, lambda x: jnp.repeat(x, W, axis=1))
        seqs = jnp.zeros((B, W, steps), jnp.int32)
        seqs = seqs.at[:, :, 0].set(tok)
        finished = (tok == eos_id) if eos_id is not None \
            else jnp.zeros((B, W), bool)
        # ended-at length (for length norm); steps if never finished
        end_t = jnp.where(finished, 1, steps)

        def body(carry, t):
            cache, scores, tok, seqs, finished, end_t = carry
            logits, cache = step(params, cache, tok.reshape(B * W))
            logp = jax.nn.log_softmax(
                logits.astype(jnp.float32), -1).reshape(B, W, V)
            if eos_id is not None:
                # finished beams: only EOS continues, at zero cost
                only_eos = jnp.full((V,), NEG).at[eos_id].set(0.0)
                logp = jnp.where(finished[:, :, None], only_eos, logp)
            cand = (scores[:, :, None] + logp).reshape(B, W * V)
            scores, idx = jax.lax.top_k(cand, W)            # (B, W)
            parent, tok = idx // V, idx % V
            flat = (jnp.arange(B)[:, None] * W + parent).reshape(-1)
            cache = _cache_map(cache, lambda x: jnp.take(x, flat, axis=1))
            gather_w = lambda x: jnp.take_along_axis(
                x, parent.reshape(parent.shape + (1,) * (x.ndim - 2)),
                axis=1)
            seqs = gather_w(seqs).at[:, :, t].set(tok)
            finished = gather_w(finished[..., None])[..., 0]
            end_t = gather_w(end_t[..., None])[..., 0]
            if eos_id is not None:
                just = (tok == eos_id) & ~finished
                end_t = jnp.where(just, t + 1, end_t)
                finished = finished | just
            return (cache, scores, tok, seqs, finished, end_t), None

        carry = (cache, scores, tok, seqs, finished, end_t)
        if steps > 1:
            carry, _ = jax.lax.scan(body, carry,
                                    jnp.arange(1, steps))
        _, scores, _, seqs, _, end_t = carry
        norm = jnp.maximum(end_t, 1).astype(jnp.float32) ** length_penalty
        final = scores / norm
        best = jnp.argmax(final, axis=1)                    # (B,)
        out = jnp.take_along_axis(
            seqs, best[:, None, None], axis=1)[:, 0]        # (B, steps)
        return out, jnp.take_along_axis(final, best[:, None], 1)[:, 0]

    return generate
