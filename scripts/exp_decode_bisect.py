#!/usr/bin/env python
"""Bisect the decode-step time at b=8 (serving_r4b: 4.04 ms/tok vs ~0.9 ms
accounted by weights + attention).

Variants, all GPT-2-small bf16 stacked-params, prompt 512 / max_seq 640:
  full        — the real decode step (bench_serving reference)
  nolmhead    — LM head replaced by a 768-col projection
  noattn      — attention replaced by identity (cache still updated)
  nocache     — attention over the cache read-only, cache returned as-is
  unstacked   — per-layer Python loop (no lax.scan over layers)
  donate      — full step with cache donation enabled

Each timed with the greedy-feedback scan slope (16/112 lengths, median
of 3), the bench_serving discipline.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.serving import (GptConfig, init_params, make_prefill,
                                  stack_params)
from tpp_mlir_tpu.serving.engine import _decode_body

CFG = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                mlp_ratio=4, max_seq=640, dtype="bf16")
B, S0 = 8, 512


def variant_step(kind):
    import tpp_mlir_tpu.serving.engine as eng

    def step(params, cache, token):
        return _decode_body(params, cache, token, CFG, CFG.heads, None)

    if kind in ("full", "unstacked", "donate"):
        return jax.jit(step, donate_argnums=(1,) if kind == "donate" else ())

    # patched bodies: monkeypatch via a copied layer fn is invasive; instead
    # rebuild a minimal decode inline (mirrors _decode_body's stacked path)
    def mini(params, cache, token):
        D = CFG.head_dim
        pos = cache["pos"]
        x = jnp.take(params["wte"], token, axis=0) \
            + jnp.take(params["wpe"], pos, axis=0).astype(
                params["wte"].dtype)
        kcache, vcache = cache["k"], cache["v"]

        def dot(a, w, b=None):
            y = jnp.dot(a, w, preferred_element_type=jnp.float32)
            if b is not None:
                y = y + b.astype(jnp.float32)
            return y.astype(a.dtype)

        def layer(x, inp):
            blk, kc, vc = inp
            h = eng._ln(x, blk["ln1_g"], blk["ln1_b"])
            q = dot(h, blk["wq"], blk["bq"]).reshape(B, CFG.heads, D)
            k = dot(h, blk["wk"], blk["bk"]).reshape(B, CFG.heads, D)
            v = dot(h, blk["wv"], blk["bv"]).reshape(B, CFG.heads, D)
            if kind != "nocache":
                kc = jax.lax.dynamic_update_slice(
                    kc, k[:, None].astype(kc.dtype), (0, pos, 0, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, v[:, None].astype(vc.dtype), (0, pos, 0, 0))
            if kind == "noattn":
                a = h
            else:
                s = jnp.einsum("bhd,bshd->bhs", q.astype(kc.dtype), kc,
                               preferred_element_type=jnp.float32) \
                    * (D ** -0.5)
                live = jnp.arange(CFG.max_seq) <= pos
                s = jnp.where(live[None, None], s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                a = jnp.einsum("bhs,bshd->bhd", p.astype(vc.dtype), vc,
                               preferred_element_type=jnp.float32
                               ).reshape(B, CFG.embed).astype(x.dtype)
            x = x + dot(a, blk["wo"], blk["bo"])
            h2 = eng._ln(x, blk["ln2_g"], blk["ln2_b"])
            h2 = dot(h2, blk["w1"], blk["b1"])
            h2 = jax.nn.gelu(h2.astype(jnp.float32),
                             approximate=False).astype(x.dtype)
            x = x + dot(h2, blk["w2"], blk["b2"])
            return x, (kc, vc)

        def body(x, inp):
            return layer(x, inp)

        x, (kcache, vcache) = jax.lax.scan(
            body, x, (params["blocks"], kcache, vcache))
        x = eng._ln(x, params["lnf_g"], params["lnf_b"])
        if kind == "nolmhead":
            logits = dot(x, params["blocks"]["wo"][0])
        else:
            logits = dot(x, params["lm_head"])
        if kind == "nocache":
            return logits, cache
        return logits, {"k": kcache, "v": vcache, "pos": pos + 1}

    return jax.jit(mini)


def slope(step, params, cache, tok, n1=16, n2=112, reps=3):
    @functools.partial(jax.jit, static_argnums=3)
    def rep(params, cache, tok, n):
        def body(carry, _):
            cache, tok = carry
            logits, cache = step(params, cache, tok)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (cache, nxt), jnp.sum(logits.astype(jnp.float32))
        _, sums = jax.lax.scan(body, (cache, tok), None, length=n)
        return sums

    float(jnp.sum(rep(params, cache, tok, n1)))
    float(jnp.sum(rep(params, cache, tok, n2)))
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(rep(params, cache, tok, n1)))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(rep(params, cache, tok, n2)))
        tl = time.perf_counter() - t0
        out.append((tl - ts) / (n2 - n1))
    out.sort()
    return out[1]


def main():
    params = stack_params(init_params(CFG, seed=0))
    unstacked = init_params(CFG, seed=0)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, CFG.vocab, (B, S0)), jnp.int32)
    _, cache = make_prefill(CFG)(params, ids)
    tok = jnp.full((B,), 7, jnp.int32)
    for kind in ("full", "nolmhead", "noattn", "nocache", "unstacked"):
        p = unstacked if kind == "unstacked" else params
        per = slope(variant_step(kind), p, cache, tok)
        print(f"{kind:10s}: {per*1e3:.3f} ms/tok", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
