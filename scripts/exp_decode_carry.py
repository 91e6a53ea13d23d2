#!/usr/bin/env python
"""Follow-up to exp_decode_bisect: the full decode step costs 4.06 ms/tok
at b8 while noattn=0.37 and nocache=1.02 — attention consuming the
DUS-updated xs slice is the pathology (XLA materializes + copies the slab
instead of aliasing).

Variants:
  carry — caches ride the scan CARRY as full (L,...) arrays; per-layer
          in-place DUS at (li,0,pos,0,0) (canonical while-loop aliasing),
          attention reads the updated slab via dynamic_slice.
  split — caches stay xs/ys; attention runs over the PRE-update xs slab
          plus an explicit current-token column (the DUS result feeds
          ONLY the ys write, so no consumer blocks aliasing).
Both are numerically identical to `full` (current token attends to
itself + past)."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.serving import (GptConfig, init_params, make_prefill,
                                  stack_params)
from tpp_mlir_tpu.serving.engine import _ln

CFG = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                mlp_ratio=4, max_seq=640, dtype="bf16")
B, S0 = 8, 512
H, D, S = CFG.heads, CFG.head_dim, CFG.max_seq


def make_step(kind):
    scale = D ** -0.5

    def dot(a, w, b=None):
        y = jnp.dot(a, w, preferred_element_type=jnp.float32)
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(a.dtype)

    def step(params, cache, token):
        pos = cache["pos"]
        x = jnp.take(params["wte"], token, axis=0) \
            + jnp.take(params["wpe"], pos, axis=0).astype(
                params["wte"].dtype)

        def qkv_mlp(x, blk, attend):
            h = _ln(x, blk["ln1_g"], blk["ln1_b"])
            q = dot(h, blk["wq"], blk["bq"]).reshape(B, H, D)
            k = dot(h, blk["wk"], blk["bk"]).reshape(B, H, D)
            v = dot(h, blk["wv"], blk["bv"]).reshape(B, H, D)
            a = attend(q, k, v)
            x = x + dot(a, blk["wo"], blk["bo"])
            h2 = _ln(x, blk["ln2_g"], blk["ln2_b"])
            h2 = dot(h2, blk["w1"], blk["b1"])
            h2 = jax.nn.gelu(h2.astype(jnp.float32),
                             approximate=False).astype(x.dtype)
            return x + dot(h2, blk["w2"], blk["b2"])

        if kind == "carry":
            def body(carry, inp):
                x, kcache, vcache = carry
                blk, li = inp

                def attend(q, k, v):
                    nonlocal kcache, vcache
                    kcache = jax.lax.dynamic_update_slice(
                        kcache, k[None, :, None].astype(kcache.dtype),
                        (li, 0, pos, 0, 0))
                    vcache = jax.lax.dynamic_update_slice(
                        vcache, v[None, :, None].astype(vcache.dtype),
                        (li, 0, pos, 0, 0))
                    kc = jax.lax.dynamic_slice(
                        kcache, (li, 0, 0, 0, 0), (1, B, S, H, D))[0]
                    vc = jax.lax.dynamic_slice(
                        vcache, (li, 0, 0, 0, 0), (1, B, S, H, D))[0]
                    s = jnp.einsum("bhd,bshd->bhs", q.astype(kc.dtype),
                                   kc, preferred_element_type=jnp.float32
                                   ) * scale
                    live = jnp.arange(S) <= pos
                    s = jnp.where(live[None, None], s, -1e30)
                    p = jax.nn.softmax(s, axis=-1)
                    a = jnp.einsum("bhs,bshd->bhd", p.astype(vc.dtype),
                                   vc, preferred_element_type=jnp.float32)
                    return a.reshape(B, H * D).astype(q.dtype)

                x = qkv_mlp(x, blk, attend)
                return (x, kcache, vcache), None

            L = CFG.layers
            (x, kcache, vcache), _ = jax.lax.scan(
                body, (x, cache["k"], cache["v"]),
                (params["blocks"], jnp.arange(L)))
        else:  # split
            def body(x, inp):
                blk, kc, vc = inp
                out = {}

                def attend(q, k, v):
                    # past scores over the PRE-update slab (pos is NOT
                    # yet written), current token handled as an explicit
                    # extra column
                    s = jnp.einsum("bhd,bshd->bhs", q.astype(kc.dtype),
                                   kc, preferred_element_type=jnp.float32
                                   ) * scale
                    live = jnp.arange(S)[None, None] < pos
                    s = jnp.where(live, s, -1e30)
                    s_cur = (jnp.sum(q.astype(jnp.float32)
                                     * k.astype(jnp.float32), -1)
                             * scale)[..., None]        # (B,H,1)
                    p = jax.nn.softmax(
                        jnp.concatenate([s, s_cur], -1), axis=-1)
                    a = jnp.einsum("bhs,bshd->bhd",
                                   p[..., :-1].astype(vc.dtype), vc,
                                   preferred_element_type=jnp.float32)
                    a = a + p[..., -1:].astype(jnp.float32) \
                        * v.astype(jnp.float32)
                    out["kc"] = jax.lax.dynamic_update_slice(
                        kc, k[:, None].astype(kc.dtype), (0, pos, 0, 0))
                    out["vc"] = jax.lax.dynamic_update_slice(
                        vc, v[:, None].astype(vc.dtype), (0, pos, 0, 0))
                    return a.reshape(B, H * D).astype(q.dtype)

                x = qkv_mlp(x, blk, attend)
                return x, (out["kc"], out["vc"])

            x, (kcache, vcache) = jax.lax.scan(
                body, x, (params["blocks"], cache["k"], cache["v"]))

        x = _ln(x, params["lnf_g"], params["lnf_b"])
        logits = dot(x, params["lm_head"])
        return logits, {"k": kcache, "v": vcache, "pos": pos + 1}

    return jax.jit(step)


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
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, CFG.vocab, (B, S0)), jnp.int32)
    _, cache = make_prefill(CFG)(params, ids)
    tok = jnp.full((B,), 7, jnp.int32)

    # numerics cross-check against the engine's real step (CPU-equality
    # is covered by tests; here just compare the two variants' logits)
    from tpp_mlir_tpu.serving import make_decode_step
    ref_logits, _ = make_decode_step(CFG)(params, cache, tok)
    for kind in ("carry", "split"):
        step = make_step(kind)
        logits, _ = step(params, cache, tok)
        err = float(jnp.max(jnp.abs(logits - ref_logits)))
        per = slope(step, params, cache, tok)
        print(f"{kind:6s}: {per*1e3:.3f} ms/tok (max|dlogits|={err:.4f})",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
