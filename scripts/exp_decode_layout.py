#!/usr/bin/env python
"""Experiment: decode-attention KV-cache layout, (B,S,H,D) vs (B,H,S,D).

Hypothesis (from serving_r4b: decode b8 at 4.0 ms/tok = ~3.3 GB of
effective traffic vs ~0.7 GB of necessary reads): the scores einsum
"bhd,bshd->bhs" contracts S with H,D interior, so XLA physically
transposes every layer's cache slab each step; (B,H,S,D) puts batch dims
leading and the contraction innermost-adjacent — a canonical dot_general
with no relayout.

Times a 12-layer decode-attention chain (scores+softmax+AV only, real
cross-layer dependency) with the two-length slope, both layouts, b=1/8.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

L, S, H, D = 12, 640, 12, 64
DT = jnp.bfloat16


def chain_bshd(q0, k, v):
    def layer(q, kv):
        kc, vc = kv
        s = jnp.einsum("bhd,bshd->bhs", q, kc,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        a = jnp.einsum("bhs,bshd->bhd", p.astype(DT), vc,
                       preferred_element_type=jnp.float32)
        return a.astype(DT), None
    out, _ = jax.lax.scan(layer, q0, (k, v))
    return out


def chain_bhsd(q0, k, v):
    def layer(q, kv):
        kc, vc = kv
        s = jnp.einsum("bhd,bhsd->bhs", q, kc,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        a = jnp.einsum("bhs,bhsd->bhd", p.astype(DT), vc,
                       preferred_element_type=jnp.float32)
        return a.astype(DT), None
    out, _ = jax.lax.scan(layer, q0, (k, v))
    return out


def bench(fn, q0, k, v, n1=32, n2=160):
    import functools

    @functools.partial(jax.jit, static_argnums=3)
    def rep(q0, k, v, n):
        def body(q, _):
            out = fn(q, k, v)
            return out, jnp.sum(out.astype(jnp.float32))
        q, sums = jax.lax.scan(body, q0, None, length=n)
        return sums

    float(jnp.sum(rep(q0, k, v, n1)))
    float(jnp.sum(rep(q0, k, v, n2)))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(rep(q0, k, v, n1)))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(rep(q0, k, v, n2)))
        tl = time.perf_counter() - t0
        slopes.append((tl - ts) / (n2 - n1))
    slopes.sort()
    return slopes[1]


def main():
    rng = np.random.default_rng(0)
    for B in (1, 8):
        q0 = jnp.asarray(rng.normal(size=(B, H, D)), DT)
        k4 = jnp.asarray(rng.normal(size=(L, B, S, H, D)), DT)
        v4 = jnp.asarray(rng.normal(size=(L, B, S, H, D)), DT)
        kp = jnp.transpose(k4, (0, 1, 3, 2, 4))  # (L,B,H,S,D)
        vp = jnp.transpose(v4, (0, 1, 3, 2, 4))
        kv_bytes = 2 * L * B * S * H * D * 2
        for name, fn, kk, vv in (("bshd", chain_bshd, k4, v4),
                                 ("bhsd", chain_bhsd, kp, vp)):
            per = bench(fn, q0, kk, vv)
            print(f"b={B} {name}: {per*1e3:.3f} ms/step, "
                  f"eff {kv_bytes/per/1e9:.0f} GB/s over the KV read")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
