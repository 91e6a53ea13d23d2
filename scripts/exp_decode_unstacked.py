#!/usr/bin/env python
"""Does the NEW unstacked decode path (full-array DUS + STATIC layer
slices, post-carry-rewrite) beat the stacked scan at runtime?

The stacked scan's dynamic_slice slab read is a materialized copy
(~2x slab bytes per layer); with static layer indices XLA fuses
slice+dot with no copy. Compile cost: L block bodies in the HLO instead
of one (fine for 12 layers now that weights are runtime args).

Measures MHA and GQA(kv=4) decode at b=1/8, stacked vs unstacked params
(same buffers, different pytree shape)."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.serving import (GptConfig, init_params, make_decode_step,
                                  make_prefill, stack_params)


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
    for kvh in (None, 4):
        cfg = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                        mlp_ratio=4, max_seq=640, dtype="bf16",
                        kv_heads=kvh)
        params = init_params(cfg, seed=0)
        stacked = stack_params(params)
        step = make_decode_step(cfg)
        for B in (1, 8):
            ids = jnp.asarray(np.random.default_rng(0).integers(
                0, cfg.vocab, (B, 512)), jnp.int32)
            _, cache = make_prefill(cfg)(stacked, ids)
            tok = jnp.full((B,), 7, jnp.int32)
            l1, _ = step(stacked, cache, tok)
            l2, _ = step(params, cache, tok)
            err = float(jnp.max(jnp.abs(l1 - l2)))
            for name, p in (("stacked", stacked), ("unstacked", params)):
                per = slope(step, p, cache, tok)
                print(f"kv={kvh or 12:2d} b={B} {name:9s}: "
                      f"{per*1e3:.3f} ms/tok (d={err:.4f})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
