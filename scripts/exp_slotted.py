#!/usr/bin/env python
"""Bisect the SLOTTED decode step (r7).

exp_devbatch measured the slotted decode step at 16.3 ms/iter where
bench_serving's scalar-pos step runs ~1 ms — a ~16x pathology that the
whole continuous-batching stack (host AND device schedulers) sits on,
never benched in isolation. Suspects, each priced here at the GPT-2
small serving geometry (b8, max_seq 640):

  step_scalar[_xla]   the scalar-pos decode step (the measured-fast
                      serving form), Pallas decode-attn / forced XLA
  step_slot[_xla]     the same step with a (B,) position vector —
                      slotted branches: batched scatter KV write +
                      per-slot mask [+ the kernel's slotted variant]
  scatter_iter        ONLY the slotted KV writes (12 layers of
                      .at[li, bidx, :, pos].set(mode="drop") on a
                      carried cache): the r5 MoE finding says this
                      spelling serializes per index on XLA:TPU
  dusloop_iter        the same writes as B chained per-slot DUSes
                      (clamp + rewrite-old-value emulates drop mode)

All rows slope-timed (two fori lengths); params/cache are runtime args
(never closed over — tunnel 413 rule)."""

from __future__ import annotations

import argparse
import functools
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default="")
    p.add_argument("--lens", type=int, nargs=2, default=(32, 128))
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--json", default="benchmarks/results/slotted_r7.json")
    p.add_argument("--rows", default="")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import (GptConfig, init_params,
                                      init_slot_cache, make_decode_step,
                                      make_prefill, stack_params)

    if args.tiny:
        cfg = GptConfig(vocab=128, embed=64, heads=4, layers=2,
                        mlp_ratio=2, max_seq=64, dtype="f32")
        B = 2
    else:
        cfg = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                        mlp_ratio=4, max_seq=640, dtype="bf16")
        B = 8
    L, H, S, D = cfg.layers, cfg.kv_h, cfg.max_seq, cfg.head_dim
    params = init_params(cfg, seed=0)
    n_lo, n_hi = args.lens

    rows = {}
    results = {"B": B, "max_seq": S, "rows": rows}

    def slope(fn, *a):
        float(jnp.sum(fn(*a, n_lo)))          # warm
        float(jnp.sum(fn(*a, n_hi)))
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*a, n_lo)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(fn(*a, n_hi)))
            t_hi = time.perf_counter() - t0
            per = (t_hi - t_lo) / (n_hi - n_lo)
            best = per if best is None else min(best, per)
        return best

    def emit(name, sec, note=""):
        rows[name] = {"ms": round(sec * 1e3, 4)}
        if note:
            rows[name]["note"] = note
        print(f"{name:16s} {sec * 1e3:8.3f} ms/iter {note}", flush=True)
        if args.json:
            json.dump(results, open(args.json, "w"), indent=1)

    want = set(t.strip() for t in args.rows.split(",") if t.strip())

    def on(name):
        return not want or name in want

    # a half-full scalar cache from a real prefill (pos = S//2)
    _, pcache = make_prefill(cfg, use_pallas=False)(
        stack_params(params),
        jnp.zeros((B, S // 2), jnp.int32))

    def step_loop(step):
        @functools.partial(jax.jit, static_argnums=2)
        def run(params, cache, n):
            def body(carry, _):
                cache, tok = carry
                logits, cache = step(params, cache, tok)
                return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), \
                    jnp.float32(0)
            (_, tok), _ = jax.lax.scan(
                body, (cache, jnp.zeros((B,), jnp.int32)), None, length=n)
            return tok.astype(jnp.float32)
        return run

    for attn in ("auto", "xla"):
        c = dataclasses.replace(cfg, decode_attn=attn)
        sfx = "" if attn == "auto" else "_xla"
        if on(f"step_scalar{sfx}"):
            emit(f"step_scalar{sfx}",
                 slope(step_loop(make_decode_step(c)), params, pcache))
        if on(f"step_slot{sfx}"):
            slot = dict(pcache)
            slot["pos"] = jnp.full((B,), S // 2, jnp.int32)
            emit(f"step_slot{sfx}",
                 slope(step_loop(make_decode_step(c)), params, slot))

    # isolated write forms on a carried cache: 12 layer-writes per iter
    dt = pcache["k"].dtype
    kv0 = init_slot_cache(cfg, B)
    pos = jnp.full((B,), S // 2, jnp.int32)
    kvec = jnp.ones((B, H, D), dt)

    @functools.partial(jax.jit, static_argnums=3)
    def scatter_iter(k, pos, kvec, n):
        bidx = jnp.arange(B)

        def body(k, i):
            for li in range(L):
                k = k.at[li, bidx, :, pos].set(
                    kvec * (1.0 + i).astype(dt), mode="drop")
            return k, jnp.float32(0)
        k, _ = jax.lax.scan(body, k, jnp.arange(n, dtype=jnp.int32))
        return jnp.sum(k[0, 0, 0, 0, :8].astype(jnp.float32))

    @functools.partial(jax.jit, static_argnums=3)
    def dusloop_iter(k, pos, kvec, n):
        def body(k, i):
            src = (kvec * (1.0 + i).astype(dt))[:, None, :, None, :] \
                .transpose(1, 0, 2, 3, 4)      # (1, B, H, 1, D) -> per-b
            for li in range(L):
                for b in range(B):
                    pb = jnp.minimum(pos[b], S - 1)
                    old = jax.lax.dynamic_slice(
                        k, (li, b, 0, pb, 0), (1, 1, H, 1, D))
                    new = src[:, b:b + 1].transpose(0, 1, 2, 3, 4)
                    val = jnp.where(pos[b] >= S, old, new)
                    k = jax.lax.dynamic_update_slice(
                        k, val, (li, b, 0, pb, 0))
            return k, jnp.float32(0)
        k, _ = jax.lax.scan(body, k, jnp.arange(n, dtype=jnp.int32))
        return jnp.sum(k[0, 0, 0, 0, :8].astype(jnp.float32))

    if on("scatter_iter"):
        emit("scatter_iter", slope(scatter_iter, kv0["k"], pos, kvec),
             f"(12 x batched scatter on {kv0['k'].nbytes / 1e6:.0f} MB)")
    if on("dusloop_iter"):
        emit("dusloop_iter", slope(dusloop_iter, kv0["k"], pos, kvec),
             "(12 x B chained per-slot DUS, drop emulated)")

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
