#!/usr/bin/env python
"""Inference-prefill attention A/B at the D=64 long-seq shape (r7).

The serving delegation policy (r3/r4): D=64 attention uses the
token-layout Pallas kernel at S >= 1024 (XLA's composed path
materializes (B,H,S,S) f32 in HBM and drops to 9.7%) but that kernel
is lane-slice-limited (~34%). The new heads-split flash-train FORWARD
(whole-slab per program, hpp heads in-kernel) has no per-head lane
slices — this A/Bs all three at the gpt2_small b2 s1024 shape, slope
over an 8-layer chain with value poisoning (CLAUDE.md scan rules)."""

from __future__ import annotations

import argparse
import functools
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default="")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--shape", default="b2s1024",
                   choices=["b2s1024", "b8s512", "b2s1024d128"],
                   help="b8s512 = the serving-prefill geometry, where "
                        "the r3 policy delegates D=64 attention to "
                        "composed XLA (measured vs tokens only — "
                        "flash_heads postdates that A/B)")
    p.add_argument("--json", default="benchmarks/results/flash_infer_r7.json")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    import jax.numpy as jnp

    from tpp_mlir_tpu.serving.engine import composed_causal_attention
    from tpp_mlir_tpu.utils.target import (current_target, on_tpu,
                                           roofline_flops)
    from tpp_mlir_tpu.xsmm.flags import FlashMhaKey
    from tpp_mlir_tpu.xsmm.flash_train import (FlashTrainKey,
                                               build_flash_train_fwd,
                                               flash_train_hpp)
    from tpp_mlir_tpu.xsmm.kernels import build_kernel

    if args.tiny:
        B, H, S, D, dt = 1, 2, 64, 16, jnp.float32
    elif args.shape == "b8s512":
        B, H, S, D, dt = 8, 12, 512, 64, jnp.bfloat16
    elif args.shape == "b2s1024d128":
        B, H, S, D, dt = 2, 6, 1024, 128, jnp.bfloat16
    else:
        B, H, S, D, dt = 2, 12, 1024, 64, jnp.bfloat16
    scale = D ** -0.5
    interpret = not on_tpu()

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32).astype(dt)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32).astype(dt)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32).astype(dt)

    tkey = FlashTrainKey(batch=B, heads=H, seq=S, head_dim=D,
                         dtype="bf16" if dt == jnp.bfloat16 else "f32",
                         causal=True, scale=scale)
    hpp = max(1, flash_train_hpp(tkey, current_target().vmem_bytes))
    tkey = dataclasses.replace(tkey, hpp=hpp)
    fwd = build_flash_train_fwd(tkey, interpret)

    mkey = FlashMhaKey(batch=B, seq=S, seq_kv=S, head_dim=D,
                       dtype="bf16" if dt == jnp.bfloat16 else "f32",
                       scale=scale, causal=True, heads=H)
    tokens = build_kernel(mkey, interpret=interpret)

    t = lambda a: jnp.transpose(a, (0, 2, 1, 3))

    def f_flash(q, k, v):
        o, _ = fwd(t(q), t(k), t(v))
        return t(o).astype(dt)

    def f_tokens(q, k, v):
        E = H * D
        return tokens(q.reshape(B, S, E), k.reshape(B, S, E),
                      v.reshape(B, S, E)).reshape(B, S, H, D).astype(dt)

    def f_composed(q, k, v):
        return composed_causal_attention(q, k, v, scale).astype(dt)

    # poisoned chain: each iteration's q depends on the previous output
    def chain(fn):
        @functools.partial(jax.jit, static_argnums=3)
        def run(q, k, v, n):
            def body(q, _):
                o = fn(q, k, v)
                return (q + 1e-30 * jnp.tanh(
                    o[0, 0, 0, 0].astype(jnp.float32))).astype(q.dtype), \
                    jnp.float32(0)
            q, _ = jax.lax.scan(body, q, None, length=n)
            return jnp.sum(q[0, 0, 0].astype(jnp.float32))
        return run

    # slope pair sized so the long-short delta is ~0.15-0.3 s of device
    # time (~65-150 us/iter at this shape): (4,12) measured NEGATIVE
    # slopes — pure host-timing noise (CLAUDE.md bench pre-sizing rule)
    pair = (2, 6) if args.tiny else (400, 2400)
    flops = 2 * 2 * B * H * S * S * D / 2      # causal triangle
    roof = roofline_flops("bf16" if dt == jnp.bfloat16 else "f32") / 1e12

    rows = {}
    results = {"B": B, "S": S, "D": D, "hpp": hpp, "rows": rows}
    for name, fn in (("flash_heads", f_flash), ("tokens", f_tokens),
                     ("composed_xla", f_composed)):
        run = chain(fn)
        for attempt in range(3):
            try:
                float(run(q, k, v, pair[0]))
                float(run(q, k, v, pair[1]))
                break
            except Exception as e:
                if attempt == 2:
                    raise
                print(f"retry {name}: {type(e).__name__}", flush=True)
                time.sleep(15)
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(q, k, v, pair[0]))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(q, k, v, pair[1]))
            tl = time.perf_counter() - t0
            per = (tl - ts) / (pair[1] - pair[0])
            best = per if best is None else min(best, per)
        pct = 100 * flops / best / 1e12 / roof
        rows[name] = {"us": round(best * 1e6, 2),
                      "pct_triangle_roof": round(pct, 1)}
        print(f"{name:14s} {best * 1e6:9.2f} us  {pct:5.1f}% triangle",
              flush=True)
        if args.json:
            json.dump(results, open(args.json, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
