#!/usr/bin/env python
"""r5: decode-attention form (xla einsum vs streaming Pallas kernel)
inside the REAL decode loop, b1 and b8, one coherent run.

serving_r5 measured b1 at 97.8% of HBM roof (up from 85.9) and b8
unchanged (48.4 vs 53) after the (B,H,S,D) layout + kernel landed —
this isolates which change did what: same engine, same run, only
cfg.decode_attn flipped.

Usage: python scripts/exp_decode_form.py [--json out.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import time


def _slope(fn, n_short, n_long, reps):
    fn(n_short)
    fn(n_long)
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(n_short)
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(n_long)
        t_l = time.perf_counter() - t0
        slopes.append((t_l - t_s) / (n_long - n_short))
    slopes.sort()
    return slopes[len(slopes) // 2]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", default="benchmarks/results/decode_form_r5.json")
    p.add_argument("--platform", default="")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--llama", action="store_true",
                   help="LLaMA-class architecture (RoPE/RMSNorm/SwiGLU)")
    p.add_argument("--kv-quant", choices=["int8"], default=None,
                   help="int8 KV cache: A/B the int8-aware streaming "
                        "kernel vs the XLA dequant-einsum path in-loop")
    p.add_argument("--kv-heads", type=int, default=0,
                   help="GQA: KV heads < query heads (0 = MHA); exercises "
                        "the grouped decode-attention kernel variant")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import (GptConfig, init_params, make_prefill,
                                      make_decode_step, stack_params)
    from tpp_mlir_tpu.utils.target import current_target

    kvh = args.kv_heads or None
    mk = GptConfig.llama if args.llama else GptConfig
    if args.tiny:
        cfg0 = mk(vocab=128, embed=64, heads=4, layers=2,
                  mlp_ratio=2, max_seq=64, dtype="f32", kv_heads=kvh,
                  kv_quant=args.kv_quant)
        s0, g = 8, (4, 12)
        batches = (1, 2)
    else:
        cfg0 = mk(vocab=50304, embed=768, heads=12, layers=12,
                  mlp_ratio=4, max_seq=640, dtype="bf16", kv_heads=kvh,
                  kv_quant=args.kv_quant)
        s0, g = 512, (8, 40)
        batches = (1, 8)

    tgt = current_target()
    results = {"config": {"llama": args.llama or None,
                          "kv_heads": kvh, "kv_quant": args.kv_quant},
               "rows": []}
    params0 = init_params(cfg0, seed=0)

    for B in batches:
        ids = jnp.asarray(np.random.default_rng(0).integers(
            0, cfg0.vocab, (B, s0)), jnp.int32)
        for form in ("xla", "pallas"):
            cfg = dataclasses.replace(cfg0, decode_attn=form)
            # unstacked decode (the measured-fastest hybrid): params as-is
            _, cache = make_prefill(cfg, use_pallas=False)(
                stack_params(params0), ids)
            step = make_decode_step(cfg)
            tok = jnp.full((B,), 7, jnp.int32)

            @functools.partial(jax.jit, static_argnums=3)
            def step_n(params, cache, tok, n, step=step):
                def body(carry, _):
                    cache, tok = carry
                    logits, cache = step(params, cache, tok)
                    return (cache,
                            jnp.argmax(logits, -1).astype(jnp.int32)), \
                        jnp.sum(logits.astype(jnp.float32))
                _, sums = jax.lax.scan(body, (cache, tok), None, length=n)
                return sums

            sec = _slope(
                lambda n: float(jnp.sum(step_n(params0, cache, tok, n))),
                g[0], g[1], args.reps)
            # HBM roof: weights + one KV window read per token
            row = {"batch": B, "form": form,
                   "ms_per_tok": round(sec * 1e3, 4),
                   "tok_per_s": round(B / sec, 1)}
            results["rows"].append(row)
            print(json.dumps(row), flush=True)

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
