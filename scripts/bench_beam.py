#!/usr/bin/env python
"""Beam-search serving benchmark (r4 verdict #4): beam W tok/s vs greedy
decode on the same GPT-2-small-class model.

Beam search advances B*W beams one position per step (one batched decode
step of batch B*W plus a (B, W*V) top-k and a cache reorder `jnp.take`),
but only emits B useful tokens per step — the honest roof is the greedy
B*W-batch decode rate divided by W, plus reshuffle overhead. This run
measures, in ONE process:

  greedy b=B     — the user-facing baseline (tokens actually emitted)
  greedy b=B*W   — the batch-inflated decode floor beam rides on
  beam W         — make_beam_generate slope between two step counts
                   (prefill cost is per-call constant: it cancels)

Usage: python scripts/bench_beam.py [--beams 4] [--tiny --platform cpu]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default="")
    p.add_argument("--beams", type=int, default=4)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--json", default="benchmarks/results/beam_r5.json")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import functools

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import (GptConfig, init_params,
                                      make_decode_step, make_prefill,
                                      stack_params)
    from tpp_mlir_tpu.serving.beam import make_beam_generate

    if args.tiny:
        cfg = GptConfig(vocab=128, embed=64, heads=4, layers=2,
                        mlp_ratio=2, max_seq=96, dtype="f32")
        B, s0, steps = (2, 16, (4, 12))
    else:
        cfg = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                        mlp_ratio=4, max_seq=640, dtype="bf16")
        B, s0, steps = (8, 512, (16, 64))
    W = args.beams
    params = stack_params(init_params(cfg, seed=0))
    ids = jnp.asarray(np.random.default_rng(1).integers(
        0, cfg.vocab, (B, s0)), jnp.int32)
    results = {"geometry": {"B": B, "s0": s0, "beams": W,
                            "dtype": cfg.dtype}, "rows": {}}

    # ---- greedy decode baselines (b=B and b=B*W) -------------------------
    prefill = make_prefill(cfg)
    step = make_decode_step(cfg)

    @functools.partial(jax.jit, static_argnums=3)
    def step_n(params, cache, tok, n):
        def body(carry, _):
            cache, tok = carry
            logits, cache = step(params, cache, tok)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), \
                logits[0, 0]
        (cache, tok), probe = jax.lax.scan(body, (cache, tok), None,
                                           length=n)
        return probe, tok

    def slope(fn, pair, reps):
        for n in pair:
            float(jnp.sum(fn(n)[0]))
        sl = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(fn(pair[0])[0]))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(fn(pair[1])[0]))
            tl = time.perf_counter() - t0
            sl.append((tl - ts) / (pair[1] - pair[0]))
        sl.sort()
        return sl[len(sl) // 2]

    for b in (B, B * W):
        idsb = jnp.tile(ids, (b // B, 1))
        _, cache = prefill(params, idsb)
        tok = jnp.zeros((b,), jnp.int32)
        per = slope(lambda n: step_n(params, cache, tok, n), steps,
                    args.reps)
        results["rows"][f"greedy_b{b}"] = {
            "s_per_step": per, "tokens_per_s": round(b / per, 1)}
        print(f"greedy b={b}: {b / per:,.0f} tok/s "
              f"({per * 1e3:.3f} ms/step)", flush=True)

    # ---- beam search ------------------------------------------------------
    gens = {n: make_beam_generate(cfg, steps=n, beams=W) for n in steps}

    def beam_run(n):
        toks, scores = gens[n](params, ids)
        return jnp.sum(scores), toks

    per = slope(beam_run, steps, args.reps)
    g = results["rows"][f"greedy_b{B}"]["s_per_step"]
    gw = results["rows"][f"greedy_b{B * W}"]["s_per_step"]
    results["rows"][f"beam_w{W}"] = {
        "s_per_step": per,
        "tokens_per_s": round(B / per, 1),      # emitted best-beam tokens
        "cost_vs_greedy": round(per / g, 2),
        "overhead_vs_bWbatch_floor": round(per / gw, 2),
    }
    print(f"beam W={W}: {B / per:,.0f} emitted tok/s "
          f"({per * 1e3:.3f} ms/step; {per / g:.2f}x greedy cost, "
          f"{per / gw:.2f}x the b={B * W} decode floor)", flush=True)

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
