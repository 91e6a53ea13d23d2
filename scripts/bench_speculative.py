#!/usr/bin/env python
"""Speculative-decoding benchmark: measured macro-step cost vs the
single-token decode baseline (GPT-2-small-class target, 2-layer draft).

What is MEASURED on hardware:
- t_tok: target single-token decode seconds/token (the baseline).
- t_macro(K): one full speculative round — K draft steps + ONE target
  verify pass over K+1 positions + accept/emit logic — measured by
  running the REAL generate loop with a random draft (acceptance ~0,
  so every macro emits exactly 1 token: wall time / tokens = t_macro).

What is DERIVED (and labeled as such): tokens/s at acceptance rate a.
t_macro does not depend on acceptance (the round always runs K drafts
+ 1 verify), and greedy speculative emits 1 + sum_{i=1..K} a^i expected
tokens per round, so
    tok/s(a) = (1 + sum a^i) / t_macro,   breakeven when > 1 / t_tok.
A trained draft pair determines a; random init gives a~0, so reporting
measured-rate-at-a would be meaningless — the cost structure is the
hardware truth, the acceptance is the model pair's property.

Timing: slope between two generate step counts (same discipline as
bench_serving: device-side loops, scalar read-out, median of reps).
"""

from __future__ import annotations

import argparse
import json
import time


def _slope(fn, n_short, n_long, reps):
    import jax.numpy as jnp

    fn(n_short)  # compile
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
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default="")
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--json", default="")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import functools

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import (GptConfig, init_params,
                                      make_decode_step, make_prefill,
                                      make_speculative_generate,
                                      stack_params)

    K = args.k
    if args.tiny:
        tcfg = GptConfig(vocab=128, embed=64, heads=4, layers=2,
                         mlp_ratio=2, max_seq=96, dtype="f32")
        dcfg = GptConfig(vocab=128, embed=32, heads=2, layers=1,
                         mlp_ratio=2, max_seq=96, dtype="f32")
        s0, g_short, g_long = 8, 4, 12
    else:
        tcfg = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                         mlp_ratio=4, max_seq=640, dtype="bf16")
        dcfg = GptConfig(vocab=50304, embed=768, heads=12, layers=2,
                         mlp_ratio=4, max_seq=640, dtype="bf16")
        s0, g_short, g_long = 256, 8, 40

    params = init_params(tcfg, seed=0)
    draft = init_params(dcfg, seed=1)   # random: acceptance ~ 0
    sparams = stack_params(params)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, tcfg.vocab, (1, s0)), jnp.int32)

    results = {"k": K, "target_layers": tcfg.layers,
               "draft_layers": dcfg.layers, "dtype": tcfg.dtype}

    # baseline: single-token decode seconds/token (greedy scan)
    step = make_decode_step(tcfg)
    prefill = make_prefill(tcfg)
    _, cache = prefill(sparams, ids)
    tok = jnp.full((1,), 7, jnp.int32)

    @functools.partial(jax.jit, static_argnums=3)
    def step_n(params, cache, tok, n):
        def body(carry, _):
            cache, tok = carry
            logits, cache = step(params, cache, tok)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), \
                jnp.sum(logits.astype(jnp.float32))
        _, sums = jax.lax.scan(body, (cache, tok), None, length=n)
        return sums

    t_tok = _slope(
        lambda n: float(jnp.sum(step_n(params, cache, tok, n))),
        g_short, g_long, args.reps)
    results["t_tok_ms"] = round(t_tok * 1e3, 4)
    print(f"single-token decode: {t_tok * 1e3:.3f} ms/tok "
          f"({1 / t_tok:,.0f} tok/s)")

    # real macro cost: with a random draft every macro emits exactly 1
    # token, so generate(steps=N) runs N macros. Build the two jitted
    # generates ONCE — rebuilding inside the timed fn retraces and
    # re-serializes the HLO every call and the jitter lands in the
    # slope (r5 first run measured 16.5x t_tok this way; the bisect
    # with cached gens is the trustworthy number).
    gens = {n: make_speculative_generate(tcfg, dcfg, n, k=K)
            for n in (g_short, g_long)}

    def spec_steps(n):
        toks, stats = gens[n](sparams, draft, ids)
        return float(jnp.sum(toks)) + int(stats["macro_steps"])

    t_macro = _slope(spec_steps, g_short, g_long, args.reps)
    results["t_macro_ms"] = round(t_macro * 1e3, 4)
    print(f"speculative macro (K={K} drafts + 1 verify): "
          f"{t_macro * 1e3:.3f} ms")
    print(f"verify-amortization: one macro = {t_macro / t_tok:.2f} "
          f"single-token steps; emits up to {K + 1} tokens")

    rows = {}
    for a in (0.0, 0.6, 0.7, 0.8, 0.9, 1.0):
        exp_tokens = 1 + sum(a ** i for i in range(1, K + 1))
        tok_s = exp_tokens / t_macro
        rows[str(a)] = {"expected_tokens_per_macro": round(exp_tokens, 2),
                        "tokens_per_s": round(tok_s, 1),
                        "speedup_vs_decode": round(tok_s * t_tok, 2)}
        print(f"  acceptance {a:.1f}: {exp_tokens:.2f} tok/macro -> "
              f"{tok_s:,.0f} tok/s ({tok_s * t_tok:.2f}x decode)")
    results["derived_tok_s_by_acceptance"] = rows

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
