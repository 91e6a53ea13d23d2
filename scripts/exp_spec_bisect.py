#!/usr/bin/env python
"""r5: bisect the speculative macro's 16.5x-of-t_tok cost (verdict r4
#4 follow-up; speculative_r5.json measured t_macro 7.94 ms against a
0.48 ms single-token step — the macro should cost ~2-3 steps: k+1
cheap draft steps + ONE verify extend).

Components, each as its own jitted scan slope (same discipline as the
macro measurement itself):
  t_tok        single-token target decode (the baseline)
  draft_scan   k+1 draft steps (2-layer draft), no verify
  verify       one extend(k+1) pass on the target, no drafts
  accept       the emit/accept vector logic alone (trivially cheap?)
  macro        the full speculative round (reference point)

Usage: python scripts/exp_spec_bisect.py [--json out.json]
"""

from __future__ import annotations

import argparse
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
    p.add_argument("--json", default="benchmarks/results/spec_bisect_r5.json")
    p.add_argument("--platform", default="")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--draft-vocab", type=int, default=0,
                   help="also measure the truncated-draft-head variant "
                        "(draft lm_head sliced to this many columns)")
    p.add_argument("--trunk", type=int, default=0,
                   help="also measure the tied-trunk (self-speculative) "
                        "macro with this many target layers as the draft")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import (GptConfig, init_params,
                                      make_decode_step, make_extend,
                                      make_prefill,
                                      make_speculative_generate,
                                      stack_params)

    K = args.k
    if args.tiny:
        tcfg = GptConfig(vocab=128, embed=64, heads=4, layers=2,
                         mlp_ratio=2, max_seq=96, dtype="f32")
        dcfg = GptConfig(vocab=128, embed=32, heads=2, layers=1,
                         mlp_ratio=2, max_seq=96, dtype="f32")
        s0, g_short, g_long = 8, 2, 6
    else:
        tcfg = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                         mlp_ratio=4, max_seq=640, dtype="bf16")
        dcfg = GptConfig(vocab=50304, embed=768, heads=12, layers=2,
                         mlp_ratio=4, max_seq=640, dtype="bf16")
        s0, g_short, g_long = 256, 8, 40

    params = init_params(tcfg, seed=0)
    draft = init_params(dcfg, seed=1)
    sparams = stack_params(params)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, tcfg.vocab, (1, s0)), jnp.int32)

    results = {"k": K, "draft_layers": dcfg.layers, "dtype": tcfg.dtype}

    step_t = make_decode_step(tcfg)
    step_d = make_decode_step(dcfg)
    prefill_t = make_prefill(tcfg)
    prefill_d = make_prefill(dcfg)
    verify = make_extend(tcfg)

    _, tcache = prefill_t(sparams, ids)
    _, dcache = prefill_d(draft, ids)
    tok = jnp.full((1,), 7, jnp.int32)

    # --- t_tok ------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=3)
    def step_n(params, cache, tok, n):
        def body(carry, _):
            cache, tok = carry
            logits, cache = step_t(params, cache, tok)
            return (cache, jnp.argmax(logits, -1).astype(jnp.int32)), \
                jnp.sum(logits.astype(jnp.float32))
        _, sums = jax.lax.scan(body, (cache, tok), None, length=n)
        return sums

    t_tok = _slope(lambda n: float(jnp.sum(step_n(sparams, tcache, tok, n))),
                   g_short, g_long, args.reps)
    results["t_tok_ms"] = round(t_tok * 1e3, 4)
    print(f"t_tok: {t_tok*1e3:.3f} ms", flush=True)

    # --- draft scan: n rounds of (k+1) draft steps ------------------------
    @functools.partial(jax.jit, static_argnums=2)
    def draft_rounds(draft, dcache, n):
        def round_(carry, _):
            dcache, t = carry

            def dstep(c, _):
                dc, t = c
                logits, dc = step_d(draft, dc, t)
                return (dc, jnp.argmax(logits, -1).astype(jnp.int32)), \
                    logits[0, 0]
            (dcache, t), ls = jax.lax.scan(dstep, (dcache, t), None,
                                           length=K + 1)
            return (dcache, t), jnp.sum(ls.astype(jnp.float32))
        (_, _), sums = jax.lax.scan(round_, (dcache, tok), None, length=n)
        return sums

    t_draft = _slope(
        lambda n: float(jnp.sum(draft_rounds(draft, dcache, n))),
        g_short, g_long, args.reps)
    results["draft_round_ms"] = round(t_draft * 1e3, 4)
    print(f"draft (k+1 steps/round): {t_draft*1e3:.3f} ms", flush=True)

    # --- verify: n extend(k+1) passes -------------------------------------
    @functools.partial(jax.jit, static_argnums=2)
    def verify_n(params, tcache, n):
        u0 = jnp.zeros((1, K + 1), jnp.int32)

        def body(carry, _):
            tcache, u = carry
            logits, tcache = verify(params, tcache, u)
            # keep pos fixed so n rounds stay shape/position-comparable
            tcache = dict(tcache)
            tcache["pos"] = tcache["pos"] - (K + 1)
            nxt = jnp.argmax(logits[0], -1).astype(jnp.int32)[None]
            return (tcache, nxt), jnp.sum(logits.astype(jnp.float32))
        (_, _), sums = jax.lax.scan(body, (tcache, u0), None, length=n)
        return sums

    t_ver = _slope(
        lambda n: float(jnp.sum(verify_n(sparams, tcache, n))),
        g_short, g_long, args.reps)
    results["verify_ms"] = round(t_ver * 1e3, 4)
    print(f"verify extend({K+1}): {t_ver*1e3:.3f} ms", flush=True)

    # --- full macro (reference) -------------------------------------------
    # build the two jitted generates ONCE: rebuilding per timing call
    # (the r5 bench_speculative flaw) retraces + reserializes the HLO
    # on every invocation and the retrace jitter lands in the slope
    gens = {n: make_speculative_generate(tcfg, dcfg, n, k=K)
            for n in (g_short, g_long)}

    def spec_steps(n):
        toks, stats = gens[n](sparams, draft, ids)
        return float(jnp.sum(toks)) + int(stats["macro_steps"])

    t_macro = _slope(spec_steps, g_short, g_long, args.reps)
    results["macro_ms"] = round(t_macro * 1e3, 4)
    lg = t_macro - t_draft - t_ver
    results["unaccounted_ms"] = round(lg * 1e3, 4)
    print(f"macro: {t_macro*1e3:.3f} ms; draft+verify = "
          f"{(t_draft+t_ver)*1e3:.3f} ms; unaccounted {lg*1e3:.3f} ms",
          flush=True)

    # --- truncated draft head (draft_vocab) --------------------------------
    if args.draft_vocab:
        dv = args.draft_vocab
        results["draft_vocab"] = dv
        draft_t = dict(draft)
        draft_t["lm_head"] = jnp.asarray(draft["lm_head"][:, :dv])
        t_draft_t = _slope(
            lambda n: float(jnp.sum(draft_rounds(draft_t, dcache, n))),
            g_short, g_long, args.reps)
        results["draft_round_trunc_ms"] = round(t_draft_t * 1e3, 4)
        print(f"draft trunc v{dv} (k+1 steps/round): "
              f"{t_draft_t*1e3:.3f} ms", flush=True)

        gens_t = {n: make_speculative_generate(tcfg, dcfg, n, k=K,
                                               draft_vocab=dv)
                  for n in (g_short, g_long)}

        def spec_steps_t(n):
            toks, stats = gens_t[n](sparams, draft, ids)
            return float(jnp.sum(toks)) + int(stats["macro_steps"])

        t_macro_t = _slope(spec_steps_t, g_short, g_long, args.reps)
        results["macro_trunc_ms"] = round(t_macro_t * 1e3, 4)
        print(f"macro trunc v{dv}: {t_macro_t*1e3:.3f} ms "
              f"(= {t_macro_t/t_tok:.2f}x t_tok; full-head macro was "
              f"{t_macro/t_tok:.2f}x)", flush=True)

    # --- tied-trunk (self-speculative) macro --------------------------------
    if args.trunk:
        results["trunk_layers"] = args.trunk
        gens_k = {n: make_speculative_generate(tcfg, None, n, k=K,
                                               trunk_layers=args.trunk)
                  for n in (g_short, g_long)}

        def spec_steps_k(n):
            toks, stats = gens_k[n](sparams, ids)
            return float(jnp.sum(toks)) + int(stats["macro_steps"])

        t_macro_k = _slope(spec_steps_k, g_short, g_long, args.reps)
        results["macro_trunk_ms"] = round(t_macro_k * 1e3, 4)
        # acceptance on THIS model/prompt (random-init: expect low; with
        # imported real weights this is the early-exit acceptance rate)
        _, st = gens_k[g_long](sparams, ids)
        acc = int(st["accepted"]), int(st["drafted"])
        results["trunk_acceptance"] = {"accepted": acc[0],
                                       "drafted": acc[1]}
        print(f"macro trunk N={args.trunk}: {t_macro_k*1e3:.3f} ms "
              f"(= {t_macro_k/t_tok:.2f}x t_tok; separate-draft macro "
              f"{t_macro/t_tok:.2f}x); acceptance {acc[0]}/{acc[1]}",
              flush=True)

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
