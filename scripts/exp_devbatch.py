#!/usr/bin/env python
"""Bisect the device-scheduler macro's per-iteration cost (r7).

batching_r7.json implies ~12 ms per macro iteration where the plain
decode step runs ~1 ms — this experiment isolates WHICH in-graph
scheduling component pays, by timing fori_loop bodies of increasing
scheduling content at two static lengths (slope cancels dispatch/RTT):

  M0  decode step + argmax only (the host loop's scan body, as a fori)
  M0s same, as lax.scan (scan-vs-while lowering check)
  M1  + retire wheres + out-buffer gather/scatter bookkeeping
  M2  + the admission lax.cond (never taken: wcount=0)
  M3  + the admission cond TAKEN every iteration (slab DUS upper bound)

All rows share one cache/params; GPT-2-small bf16, 8 slots, max_seq 640
(the batching_r7 geometry)."""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default="")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--lens", type=int, nargs=2, default=(32, 128))
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--json", default="benchmarks/results/devbatch_r7.json")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import (GptConfig, init_params,
                                      init_slot_cache, init_staging,
                                      make_decode_step, stack_params)
    from tpp_mlir_tpu.serving.batching import make_stage_prefill

    if args.tiny:
        cfg = GptConfig(vocab=128, embed=64, heads=4, layers=2,
                        mlp_ratio=2, max_seq=64, dtype="f32")
    else:
        cfg = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                        mlp_ratio=4, max_seq=640, dtype="bf16")
    B, S = args.slots, cfg.max_seq
    params = init_params(cfg, seed=0)
    step = make_decode_step(cfg)

    R = 32                      # out-buffer rows (batching_r7 geometry)
    MAXNEW = 96
    W = 24                      # staging rows (wave 16 + prefill 8)

    def init_state():
        cache = init_slot_cache(cfg, B)
        # park all slots at a mid position so decode does real work
        cache["pos"] = jnp.full((B,), S // 2, jnp.int32)
        tok = jnp.zeros((B,), jnp.int32)
        rid = jnp.asarray(np.arange(B) % R, jnp.int32)
        left = jnp.full((B,), 10**6, jnp.int32)   # never retires
        out = jnp.zeros((R + 1, MAXNEW), jnp.int32)
        olen = jnp.zeros((R + 1,), jnp.int32)
        return cache, tok, rid, left, out, olen

    staging = init_staging(cfg, W)
    wmeta = tuple(jnp.zeros((16,), jnp.int32) for _ in range(4))

    # params/staging/meta MUST be runtime ARGUMENTS of every jitted
    # runner — closed-over arrays serialize into the HLO and the remote
    # compile request 413s (CLAUDE.md r4 lesson)
    def decode_only(params, staging, wmeta, st, _i):
        cache, tok, rid, left, out, olen = st
        logits, cache = step(params, cache, tok)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return cache, tok, rid, left, out, olen

    def with_sched(params, staging, wmeta, st, _i):
        cache, tok, rid, left, out, olen = st
        done = (rid < R) & (left <= 0)
        rid = jnp.where(done, R, rid)
        cache = dict(cache)
        cache["pos"] = jnp.where(done, S, cache["pos"])
        logits, cache = step(params, cache, tok)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        live = (rid < R) & (left > 0)
        row = jnp.where(live, rid, R)
        col = jnp.clip(olen[row], 0, MAXNEW - 1)
        out = out.at[row, col].set(jnp.where(live, nxt, out[row, col]))
        olen = olen.at[row].add(live.astype(olen.dtype))
        left = jnp.where(live, left - 1, left)
        tok = jnp.where(live, nxt, tok)
        return cache, tok, rid, left, out, olen

    def make_admit(always: bool):
        def body(params, staging, wmeta, st, i):
            wlen, wnew, wfirst, wrid = wmeta
            cache, tok, rid, left, out, olen = st

            def admit(stt):
                cache, tok, rid, left = stt
                slot = jnp.asarray(0, jnp.int32)
                li = jnp.asarray(0, jnp.int32)
                newc = dict(cache)
                for key in staging:
                    src = jax.lax.dynamic_slice(
                        staging[key],
                        (0, li) + (0,) * (staging[key].ndim - 2),
                        (staging[key].shape[0], 1)
                        + staging[key].shape[2:])
                    newc[key] = jax.lax.dynamic_update_slice(
                        cache[key], src.astype(cache[key].dtype),
                        (0, slot) + (0,) * (cache[key].ndim - 2))
                newc["pos"] = cache["pos"].at[slot].set(wlen[li] + S // 2)
                tok = tok.at[slot].set(wfirst[li])
                rid = rid.at[slot].set(wrid[li] % (R + 1))
                left = left.at[slot].set(10**6)
                return newc, tok, rid, left

            can = (jnp.any(rid >= 0) if always
                   else (i < -1))            # never taken
            cache, tok, rid, left = jax.lax.cond(
                can, admit, lambda s: s, (cache, tok, rid, left))
            return with_sched(params, staging, wmeta,
                              (cache, tok, rid, left, out, olen), i)

        return body

    import functools

    @functools.lru_cache(maxsize=None)
    def runner(case_idx, n, kind):
        body = cases[case_idx][1]

        def f(params, staging, wmeta, state):
            if kind == "fori":
                def b(i, s):
                    return body(params, staging, wmeta, s, i)
                return jax.lax.fori_loop(0, n, b, state)
            def b(s, i):
                return body(params, staging, wmeta, s, i), None
            return jax.lax.scan(b, state, jnp.arange(n))[0]

        return jax.jit(f)

    def force(st):
        return float(jnp.sum(st[1].astype(jnp.float32)))

    n_lo, n_hi = args.lens
    rows = {}
    cases = [("M0_decode_fori", decode_only, "fori"),
             ("M0s_decode_scan", decode_only, "scan"),
             ("M1_sched", with_sched, "fori"),
             ("M2_cond_untaken", make_admit(False), "fori"),
             ("M3_cond_taken", make_admit(True), "fori")]
    for ci, (name, _body, kind) in enumerate(cases):
        lo, hi = runner(ci, n_lo, kind), runner(ci, n_hi, kind)
        force(lo(params, staging, wmeta, init_state()))   # warm
        force(hi(params, staging, wmeta, init_state()))
        best = None
        for _ in range(args.reps):
            st = init_state()
            t0 = time.perf_counter()
            force(lo(params, staging, wmeta, st))
            t_lo = time.perf_counter() - t0
            st = init_state()
            t0 = time.perf_counter()
            force(hi(params, staging, wmeta, st))
            t_hi = time.perf_counter() - t0
            per = (t_hi - t_lo) / (n_hi - n_lo)
            best = per if best is None else min(best, per)
        rows[name] = round(best * 1e3, 4)
        print(f"{name:18s} {best * 1e3:8.3f} ms/iter", flush=True)

    with open(args.json, "w") as f:
        json.dump({"config": {"slots": B, "lens": args.lens},
                   "ms_per_iter": rows}, f, indent=1)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
