#!/usr/bin/env python
"""MoE-8 top-2 prefill forms head-to-head on v5e (r4 verdict #1).

One process, one run (CLAUDE.md: cross-run variance under the shared
tunnel is ±20-40% — compare variants within ONE driver run):

  1. raw grouped-kernel microbench: the two grouped GEMMs at the exact
     serving geometry (A_pad x E -> F -> E), perf.bench slope — the
     kernel-level roofline row;
  2. end-to-end prefill slope per form: scan (exact, n_e x dense),
     sorted (GShard capacity, ~cf*k x dense + gather/scatter round
     trip), grouped (dropless Pallas BRGEMM, ~k x dense, exact).

Useful-flops roof: each token computes top_k expert FFNs (what the
dense-selection oracle does); any form's padding/capacity inflation is
overhead, not credit.

Usage: python scripts/exp_moe_grouped.py [--json out.json] [--bm 128]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", default="benchmarks/results/moe_grouped_r5.json")
    p.add_argument("--bm", type=int, default=128)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--platform", default="")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.runtime import perf
    from tpp_mlir_tpu.serving import (GptConfig, init_params, make_prefill,
                                      stack_params)
    from tpp_mlir_tpu.utils.target import current_target, roofline_flops
    from tpp_mlir_tpu.xsmm import build_kernel
    from tpp_mlir_tpu.xsmm.flags import GroupedGemmKey

    if args.tiny:
        cfg0 = GptConfig(vocab=128, embed=64, heads=4, layers=2,
                         mlp_ratio=2, max_seq=64, dtype="f32",
                         n_experts=8, top_k=2, moe_group_bm=8)
        B, s0, pf = 2, 16, (2, 6)
    else:
        cfg0 = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                         mlp_ratio=4, max_seq=640, dtype="bf16",
                         n_experts=8, top_k=2, moe_group_bm=args.bm)
        B, s0, pf = 8, 512, (2, 10)

    E, F, n_e, k = cfg0.embed, cfg0.mlp_ratio * cfg0.embed, 8, cfg0.top_k
    tgt = current_target()
    roof = roofline_flops(cfg0.dtype) / 1e12
    results = {"target": tgt.name, "bm": args.bm,
               "geometry": {"B": B, "s0": s0, "embed": E, "ffn": F,
                            "experts": n_e, "top_k": k,
                            "dtype": cfg0.dtype}}

    # ---- 1. raw grouped-kernel microbench --------------------------------
    T = B * s0
    A = T * k
    bm = cfg0.moe_group_bm
    A_pad = (-(-A // bm) + n_e) * bm
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((A_pad, E)), jnp.bfloat16
                     if cfg0.dtype == "bf16" else jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((n_e, E, F)) * 0.05, xs.dtype)
    w2 = jnp.asarray(rng.standard_normal((n_e, F, E)) * 0.05, xs.dtype)
    # balanced routing: blocks round-robin... sorted => contiguous runs
    ge = jnp.asarray(np.sort(rng.integers(0, n_e, A_pad // bm)), jnp.int32)
    k1 = GroupedGemmKey(n_groups=n_e, m=A_pad, n=F, k=E, dtype=cfg0.dtype,
                        bm=bm, unary_kind="gelu")
    k2 = GroupedGemmKey(n_groups=n_e, m=A_pad, n=E, k=F, dtype=cfg0.dtype,
                        bm=bm)
    f1, f2 = build_kernel(k1), build_kernel(k2)

    def pair(ge, xs, w1, w2):
        a = f1(ge, xs, w1)
        return f2(ge, a, w2)

    fl_pair = 2 * A_pad * E * F * 2
    # ~0.3 ms/iter expected at this size -> iters pre-sized, no escalation
    r = perf.bench(pair, (ge, xs, w1, w2), iters=1024, flops=fl_pair)
    results["kernel_pair"] = {
        "A_pad": int(A_pad), "seconds": r.mean_seconds,
        "tflops": round(r.gflops / 1e3, 1),
        "pct_roof": round(100 * r.gflops / 1e3 / roof, 1),
    }
    print(f"grouped kernel pair A_pad={A_pad}: {r.gflops/1e3:.1f} TF = "
          f"{100 * r.gflops / 1e3 / roof:.1f}% of {cfg0.dtype} roof",
          flush=True)

    # ---- 1b. dispatch-glue + whole-FFN component benches ------------------
    from tpp_mlir_tpu.serving.engine import _moe_ffn_grouped

    blk_ffn = {"wr": jnp.asarray(rng.standard_normal((E, n_e)) * 0.3,
                                 xs.dtype),
               "w1": w1, "w2": w2}
    h_tok = jnp.asarray(rng.standard_normal((T, E)), xs.dtype)

    ffn_fn = jax.jit(lambda h, blk: _moe_ffn_grouped(h, blk, cfg0))
    rf = perf.bench(lambda h: ffn_fn(h, blk_ffn), (h_tok,), iters=512,
                    flops=2 * A * E * F * 2)   # useful: A (not A_pad)
    results["ffn_e2e"] = {
        "seconds": rf.mean_seconds,
        "tflops": round(rf.gflops / 1e3, 1),
        "pct_useful_roof": round(100 * rf.gflops / 1e3 / roof, 1)}
    print(f"grouped FFN e2e (glue + kernels): {rf.gflops/1e3:.1f} TF "
          f"useful = {100*rf.gflops/1e3/roof:.1f}%", flush=True)

    def glue_only(h, blk):
        # dispatch construction only: gates, the single sort, padded-slot
        # maps, the xs gather — everything but the two kernels and the
        # combine (mirrors engine._moe_ffn_grouped's single-sort glue)
        from tpp_mlir_tpu.serving.engine import _moe_gates
        gates, idx2 = _moe_gates(h, blk["wr"], k)
        e_flat = idx2.reshape(A)
        oh = (e_flat[:, None] == jnp.arange(n_e)).astype(jnp.int32)
        csum = jnp.cumsum(oh, axis=0)
        rank = jnp.take_along_axis(csum, e_flat[:, None], 1)[:, 0] - 1
        counts = csum[-1]
        start = jnp.cumsum(counts) - counts
        padded = ((counts + bm - 1) // bm) * bm
        ends = jnp.cumsum(padded)
        offs = ends - padded
        fused = e_flat.astype(jnp.int32) * jnp.int32(A) + \
            jnp.arange(A, dtype=jnp.int32)
        t_s = (jax.lax.sort(fused) % jnp.int32(A)) // jnp.int32(k)
        pslot = jnp.arange(A_pad)
        pe = jnp.minimum(jnp.searchsorted(ends, pslot, side="right"),
                         n_e - 1)
        loc = pslot - offs[pe]
        valid = loc < counts[pe]
        si = start[pe] + jnp.where(valid, loc, 0)
        tt = jnp.where(valid, t_s[si], h.shape[0])
        hp = jnp.concatenate([h, jnp.zeros((1, E), h.dtype)], 0)
        return hp[tt], offs[e_flat] + rank

    gfn = jax.jit(glue_only)
    rg = perf.bench(lambda h: gfn(h, blk_ffn), (h_tok,), iters=2048)
    results["glue"] = {"seconds": rg.mean_seconds,
                       "us": round(rg.mean_seconds * 1e6, 1)}
    print(f"dispatch glue only: {rg.mean_seconds*1e6:.1f} us "
          f"(kernel pair {results['kernel_pair']['seconds']*1e6:.1f} us)",
          flush=True)

    # combine-only: the gather + gate-FMA that folds (A_pad, E) expert
    # rows back into (T, E) token rows (the engine's unrolled form)
    ys_mock = jnp.asarray(rng.standard_normal((A_pad, E)), xs.dtype)
    rows_mock = jnp.asarray(rng.integers(0, A_pad, (T, k)), jnp.int32)
    gates_mock = jnp.asarray(rng.standard_normal((T, k)), jnp.float32)

    def combine_only(ys, rows, gates):
        o = jnp.zeros((T, E), jnp.float32)
        for j in range(k):
            o = o + (gates[:, j, None]
                     * ys[rows[:, j]].astype(jnp.float32))
        return o.astype(xs.dtype)

    cfn = jax.jit(combine_only)
    rc = perf.bench(lambda y: cfn(y, rows_mock, gates_mock), (ys_mock,),
                    iters=2048)
    results["combine"] = {"seconds": rc.mean_seconds,
                          "us": round(rc.mean_seconds * 1e6, 1)}
    acc = (results["kernel_pair"]["seconds"] + rg.mean_seconds
           + rc.mean_seconds)
    results["unaccounted_us"] = round(
        (results["ffn_e2e"]["seconds"] - acc) * 1e6, 1)
    print(f"combine only: {rc.mean_seconds*1e6:.1f} us; ledger "
          f"kernels+glue+combine = {acc*1e6:.1f} us vs e2e "
          f"{results['ffn_e2e']['seconds']*1e6:.1f} us "
          f"(unaccounted {results['unaccounted_us']} us)", flush=True)

    # ---- 2. end-to-end prefill per form ----------------------------------
    ids = jnp.asarray(np.random.default_rng(1).integers(
        0, cfg0.vocab, (B, s0)), jnp.int32)
    # useful flops (top_k x dense FFN)
    M = B * s0
    blk = (4 * 2 * M * E * E + k * (2 * 2 * M * E * F)
           + 2 * 2 * B * cfg0.heads * s0 * s0 * (E // cfg0.heads))
    fl = cfg0.layers * blk + 2 * M * E * cfg0.vocab

    for form in ("scan", "sorted", "grouped"):
        cfg = dataclasses.replace(cfg0, moe_prefill_form=form)
        params = stack_params(init_params(cfg, seed=0))
        prefill = make_prefill(cfg)

        @functools.partial(jax.jit, static_argnums=2)
        def prefill_n(params, ids, n, prefill=prefill):
            def body(ids, _):
                logits, _ = prefill(params, ids)
                shift = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (ids + shift[:, None]) % cfg0.vocab, \
                    jnp.sum(logits.astype(jnp.float32))
            ids, sums = jax.lax.scan(body, ids, None, length=n)
            return sums

        for n in pf:
            for attempt in range(3):
                try:
                    float(jnp.sum(prefill_n(params, ids, n)))
                    break
                except Exception as e:
                    if attempt == 2:
                        raise
                    print(f"retry {form} n={n}: {type(e).__name__}",
                          flush=True)
                    time.sleep(15)
        slopes = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(prefill_n(params, ids, pf[0])))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(prefill_n(params, ids, pf[1])))
            tl = time.perf_counter() - t0
            slopes.append((tl - ts) / (pf[1] - pf[0]))
        slopes.sort()
        sec = slopes[len(slopes) // 2]
        tf = fl / sec / 1e12
        results[form] = {
            "seconds": sec, "tflops": round(tf, 1),
            "pct_useful_roof": round(100 * tf / roof, 1),
            "tokens_per_s": round(M / sec, 1),
        }
        print(f"prefill form={form}: {M/sec:,.0f} tok/s, {tf:.1f} TF "
              f"= {100*tf/roof:.1f}% of useful-flops roof", flush=True)

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
