#!/usr/bin/env python
"""MoE grouped prefill: per-layer expert-slab copy under the stacked
scan (r5b follow-up to verdict r4 #1).

The r5 ledger left a contradiction: the grouped FFN benches at 50.5% of
the useful roof standalone, yet end-to-end prefill lands at 45.6-45.8%
— BELOW the FFN-only rate even though the non-FFN share of the model
runs at ~61% in the dense twin. Hypothesis: inside the stacked-layer
`lax.scan`, the per-layer (n_e, E, F) expert tables arrive as scan-xs
dynamic slices feeding a `pallas_call`, and XLA materializes each 36 MB
slab as a copy (the exact decode-attention finding, exp_decode_form
r5). Fix under test: GroupedGemmKey.layers — the kernel takes the FULL
(L, n_e, E, F) table plus a scalar-prefetched layer index, so the
per-layer slice only ever exists as a BlockSpec index.

One process, one run:
  1. micro: grouped FFN with direct per-layer weight args (r5 baseline);
  2. micro: the same FFN inside a 12-layer scan, weights as scan xs
     (the r5a engine form) — per-layer cost;
  3. micro: the scan with the stacked kernel (weights closed over,
     layer index as xs) — per-layer cost;
  4. e2e prefill: moe_group_stacked=False (r5a) vs True, same harness
     as exp_moe_grouped; plus bm=64 on the stacked form (halves the
     static padding bound 9216 -> 8704).

Usage: python scripts/exp_moe_stack.py [--json out.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", default="benchmarks/results/moe_stack_r5b.json")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--platform", default="")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.runtime import perf
    from tpp_mlir_tpu.serving import (GptConfig, init_params, make_prefill,
                                      stack_params)
    from tpp_mlir_tpu.serving.engine import _moe_ffn_grouped
    from tpp_mlir_tpu.utils.target import current_target, roofline_flops

    if args.tiny:
        cfg0 = GptConfig(vocab=128, embed=64, heads=4, layers=4,
                         mlp_ratio=2, max_seq=64, dtype="f32",
                         n_experts=8, top_k=2, moe_group_bm=8,
                         moe_prefill_form="grouped")
        B, s0, pf = 2, 16, (2, 6)
        iters_ffn, iters_scan = 16, 4
    else:
        cfg0 = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                         mlp_ratio=4, max_seq=640, dtype="bf16",
                         n_experts=8, top_k=2, moe_group_bm=128,
                         moe_prefill_form="grouped")
        B, s0, pf = 8, 512, (2, 10)
        iters_ffn, iters_scan = 512, 64

    E, F = cfg0.embed, cfg0.mlp_ratio * cfg0.embed
    n_e, k, L = cfg0.n_experts, cfg0.top_k, cfg0.layers
    tgt = current_target()
    roof = roofline_flops(cfg0.dtype) / 1e12
    T = B * s0
    A = T * k
    fl_ffn = 2 * A * E * F * 2            # useful (top_k x dense) flops
    results = {"target": tgt.name,
               "geometry": {"B": B, "s0": s0, "embed": E, "ffn": F,
                            "experts": n_e, "top_k": k, "layers": L,
                            "bm": cfg0.moe_group_bm,
                            "dtype": cfg0.dtype}}
    dt = jnp.bfloat16 if cfg0.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.standard_normal((T, E)), dt)
    w1f = jnp.asarray(rng.standard_normal((L, n_e, E, F)) * 0.05, dt)
    w2f = jnp.asarray(rng.standard_normal((L, n_e, F, E)) * 0.05, dt)
    wrf = jnp.asarray(rng.standard_normal((L, E, n_e)) * 0.3, dt)

    def pct(sec, flops):
        return round(100 * flops / sec / 1e12 / roof, 1)

    # ---- 1. direct per-layer args (the r5 standalone baseline) ----------
    def ffn_direct(h, wr, w1, w2):
        return _moe_ffn_grouped(h, {"wr": wr, "w1": w1, "w2": w2}, cfg0)

    # operands ride as ARGS, never closures: a closed-over device array
    # becomes an HLO literal and the remote-compile request dies with
    # Broken pipe at these sizes (CLAUDE.md r4)
    f_direct = jax.jit(ffn_direct)
    r = perf.bench(f_direct, (h0, wrf[0], w1f[0], w2f[0]),
                   iters=iters_ffn, flops=fl_ffn)
    results["ffn_direct"] = {"us": round(r.mean_seconds * 1e6, 1),
                             "pct_useful_roof": pct(r.mean_seconds, fl_ffn)}
    print(f"1. ffn direct args: {r.mean_seconds*1e6:.1f} us = "
          f"{results['ffn_direct']['pct_useful_roof']}%", flush=True)

    # ---- 2. scan over layers, weights as xs (the r5a engine form) -------
    def scan_xs(h, wrf, w1f, w2f):
        def body(h, ws):
            wr, w1, w2 = ws
            o = _moe_ffn_grouped(h, {"wr": wr, "w1": w1, "w2": w2}, cfg0)
            return o.astype(h.dtype), ()
        h, _ = jax.lax.scan(body, h, (wrf, w1f, w2f))
        return h

    f_xs = jax.jit(scan_xs)
    r = perf.bench(f_xs, (h0, wrf, w1f, w2f),
                   iters=iters_scan, flops=L * fl_ffn)
    results["ffn_scan_xs"] = {
        "us_per_layer": round(r.mean_seconds / L * 1e6, 1),
        "pct_useful_roof": pct(r.mean_seconds / L, fl_ffn)}
    print(f"2. scan weights-as-xs: {r.mean_seconds/L*1e6:.1f} us/layer = "
          f"{results['ffn_scan_xs']['pct_useful_roof']}%", flush=True)

    # ---- 3. scan with the stacked kernel (layer index in BlockSpec) -----
    def scan_stacked(h, wrf, w1f, w2f):
        def body(h, inp):
            wr, li = inp
            o = _moe_ffn_grouped(h, {"wr": wr}, cfg0,
                                 stacked=(w1f, w2f, li))
            return o.astype(h.dtype), ()
        h, _ = jax.lax.scan(body, h, (wrf, jnp.arange(L)))
        return h

    f_st = jax.jit(scan_stacked)
    r = perf.bench(f_st, (h0, wrf, w1f, w2f),
                   iters=iters_scan, flops=L * fl_ffn)
    results["ffn_scan_stacked"] = {
        "us_per_layer": round(r.mean_seconds / L * 1e6, 1),
        "pct_useful_roof": pct(r.mean_seconds / L, fl_ffn)}
    print(f"3. scan stacked-kernel: {r.mean_seconds/L*1e6:.1f} us/layer = "
          f"{results['ffn_scan_stacked']['pct_useful_roof']}%", flush=True)

    # ---- 4. e2e prefill: r5a form vs stacked vs stacked bm=64 -----------
    ids = jnp.asarray(np.random.default_rng(1).integers(
        0, cfg0.vocab, (B, s0)), jnp.int32)
    blk_fl = (4 * 2 * T * E * E + k * (2 * 2 * T * E * F)
              + 2 * 2 * B * cfg0.heads * s0 * s0 * (E // cfg0.heads))
    fl = L * blk_fl + 2 * T * E * cfg0.vocab

    variants = [
        ("prefill_r5a_slab", dict(moe_group_stacked=False)),
        ("prefill_stacked", dict(moe_group_stacked=True)),
        ("prefill_stacked_bm64", dict(moe_group_stacked=True,
                                      moe_group_bm=64)),
    ]
    if args.tiny:
        variants = variants[:2]
    for name, over in variants:
        cfg = dataclasses.replace(cfg0, **over)
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
                    print(f"retry {name} n={n}: {type(e).__name__}",
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
        results[name] = {"seconds": sec, "tflops": round(tf, 1),
                         "pct_useful_roof": round(100 * tf / roof, 1),
                         "tokens_per_s": round(T / sec, 1)}
        print(f"4. {name}: {T/sec:,.0f} tok/s, {tf:.1f} TF = "
              f"{100*tf/roof:.1f}% of useful roof", flush=True)

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
