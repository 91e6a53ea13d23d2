#!/usr/bin/env python
"""r6 follow-up: bisect the grouped-MoE training step (stacked form,
B8 s512) that measured 24.6% of the useful roof against the >=35% bar
(moe_train_r6.json). Rows, each a slope over two scan lengths:

  full_L12      the full train step (reference point; compile-cached
                from the exp_moe_train run when the engine is unchanged)
  fwd_L12       loss only (no grad) under the same timing scan — the
                fwd/bwd split
  full_L1       the same train step with ONE layer: the (head + embed +
                loss + optimizer) intercept; per-layer cost =
                (full_L12 - full_L1) / 11
The ledger prices where the non-roof time lives (body bwd vs the
824 MB f32 logits + log_softmax loss path) so the residual is either
fixed or honestly bounded.

Usage: python scripts/exp_moe_bisect.py [--json out.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", default="benchmarks/results/moe_bisect_r6.json")
    p.add_argument("--platform", default="")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import (GptConfig, init_params, make_prefill,
                                      stack_params)
    from tpp_mlir_tpu.utils.target import current_target, roofline_flops

    if args.tiny:
        base = dict(vocab=128, embed=64, heads=4, mlp_ratio=2, max_seq=64,
                    dtype="f32", n_experts=4, top_k=2, moe_group_bm=8)
        B, s0, pair, L = 2, 16, (2, 6), 2
    else:
        base = dict(vocab=50304, embed=768, heads=12, mlp_ratio=4,
                    max_seq=512, dtype="bf16", n_experts=8, top_k=2,
                    moe_group_bm=128)
        B, s0, pair, L = 8, 512, (2, 6), 12
    T = B * s0
    roof = roofline_flops(base["dtype"]) / 1e12
    tgt = current_target()

    def useful_flops(layers):
        E, F = base["embed"], base["mlp_ratio"] * base["embed"]
        k = base["top_k"]
        blk = (4 * 2 * T * E * E + k * (2 * 2 * T * E * F)
               + 2 * 2 * B * base["heads"] * s0 * s0
               * (E // base["heads"]))
        return 3 * (layers * blk + 2 * T * E * base["vocab"])

    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, base["vocab"], (B, s0)), jnp.int32)

    def build(layers, bm, grad):
        cfg = GptConfig(layers=layers, moe_prefill_form="grouped",
                        moe_group_stacked=True,
                        **{**base, "moe_group_bm": bm})
        params = stack_params(init_params(cfg, seed=0))
        prefill = make_prefill(cfg, use_pallas=None)

        def loss(params, ids):
            logits, _ = prefill(params, ids)
            lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            tgt_ids = ids[:, 1:]
            return -jnp.mean(jnp.take_along_axis(
                lp, tgt_ids[..., None], -1))

        if grad:
            grad_fn = jax.grad(loss)

            @functools.partial(jax.jit, static_argnums=2)
            def run_n(params, ids, n, grad_fn=grad_fn):
                def body(params, _):
                    g = grad_fn(params, ids)
                    params = jax.tree_util.tree_map(
                        lambda p, gi: (p - 1e-4 * gi.astype(jnp.float32))
                        .astype(p.dtype) if jnp.issubdtype(
                            p.dtype, jnp.floating) else p,
                        params, g)
                    return params, jnp.sum(
                        params["lnf_g"].astype(jnp.float32))
                _, sums = jax.lax.scan(body, params, None, length=n)
                return sums
        else:
            @functools.partial(jax.jit, static_argnums=2)
            def run_n(params, ids, n, loss=loss):
                def body(carry, _):
                    l = loss(params, ids + carry)  # carry keeps a dep
                    return (carry + 1) % 2, l
                _, ls = jax.lax.scan(body, jnp.int32(0), None, length=n)
                return ls
        return params, run_n

    def slope(params, run_n):
        for attempt in range(3):
            try:
                float(jnp.sum(run_n(params, ids, pair[0])))
                float(jnp.sum(run_n(params, ids, pair[1])))
                break
            except Exception as e:
                if attempt == 2:
                    raise
                print(f"retry: {type(e).__name__}", flush=True)
                time.sleep(15)
        out = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(run_n(params, ids, pair[0])))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(run_n(params, ids, pair[1])))
            tl = time.perf_counter() - t0
            out.append((tl - ts) / (pair[1] - pair[0]))
        out.sort()
        return out[len(out) // 2]

    rows = {}
    results = {"target": tgt.name, "B": B, "s0": s0, "rows": rows}

    # NOTE: no bm < 128 rows — the grouped WGRAD blocks put bm on the
    # LANE axis ((k, bm) xt / (bm, bn) dy), so Mosaic requires bm to be
    # 128-divisible on hardware (measured fail r6b); the fwd-only
    # grouped GEMM takes bm down to 8 (sublane axis).
    for name, layers, bm, grad in (
            ("full_L12", L, base["moe_group_bm"], True),
            ("fwd_L12", L, base["moe_group_bm"], False),
            ("full_L1", 1, base["moe_group_bm"], True)):
        params, run_n = build(layers, bm, grad)
        sec = slope(params, run_n)
        fl = useful_flops(layers) if grad else useful_flops(layers) / 3
        tf = fl / sec / 1e12
        rows[name] = {"ms": round(sec * 1e3, 3),
                      "tflops_useful": round(tf, 1),
                      "pct_useful_roof": round(100 * tf / roof, 1)}
        print(f"{name:9s}: {sec * 1e3:.2f} ms, {tf:.1f} TF useful "
              f"= {100 * tf / roof:.1f}% of roof", flush=True)
        if args.json:   # incremental dump: a failed later row keeps rows
            json.dump(results, open(args.json, "w"), indent=1)

    full, fwd = rows["full_L12"]["ms"], rows["fwd_L12"]["ms"]
    l1 = rows["full_L1"]["ms"]
    per_layer = (full - l1) / (L - 1)
    results["ledger_ms"] = {
        "fwd": fwd, "bwd": round(full - fwd, 3),
        "per_layer_trained": round(per_layer, 3),
        "head_loss_intercept": round(l1 - per_layer, 3)}
    print(f"ledger: fwd {fwd:.1f} ms, bwd {full - fwd:.1f} ms; "
          f"per-layer {per_layer:.2f} ms, head+loss intercept "
          f"{l1 - per_layer:.1f} ms", flush=True)

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
