#!/usr/bin/env python
"""MoE training-step forms on v5e: exact scan-over-experts vs the
custom-VJP dropless grouped form (r5c; engine._grouped_ffn_trainable).

Full GPT-MoE train step (prefill CE loss -> jax.grad -> SGD), stacked
params under the layer scan, params threaded through the timing scan's
carry (a real cross-iteration dependency). Useful-flops roof counts
top_k x dense FFN in fwd and 3x that for fwd+dgrad+wgrad (attention /
router / embed flops included at the same 3x; update flops excluded —
bench_train.py convention).

Forms (each optionally suffixed "+remat" for jax.checkpoint on the
layer scan): "scan" (exact oracle), "grouped" (r5a per-layer custom
VJP, weights in the scan xs — pays the measured ~127 us/layer slab
copy each direction), "stacked" (r6: moe_group_stacked=True — expert
tables held out of the scan xs, layer index in every grouped kernel's
BlockSpec, forward AND backward; r5 verdict #1a), "sorted".

r6 default geometry is the production B8 s512 (T=4096, ~12.5%% pad at
bm=128 instead of the r5c tiny-T 50%%); the scan form at that scale
REQUIRES +remat (23 GB of saved per-expert activations otherwise).

Usage: python scripts/exp_moe_train.py \
    --forms scan+remat,grouped+remat,stacked+remat,stacked [--json out]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", default="",
                   help="output path (default folds --bm into the name "
                        "so bm sweeps don't overwrite each other)")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--platform", default="")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--forms",
                   default="scan+remat,grouped+remat,stacked+remat,stacked",
                   help="comma list of forms, each optionally +remat")
    p.add_argument("--b4", action="store_true",
                   help="r5c geometry (B4 s256) instead of B8 s512")
    p.add_argument("--bm", type=int, default=0,
                   help="override moe_group_bm (training geometry pads "
                        "A=T*k up to (ceil(A/bm)+n_e)*bm; smaller bm "
                        "cuts the pad share at small T)")
    args = p.parse_args()

    args.forms = [f.strip() for f in args.forms.split(",") if f.strip()]
    bad = {f.split("+")[0] for f in args.forms} - {"scan", "sorted",
                                                   "grouped", "stacked"}
    bad |= {m for f in args.forms for m in f.split("+")[1:]} \
        - {"remat", "flash"}
    if bad:
        p.error(f"unknown forms/modifiers {sorted(bad)}: pick from "
                "scan,sorted,grouped,stacked (+remat/+flash suffixes); "
                "unrecognized names would silently measure the scan form")
    if args.bm and (args.bm <= 0 or args.bm % 8):
        p.error(f"--bm {args.bm}: Mosaic needs the row block 8-divisible "
                "(fail fast locally, not after a remote compile)")
    if not args.json:
        suffix = f"_bm{args.bm}" if args.bm else ""
        args.json = f"benchmarks/results/moe_train_r5c{suffix}.json"

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import (GptConfig, init_params, make_prefill,
                                      stack_params)
    from tpp_mlir_tpu.utils.target import current_target, roofline_flops

    if args.tiny:
        cfg0 = GptConfig(vocab=128, embed=64, heads=4, layers=2,
                         mlp_ratio=2, max_seq=64, dtype="f32",
                         n_experts=4, top_k=2, moe_group_bm=8)
        B, s0, pair = 2, 16, (2, 6)
    else:
        cfg0 = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                         mlp_ratio=4, max_seq=512, dtype="bf16",
                         n_experts=8, top_k=2, moe_group_bm=128)
        # r6 default: the production B8 s512 geometry (~12.5% pad at
        # bm=128). The scan form at this scale needs +remat (23 GB of
        # saved per-expert activations otherwise, the r5c OOM).
        B, s0, pair = 8, 512, (2, 6)
        if args.b4:
            cfg0 = dataclasses.replace(cfg0, max_seq=640)
            B, s0, pair = 4, 256, (2, 8)
    if args.bm:
        cfg0 = dataclasses.replace(cfg0, moe_group_bm=args.bm)

    E, F = cfg0.embed, cfg0.mlp_ratio * cfg0.embed
    k, L = cfg0.top_k, cfg0.layers
    T = B * s0
    roof = roofline_flops(cfg0.dtype) / 1e12
    blk_fl = (4 * 2 * T * E * E + k * (2 * 2 * T * E * F)
              + 2 * 2 * B * cfg0.heads * s0 * s0 * (E // cfg0.heads))
    fl = 3 * (L * blk_fl + 2 * T * E * cfg0.vocab)    # fwd+dgrad+wgrad
    results = {"target": current_target().name,
               "geometry": {"B": B, "s0": s0, "embed": E, "ffn": F,
                            "experts": cfg0.n_experts, "top_k": k,
                            "layers": L, "dtype": cfg0.dtype}}
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg0.vocab, (B, s0)), jnp.int32)

    results["bm"] = cfg0.moe_group_bm
    for form in args.forms:
        parts = form.split("+")
        base, mods = parts[0], set(parts[1:])
        cfg = dataclasses.replace(
            cfg0,
            moe_prefill_form="grouped" if base == "stacked" else base,
            moe_group_stacked=base == "stacked",
            remat="remat" in mods,
            flash_attn="flash" in mods)
        params = stack_params(init_params(cfg, seed=0))
        prefill = make_prefill(cfg, use_pallas=None)

        def loss(params, ids):
            logits, _ = prefill(params, ids)
            lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            tgt = ids[:, 1:]
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

        grad_fn = jax.grad(loss)

        @functools.partial(jax.jit, static_argnums=2)
        def train_n(params, ids, n, grad_fn=grad_fn):
            def body(params, _):
                g = grad_fn(params, ids)
                params = jax.tree_util.tree_map(
                    lambda p, gi: (p - 1e-4 * gi.astype(jnp.float32))
                    .astype(p.dtype) if jnp.issubdtype(
                        p.dtype, jnp.floating) else p,
                    params, g)
                return params, jnp.sum(
                    params["lnf_g"].astype(jnp.float32))
            params, sums = jax.lax.scan(body, params, None, length=n)
            return sums

        for n in pair:
            for attempt in range(3):
                try:
                    float(jnp.sum(train_n(params, ids, n)))
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
            float(jnp.sum(train_n(params, ids, pair[0])))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(train_n(params, ids, pair[1])))
            tl = time.perf_counter() - t0
            slopes.append((tl - ts) / (pair[1] - pair[0]))
        slopes.sort()
        sec = slopes[len(slopes) // 2]
        tf = fl / sec / 1e12
        results[form] = {
            "ms_per_step": round(sec * 1e3, 3),
            "tflops_useful": round(tf, 1),
            "pct_useful_roof": round(100 * tf / roof, 1),
            "tokens_per_s": round(T / sec, 1)}
        print(f"train form={form}: {sec*1e3:.2f} ms/step, {tf:.1f} TF "
              f"useful = {100*tf/roof:.1f}% of roof, {T/sec:,.0f} tok/s",
              flush=True)

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
