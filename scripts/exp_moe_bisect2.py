#!/usr/bin/env python
"""r6 bisect #2: where the grouped-MoE training backward goes.

bisect #1 (moe_bisect_r6.json): fwd+loss 16.8 ms (46.4% of roof), full
step 98.3 ms — the backward is ~5x the forward against an ideal 2x, at
~7.5 ms per trained layer. Candidate sinks, each priced here:

  dense_train   the SAME geometry with a dense FFN (n_experts=0): the
                non-MoE (attention/qkv/head) trained cost — the MoE
                backward overhead is the per-layer difference
  dus_accum     microbench of the stacked wgrad cotangent pattern:
                acc = acc + zeros.at[li].set(g) per scan step on the
                (L, n_e, E, F) bf16 table — folded in place by XLA's
                add-of-DUS rewrite, or a 3x-table-bytes materialization?
  dus_direct    the ideal: acc.at[li].add(g) per step (pure in-place)
  noupdate      the stacked train step with the SGD tree_map removed
                (grad-only): prices the parameter update pass

Usage: python scripts/exp_moe_bisect2.py [--json out.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json",
                   default="benchmarks/results/moe_bisect2_r6.json")
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
                    dtype="f32")
        moe = dict(n_experts=4, top_k=2, moe_group_bm=8,
                   moe_prefill_form="grouped", moe_group_stacked=True)
        B, s0, pair, L = 2, 16, (2, 6), 2
    else:
        base = dict(vocab=50304, embed=768, heads=12, mlp_ratio=4,
                    max_seq=512, dtype="bf16")
        moe = dict(n_experts=8, top_k=2, moe_group_bm=128,
                   moe_prefill_form="grouped", moe_group_stacked=True)
        B, s0, pair, L = 8, 512, (2, 6), 12
    T = B * s0
    roof = roofline_flops(base["dtype"]) / 1e12
    tgt = current_target()
    E, F = base["embed"], base["mlp_ratio"] * base["embed"]
    n_e = moe["n_experts"]

    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, base["vocab"], (B, s0)), jnp.int32)

    def slope(run_n, *a):
        for attempt in range(3):
            try:
                float(jnp.sum(run_n(*a, pair[0])))
                float(jnp.sum(run_n(*a, pair[1])))
                break
            except Exception as e:
                if attempt == 2:
                    raise
                print(f"retry: {type(e).__name__}", flush=True)
                time.sleep(15)
        out = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(run_n(*a, pair[0])))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(run_n(*a, pair[1])))
            tl = time.perf_counter() - t0
            out.append((tl - ts) / (pair[1] - pair[0]))
        out.sort()
        return out[len(out) // 2]

    rows = {}
    results = {"target": tgt.name, "B": B, "s0": s0, "rows": rows}

    def emit(name, sec, note=""):
        rows[name] = {"ms": round(sec * 1e3, 3)}
        if note:
            rows[name]["note"] = note
        print(f"{name:12s}: {sec * 1e3:.3f} ms {note}", flush=True)
        if args.json:
            json.dump(results, open(args.json, "w"), indent=1)

    def train_step(cfg, update=True):
        params = stack_params(init_params(cfg, seed=0))
        prefill = make_prefill(cfg, use_pallas=None)

        def loss(params, ids):
            logits, _ = prefill(params, ids)
            lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            return -jnp.mean(jnp.take_along_axis(
                lp, ids[:, 1:][..., None], -1))

        grad_fn = jax.grad(loss)

        @functools.partial(jax.jit, static_argnums=2)
        def run_n(params, ids, n):
            def body(params, _):
                g = grad_fn(params, ids)
                if update:
                    params = jax.tree_util.tree_map(
                        lambda p, gi: (p - 1e-4 * gi.astype(jnp.float32))
                        .astype(p.dtype) if jnp.issubdtype(
                            p.dtype, jnp.floating) else p,
                        params, g)
                    out = jnp.sum(params["lnf_g"].astype(jnp.float32))
                else:
                    out = sum(jnp.sum(l.astype(jnp.float32)) for l in
                              (g["lnf_g"], g["blocks"]["w1"][0, 0, 0]))
                return params, out
            _, sums = jax.lax.scan(body, params, None, length=n)
            return sums
        return params, run_n

    # 1. dense baseline (same geometry, dense FFN)
    dcfg = GptConfig(layers=L, **base)
    params, run_n = train_step(dcfg)
    emit("dense_train", slope(run_n, params, ids),
         "(dense FFN = half the MoE top-2 FFN flops)")

    # 2/3. the wgrad-cotangent accumulation pattern, isolated
    dt = jnp.bfloat16 if base["dtype"] == "bf16" else jnp.float32
    table = jnp.zeros((L, n_e, E, F), dt)
    g = jnp.ones((n_e, E, F), dt)

    @functools.partial(jax.jit, static_argnums=2)
    def dus_accum(table, g, n):
        def body(acc, li):
            contrib = jnp.zeros_like(acc).at[li % L].set(
                g * (1.0 + li).astype(dt))
            return acc + contrib, jnp.float32(0)
        acc, _ = jax.lax.scan(body, table, jnp.arange(n, dtype=jnp.int32))
        return jnp.sum(acc[0, 0, 0, :8].astype(jnp.float32))

    @functools.partial(jax.jit, static_argnums=2)
    def dus_direct(table, g, n):
        def body(acc, li):
            return acc.at[li % L].add(g * (1.0 + li).astype(dt)), \
                jnp.float32(0)
        acc, _ = jax.lax.scan(body, table, jnp.arange(n, dtype=jnp.int32))
        return jnp.sum(acc[0, 0, 0, :8].astype(jnp.float32))

    tbytes = table.size * table.dtype.itemsize
    sec = slope(dus_accum, table, g)
    emit("dus_accum", sec,
         f"per step; table {tbytes / 1e6:.0f} MB -> "
         f"{3 * tbytes / sec / 1e9:.0f} GB/s if materialized")
    sec = slope(dus_direct, table, g)
    emit("dus_direct", sec, "per step (in-place ideal)")

    # 4. grad-only (no SGD update)
    mcfg = GptConfig(layers=L, **base, **moe)
    params, run_n = train_step(mcfg, update=False)
    emit("noupdate", slope(run_n, params, ids))
    params, run_n = train_step(mcfg, update=True)
    emit("full", slope(run_n, params, ids), "(reference point)")

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
