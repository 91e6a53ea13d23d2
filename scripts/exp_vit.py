#!/usr/bin/env python
"""ViT family analysis on v5e (r4 verdict #2): baseline column +
per-kernel decomposition + the known levers.

For each config this script measures, IN ONE RUN:
  - the lowered program (scan slope) AND the straight-XLA baseline of
    the same module -> vs_xla column (the r4 rows shipped with NaN);
  - every dispatched kernel in isolation (cache.capture_calls records
    the shapes; each key re-benches with random operands) -> the
    per-kernel ranking that tells WHERE the 24-36% went;
  - the residual: program_time - sum(kernel_time x count) = the
    XLA-glue share (reshapes/transposes/pos-add between kernels).

Levers measured as extra configs: patch 8 (seq 64 -> 256: token count
crosses the 128-lane threshold the flash/token kernels gate on) and
batch 32 (amortize per-program overhead at seq 64).

Usage: python scripts/exp_vit.py [--json benchmarks/results/vit_r5.json]
"""

from __future__ import annotations

import argparse
import json
import time


def key_flops(key, n_calls: int) -> int:
    from tpp_mlir_tpu.xsmm.flags import (BatchMatmulKey, BrgemmKey,
                                         ChainKey, ConvNhwcKey,
                                         FlashMhaKey, LayerNormKey)
    if isinstance(key, BrgemmKey):
        f = 2 * key.batch * key.m * key.n * key.k
    elif isinstance(key, BatchMatmulKey):
        f = 2 * key.batch * key.m * key.n * key.k
    elif isinstance(key, FlashMhaKey):
        b = key.batch * (key.heads or 1)
        f = 4 * b * key.seq * key.seq_kv * key.head_dim
        if key.causal:
            f //= 2
    elif isinstance(key, ConvNhwcKey):
        f = (2 * key.N * key.P * key.Q * key.K
             * key.C * key.R * key.S)
    elif isinstance(key, ChainKey):
        f = 0
        for i in range(len(key.dims) - 1):
            f += 2 * key.m * key.dims[i] * key.dims[i + 1]
    elif isinstance(key, LayerNormKey):
        f = 8 * key.m * key.n
    else:
        f = 0
    return f * n_calls


def rand_args(specs, rng):
    import jax.numpy as jnp
    out = []
    for s in specs:
        if s is None:
            out.append(None)
        elif jnp.issubdtype(s.dtype, jnp.integer):
            out.append(jnp.zeros(s.shape, s.dtype))
        else:
            out.append(jnp.asarray(
                rng.standard_normal(s.shape) * 0.05, s.dtype))
    return out


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", default="benchmarks/results/vit_r5.json")
    p.add_argument("--platform", default="")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--configs", default="")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.models.vit import build_vit_block
    from tpp_mlir_tpu.passes import run_pipeline
    from tpp_mlir_tpu.runtime import compile as tpp_compile
    from tpp_mlir_tpu.runtime.perf import bench
    from tpp_mlir_tpu.tools.tpp_run import init_args
    from tpp_mlir_tpu.utils.flops import count_flops
    from tpp_mlir_tpu.utils.target import roofline_flops
    from tpp_mlir_tpu.xsmm import global_cache

    if args.tiny:
        configs = {"tiny": dict(batch=2, image=32, patch=8, embed=64,
                                heads=2, layers=1, dtype="f32")}
        iters = 16
    else:
        configs = {
            # the r4 rows, re-run WITH baseline
            "vit_d128_p16_bf16": dict(batch=8, image=128, patch=16,
                                      embed=512, heads=4, layers=2,
                                      dtype="bf16"),
            "vit_d64_p16_bf16": dict(batch=8, image=128, patch=16,
                                     embed=384, heads=6, layers=2,
                                     dtype="bf16"),
            # levers
            "vit_d128_p8_bf16": dict(batch=8, image=128, patch=8,
                                     embed=512, heads=4, layers=2,
                                     dtype="bf16"),
            "vit_d128_p16_b32_bf16": dict(batch=32, image=128, patch=16,
                                          embed=512, heads=4, layers=2,
                                          dtype="bf16"),
        }
        iters = 4000
    if args.configs:
        keep = args.configs.split(",")
        configs = {k: v for k, v in configs.items() if k in keep}

    results = {"rows": [], "kernels": {}}
    for name, kw in configs.items():
        module, _ = build_vit_block(**kw)
        flops = count_flops(module)
        ar = tuple(init_args(module, "entry", "normal", 0))
        roof = roofline_flops(kw["dtype"])

        base_fn = tpp_compile(module, jit=True)
        for attempt in range(3):
            try:
                base = bench(base_fn, ar, iters=iters, flops=flops)
                break
            except Exception as e:
                if attempt == 2:
                    raise
                print(f"retry baseline {name}: {type(e).__name__}",
                      flush=True)
                time.sleep(15)

        run_pipeline(module, "default-tpp-passes")
        cache = global_cache()
        cache.calls = {}
        cache.capture_calls = True
        fn = tpp_compile(module, jit=True)
        # ONE traced call while capturing: counts = call sites per program
        # (bench's scan re-traces would inflate them)
        for attempt in range(3):
            try:
                float(jnp.sum(fn(*ar).astype(jnp.float32)))
                break
            except Exception as e:
                if attempt == 2:
                    raise
                print(f"retry lowered {name}: {type(e).__name__}",
                      flush=True)
                time.sleep(15)
        cache.capture_calls = False
        # deep snapshot: replay benches below re-invoke the wrapped fns,
        # which mutate the live cache.calls entries
        calls = {k: dict(v) for k, v in cache.calls.items()}
        cache.calls = {}
        res = bench(fn, ar, iters=iters, flops=flops)

        row = {"name": name, "mean_seconds": res.mean_seconds,
               "baseline_mean_seconds": base.mean_seconds,
               "vs_xla": round(base.mean_seconds / res.mean_seconds, 2),
               "gflops": round(res.gflops, 1),
               "roofline_pct": round(res.gflops * 1e9 / roof * 100, 1)}
        print(f"{name}: {res.gflops/1e3:.1f} TF = "
              f"{row['roofline_pct']}% roof, {row['vs_xla']}x vs XLA",
              flush=True)

        # per-kernel decomposition (replay each dispatched kernel)
        rng = np.random.default_rng(0)
        kern_rows = []
        covered = 0.0
        for (key, interp), rec in calls.items():
            kfn = cache.dispatch(key, interp)
            kargs = rand_args(rec["specs"], rng)
            if rec["kwargs"]:
                continue   # LN-prologue kwargs kernels: skip replay
            fl = key_flops(key, 1)
            try:
                kr = bench(kfn, kargs, iters=max(iters, 2000), flops=fl)
            except Exception as e:
                kern_rows.append({"key": repr(key),
                                  "error": f"{type(e).__name__}: {e}"})
                continue
            share = kr.mean_seconds * rec["count"]
            covered += share
            kern_rows.append({
                "key": repr(key), "count": rec["count"],
                "us": round(kr.mean_seconds * 1e6, 2),
                "pct_roof": round((kr.gflops or 0) * 1e9 / roof * 100, 1),
                "share_us": round(share * 1e6, 2)})
            print(f"  {repr(key)[:90]}: x{rec['count']} "
                  f"{kr.mean_seconds*1e6:.1f}us "
                  f"{(kr.gflops or 0)*1e9/roof*100:.1f}%", flush=True)
        kern_rows.sort(key=lambda r: -r.get("share_us", 0))
        row["kernel_share_us"] = round(covered * 1e6, 2)
        row["glue_share_us"] = round(
            (res.mean_seconds - covered) * 1e6, 2)
        print(f"  kernels {covered*1e6:.0f}us / program "
              f"{res.mean_seconds*1e6:.0f}us -> glue "
              f"{row['glue_share_us']}us", flush=True)
        results["rows"].append(row)
        results["kernels"][name] = kern_rows

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
