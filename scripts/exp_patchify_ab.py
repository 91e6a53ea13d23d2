#!/usr/bin/env python
"""A/B the patchify-conv-to-matmul rewrite INSIDE ONE process/run.

The first measurement of the rewrite (vit_r5b.json vs vit_r5.json)
showed BOTH ViT rows slower across runs even though the XLA baselines
reproduced to 0.3% — a cross-run comparison under the shared tunnel is
not trustworthy (CLAUDE.md: compare variants within ONE driver run).
This script lowers each ViT config twice — patchify pass disabled (A)
and enabled (B) — and slope-benches both alternately in the same
process, so the verdict is same-run.

VERDICT (patchify_ab_r5.json, v5e): the rewrite LOSES on both rows
(p16 129 vs 97 us, p8 254 vs 227, off/off2 and on/on2 within 0.1%) —
the pass is gated off by default (pipelines.py), kept as an opt-in.

Usage: python scripts/exp_patchify_ab.py \
          [--json benchmarks/results/patchify_ab_r5.json]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json",
                   default="benchmarks/results/patchify_ab_r5.json")
    p.add_argument("--platform", default="")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from tpp_mlir_tpu.models.vit import build_vit_block
    from tpp_mlir_tpu.passes import run_pipeline
    from tpp_mlir_tpu.passes.pass_manager import PassManager
    from tpp_mlir_tpu.runtime import compile as tpp_compile
    from tpp_mlir_tpu.runtime.perf import bench
    from tpp_mlir_tpu.tools.tpp_run import init_args
    from tpp_mlir_tpu.utils.flops import count_flops
    from tpp_mlir_tpu.utils.target import roofline_flops

    if args.tiny:
        configs = {"tiny": dict(batch=2, image=32, patch=8, embed=64,
                                heads=2, layers=1, dtype="f32")}
        iters = 16
    else:
        configs = {
            "vit_d128_p16_bf16": dict(batch=8, image=128, patch=16,
                                      embed=512, heads=4, layers=2,
                                      dtype="bf16"),
            "vit_d128_p8_bf16": dict(batch=8, image=128, patch=8,
                                     embed=512, heads=4, layers=2,
                                     dtype="bf16"),
        }
        iters = 4000

    results = {"rows": []}
    for name, kw in configs.items():
        fns = {}
        for variant in ("off", "on"):
            module, _ = build_vit_block(**kw)
            flops = count_flops(module)
            PassManager().add("default-tpp-passes",
                              patchify=(variant == "on")).run(module)
            fns[variant] = (tpp_compile(module, jit=True),
                            tuple(init_args(module, "entry", "normal", 0)),
                            flops)

        roof = roofline_flops(kw["dtype"])
        row = {"name": name}
        # alternate the variants so drift hits both equally
        for variant in ("off", "on", "off2", "on2"):
            v = variant.rstrip("2")
            fn, ar, flops = fns[v]
            for attempt in range(3):
                try:
                    r = bench(fn, ar, iters=iters, flops=flops)
                    break
                except Exception as e:
                    if attempt == 2:
                        raise
                    print(f"retry {name}/{variant}: {type(e).__name__}",
                          flush=True)
                    time.sleep(15)
            row[variant] = {"mean_us": round(r.mean_seconds * 1e6, 2),
                            "gflops": round(r.gflops, 1),
                            "pct_roof": round(r.gflops * 1e9 / roof
                                              * 100, 1)}
            print(f"{name} patchify={variant}: "
                  f"{r.mean_seconds*1e6:.2f} us, "
                  f"{row[variant]['pct_roof']}% roof", flush=True)
        results["rows"].append(row)

    json.dump(results, open(args.json, "w"), indent=1)
    print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
