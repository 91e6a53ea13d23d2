#!/usr/bin/env python
"""r5 experiment: producer/consumer LN-stats pair on the fc1 bottleneck.

fc1+LN+gelu measured 73.9 f32 / 75.7 bf16 (wres_sched_r4) against the
75 bar; the kernel's remaining VPU critical path includes the LN stats
reduction over the (m, k) A block. The untried lever (r4 verdict #6a):
fold the stats into the PRODUCER's epilogue — the producer GEMM already
has every output row hot in registers, so emitting per-row (mean, var)
costs one fused add-reduce, and fc1's prologue drops to a single
scale+shift pass (`prologue="ln_stats"`).

Measures, in ONE run (tunnel noise is cross-run):
  1. fc1 alone, prologue=layer_norm  (the r4 baseline row)
  2. fc1 alone, prologue=ln_stats    (stats passed in; consumer-side
     ceiling for the lever)
  3. producer(m2048 k1024 n1024 +bias) plain + fc1 layer_norm  (pair
     baseline — the honest end-to-end form)
  4. producer with ln_stats_out      + fc1 ln_stats
Roofline %% is vs the calibrated bf16-class roof (as every wres row).

Usage: python scripts/exp_lnstats.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", default="benchmarks/results/lnstats_r5.json")
    p.add_argument("--platform", default="")
    p.add_argument("--interpret", action="store_true",
                   help="CPU smoke test: interpret-mode kernels, tiny "
                        "iters")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from tpp_mlir_tpu.runtime.perf import bench
    from tpp_mlir_tpu.runtime.tensor_init import tensor_init
    from tpp_mlir_tpu.utils.target import roofline_flops
    from tpp_mlir_tpu.xsmm.flags import BrgemmKey
    from tpp_mlir_tpu.xsmm.kernels import _build_brgemm_wres

    M, K, N = (1024, 256, 512) if args.interpret else (2048, 1024, 4096)
    rows = []
    out = {"shape": {"m": M, "k": K, "n": N}, "rows": rows}
    for dtype in ("f32", "bf16"):
        roof = roofline_flops(dtype) / 1e12
        a = jnp.asarray(tensor_init("normal", (1, M, K), dtype, seed=0))
        b = jnp.asarray(tensor_init("normal", (1, K, N), dtype,
                                    seed=1)) * 0.03
        d = jnp.asarray(tensor_init("normal", (N,), dtype, seed=2))
        g = jnp.asarray(tensor_init("normal", (K,), "f32",
                                    seed=3)) * 0.1 + 1.0
        be = jnp.asarray(tensor_init("normal", (K,), "f32", seed=4)) * 0.1
        # producer: the attn-proj-class (E -> E) GEMM that writes fc1's A
        ap = jnp.asarray(tensor_init("normal", (1, M, K), dtype, seed=5))
        bp = jnp.asarray(tensor_init("normal", (1, K, K), dtype,
                                     seed=6)) * 0.03
        dp = jnp.asarray(tensor_init("normal", (K,), dtype, seed=7))

        k_ln = BrgemmKey(batch=1, m=M, n=N, k=K, dtype=dtype, beta0=True,
                         binary_kind="add", binary_bcast="bcast_col",
                         unary_kind="gelu", prologue="layer_norm")
        k_lns = BrgemmKey(batch=1, m=M, n=N, k=K, dtype=dtype, beta0=True,
                          binary_kind="add", binary_bcast="bcast_col",
                          unary_kind="gelu", prologue="ln_stats")
        k_pp = BrgemmKey(batch=1, m=M, n=K, k=K, dtype=dtype, beta0=True,
                         binary_kind="add", binary_bcast="bcast_col")
        k_ps = BrgemmKey(batch=1, m=M, n=K, k=K, dtype=dtype, beta0=True,
                         binary_kind="add", binary_bcast="bcast_col",
                         ln_stats_out=True)
        f_ln = _build_brgemm_wres(k_ln, args.interpret)
        f_lns = _build_brgemm_wres(k_lns, args.interpret)
        f_pp = _build_brgemm_wres(k_pp, args.interpret)
        f_ps = _build_brgemm_wres(k_ps, args.interpret)
        assert all(f is not None for f in (f_ln, f_lns, f_pp, f_ps))

        fl1 = 2 * M * N * K
        flp = 2 * M * K * K

        # precomputed stats for the consumer-only row (trace-time cost
        # outside the timed fn: passed as arguments)
        af = a.reshape(M, K).astype(jnp.float32)
        mu0 = jnp.mean(af, axis=1, keepdims=True)
        var0 = jnp.var(af, axis=1, keepdims=True)

        def fc1_ln(a_, b_, d_, g_, be_):
            return f_ln(a_, b_, None, d_, gamma=g_, beta=be_)

        def fc1_lns(a_, b_, d_, g_, be_, mu_, var_):
            return f_lns(a_, b_, None, d_, gamma=g_, beta=be_,
                         mu=mu_, var=var_)

        def pair_base(ap_, bp_, dp_, b_, d_, g_, be_):
            y = f_pp(ap_, bp_, None, dp_)
            return f_ln(y.reshape(1, M, K), b_, None, d_,
                        gamma=g_, beta=be_)

        def pair_stats(ap_, bp_, dp_, b_, d_, g_, be_):
            y, mu_, var_ = f_ps(ap_, bp_, None, dp_)
            return f_lns(y.reshape(1, M, K), b_, None, d_,
                         gamma=g_, beta=be_, mu=mu_, var=var_)

        for name, fn, fargs, fl in (
                ("fc1_layer_norm", fc1_ln, (a, b, d, g, be), fl1),
                ("fc1_ln_stats", fc1_lns, (a, b, d, g, be, mu0, var0),
                 fl1),
                ("pair_base", pair_base, (ap, bp, dp, b, d, g, be),
                 fl1 + flp),
                ("pair_stats", pair_stats, (ap, bp, dp, b, d, g, be),
                 fl1 + flp)):
            r = bench(jax.jit(fn), fargs,
                      iters=4 if args.interpret else 4000, flops=fl)
            row = {"name": name, "dtype": dtype,
                   "us": round(r.mean_seconds * 1e6, 2),
                   "tflops": round(r.gflops / 1e3, 1),
                   "pct": round(100 * r.gflops / 1e3 / roof, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.json:
        json.dump(out, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
