#!/usr/bin/env python
"""r5 experiment: int8 MXU compute rate vs bf16 (r4 verdict #5).

v5e runs int8 x int8 -> s32 MXU passes at ~2x the bf16 rate. This run
measures, in ONE process, the Int8GemmKey kernel against the bf16
BrgemmKey at GPT-2-small prefill GEMM shapes (M = B*S tokens), plus the
activation-quantization drift vs the dequant (weight-only) reference.

Bar (verdict): int8 >= 1.5x the bf16 rate at a serving shape.
"""

import json
import sys


def main() -> int:
    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.runtime.perf import bench
    from tpp_mlir_tpu.serving.quant import quantize, quantize_tokens
    from tpp_mlir_tpu.utils.target import roofline_flops
    from tpp_mlir_tpu.xsmm.flags import BrgemmKey, Int8GemmKey
    from tpp_mlir_tpu.xsmm.kernels import build_kernel

    rows = []
    rng = np.random.default_rng(0)
    bf_roof = roofline_flops("bf16")
    for (M, K, N) in [(4096, 768, 3072),     # GPT-2 fc1, b8 s512
                      (4096, 3072, 768),     # fc2
                      (4096, 768, 768)]:     # qkv/proj
        flops = 2 * M * N * K
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
        qt = quantize(w)
        xq, xs = quantize_tokens(x)

        ikey = Int8GemmKey(m=M, n=N, k=K, out_dtype="bf16")
        ifn = build_kernel(ikey, interpret=False)
        ir = bench(ifn, (xq, qt.q, xs, qt.scale), iters=4000, flops=flops)

        bkey = BrgemmKey(batch=1, m=M, n=N, k=K, dtype="bf16", beta0=True)
        # fc2 shape: the wres heuristic's bm=512 estimate is ~0.4MB over
        # the real scoped-vmem limit on v5e (measured OOM 16.43M/16M);
        # bm=256 keeps weights resident and fits with headroom
        if (K, N) == (3072, 768):
            from tpp_mlir_tpu.xsmm import tune
            with tune.trial(bkey, {"wres_bm": 256}):
                bfn = build_kernel(bkey, interpret=False)
        else:
            bfn = build_kernel(bkey, interpret=False)
        xb = x.astype(jnp.bfloat16)[None]
        wb = (qt.q.astype(jnp.float32) * qt.scale).astype(jnp.bfloat16)[None]
        br = bench(bfn, (xb, wb), iters=4000, flops=flops)

        got = np.asarray(ifn(xq, qt.q, xs, qt.scale), np.float32)
        ref = np.asarray(x) @ (np.asarray(qt.q, np.float32)
                               * np.asarray(qt.scale))
        drift = float(np.abs(got - ref).max() / np.abs(ref).max())

        row = {"shape": [M, K, N],
               "int8_tflops": round(ir.gflops / 1e3, 1),
               "bf16_tflops": round(br.gflops / 1e3, 1),
               "int8_vs_bf16": round(ir.gflops / br.gflops, 2),
               "int8_pct_bf16_roof": round(
                   ir.gflops * 1e9 / bf_roof * 100, 1),
               "drift_vs_dequant": drift}
        rows.append(row)
        print(json.dumps(row), flush=True)
    json.dump(rows, open("benchmarks/results/int8_gemm_r5.json", "w"),
              indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
