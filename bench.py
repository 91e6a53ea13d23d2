#!/usr/bin/env python
"""Flagship benchmark: 3-layer fused MLP (batch=256, 1024-wide, bias+ReLU),
the reference's canonical workload (benchmarks/config/base/base.json:5-100,
batch=256, layers=1024x4) run through the full pipeline on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": GFLOP/s, "unit": "GFLOP/s", "vs_baseline": f}
where vs_baseline is the fraction of the chip's MXU roofline for the compute
dtype (the BASELINE.md target is >= 0.9).

Timing: device-side lax.scan chain with two loop lengths; per-iteration time
is the slope, so fixed host/tunnel dispatch overhead cancels (see
tpp_mlir_tpu/runtime/perf.py).
"""

import json
import sys

DTYPE = "bf16"          # native MXU dtype; the fp32 config also exists in
                        # benchmarks/configs and runs via the harness
LAYERS = (1024, 1024, 1024, 1024)
BATCH = 256


def main() -> int:
    import jax

    from tpp_mlir_tpu.models.mlp import MlpConfig, build_mlp
    from tpp_mlir_tpu.passes import run_pipeline
    from tpp_mlir_tpu.runtime import bench, tensor_init
    from tpp_mlir_tpu.runtime import compile as tpp_compile
    from tpp_mlir_tpu.utils.target import current_target, roofline_flops

    cfg = MlpConfig(batch=BATCH, layers=LAYERS, float_type=DTYPE, bias=True,
                    relu=True, kernel="const", init_type="normal")
    module = build_mlp(cfg)
    flops = module.attrs["flops"]
    run_pipeline(module, "default-tpp-passes")
    fn = tpp_compile(module)

    import jax.numpy as jnp
    x = jnp.asarray(tensor_init("normal", (BATCH, LAYERS[0]), DTYPE, seed=0))

    res = bench(fn, (x,), iters=400, warmup=3, flops=flops)
    target = current_target()
    roof = roofline_flops(DTYPE, target)
    value = res.gflops or 0.0
    print(json.dumps({
        "metric": f"fused_mlp_{len(LAYERS)-1}x{LAYERS[1]}_{DTYPE}_gflops",
        "value": round(value, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(value * 1e9 / roof, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
