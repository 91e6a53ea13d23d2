#!/usr/bin/env python
"""Flagship benchmark: 3-layer fused MLP (batch=256, 1024-wide, bias+ReLU),
the reference's canonical workload (benchmarks/config/base/base.json:
batch=256, layers=1024x4), compiled by the default pipeline into ONE
whole-chain Pallas kernel and timed with the in-kernel perf.bench region
(ChainKey.repeats): N sequential applications with warm VMEM weights, the
same discipline as the reference's timed loop over a hot libxsmm kernel.
Per-iteration time is the slope between two repeat counts, which cancels
dispatch/tunnel overhead exactly.

Prints ONE JSON line:
  {"metric": ..., "value": GFLOP/s, "unit": "GFLOP/s", "vs_baseline": f}
vs_baseline = fraction of the chip's bf16 MXU roofline (BASELINE.md target
is >= 0.9 of roofline).
"""

import json
import sys

DTYPE = "bf16"
LAYERS = (1024, 1024, 1024, 1024)
BATCH = 256


def _device_available(timeout_s: float = 600.0) -> bool:
    """Backend init in a daemon thread with a bound: a dead axon tunnel
    makes jax.devices() hang forever, which would wedge the driver's
    round-end bench run — fail fast with a diagnostic line instead."""
    import threading

    ok = []

    def probe():
        import jax

        ok.append(len(jax.devices()) > 0)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok and ok[0])


def main() -> int:
    if not _device_available():
        print(json.dumps({
            "metric": f"fused_mlp_{len(LAYERS)-1}x{LAYERS[1]}_{DTYPE}"
                      "_gflops",
            "value": 0.0, "unit": "GFLOP/s", "vs_baseline": 0.0,
            "error": "device backend unavailable (tunnel down?) after "
                     "600s probe",
        }))
        return 1

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.models.mlp import MlpConfig, build_mlp
    from tpp_mlir_tpu.passes import run_pipeline
    from tpp_mlir_tpu.runtime import tensor_init
    from tpp_mlir_tpu.runtime.executor import _dispatch_key
    from tpp_mlir_tpu.utils.target import current_target, roofline_flops
    from tpp_mlir_tpu.xsmm import build_kernel, reference_kernel

    # 1. generate + compile through the pipeline; it must produce one
    #    whole-chain fused kernel (sanity of the compiler path)
    cfg = MlpConfig(batch=BATCH, layers=LAYERS, float_type=DTYPE, bias=True,
                    relu=True, kernel="args")
    module = build_mlp(cfg)
    run_pipeline(module, "default-tpp-passes")
    func = module["entry"]
    chains = [op for op in func.ops if op.opname == "xsmm.fused_chain"]
    assert len(chains) == 1, f"pipeline produced {len(chains)} chains"
    key = _dispatch_key(chains[0].operands[0].owner, chains[0])

    # 2. operands
    x = jnp.asarray(tensor_init("normal", (BATCH, LAYERS[0]), DTYPE, seed=0))
    wb = []
    for i in range(len(LAYERS) - 1):
        wb.append(jnp.asarray(tensor_init(
            "normal", (LAYERS[i], LAYERS[i + 1]), DTYPE, seed=2 * i + 1))
            * 0.05)
        wb.append(jnp.asarray(tensor_init(
            "normal", (LAYERS[i + 1],), DTYPE, seed=2 * i + 2)))

    # 3. numerics: single application vs jnp reference (fpcmp discipline)
    single = build_kernel(key)
    got = np.asarray(single(x, *wb), np.float32)
    want = np.asarray(reference_kernel(key)(x, *wb), np.float32)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 2e-2, f"numerics off: relerr {err}"

    # 4. timed region in-kernel; slope over two repeat counts, escalated
    #    until the signal clears host/tunnel jitter. MEDIAN of 3 full
    #    slope measurements: the shared tunnel shows ±20-40% single-run
    #    noise (r01->r02 0.987->0.971 was pure noise); the median of three
    #    independent slopes holds back-to-back runs within a few %.
    import statistics

    from tpp_mlir_tpu.runtime.perf import bench_warm

    per_iter = statistics.median(
        bench_warm(key, (x, *wb)) for _ in range(3))

    # matmul flops only — bias/relu (~0.1% of the chain's work) are
    # excluded, so the reported rate is marginally conservative
    flops = sum(2 * BATCH * LAYERS[i] * LAYERS[i + 1]
                for i in range(len(LAYERS) - 1))
    value = flops / per_iter / 1e9
    roof = roofline_flops(DTYPE, current_target())
    print(json.dumps({
        "metric": f"fused_mlp_{len(LAYERS)-1}x{LAYERS[1]}_{DTYPE}_gflops",
        "value": round(value, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(value * 1e9 / roof, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
