#!/usr/bin/env python
"""r4 experiment: wres epilogue schedule on the measured fc1 bottleneck.

fc1+LN+gelu profiled 67.2% vs 82-92% siblings (PERF.md r3 per-kernel
profile) — the erf-polynomial VPU pass serializes against the chunk dots.
Candidates (kernels._wres_sched):
  interleave — r3 baseline (dot chunk, epilogue chunk, next dot)
  split      — all chunk dots into f32 scratch, then one epilogue pass
  lag        — epilogue of m-block i-1 issued beside the dots of block i

Runs each schedule on the fc1-class shape (m=2048 k=1024 n=4096, the
b8/s256/E1024 transformer), f32-default and bf16, one coherent run;
prints a JSON result per row. Compare within THIS run only (tunnel noise
±20-40% across runs).
"""

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scheds", default="interleave,split,lag",
                   help="comma list (r5 refit re-measure: just the "
                        "policy winner, fewer remote compiles)")
    p.add_argument("--json", default="/tmp/wres_sched_results.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpp_mlir_tpu.runtime.perf import bench
    from tpp_mlir_tpu.runtime.tensor_init import tensor_init
    from tpp_mlir_tpu.utils.target import roofline_flops
    from tpp_mlir_tpu.xsmm.flags import BrgemmKey
    from tpp_mlir_tpu.xsmm.kernels import (_WRES_SCHED_OVERRIDE,
                                           _build_brgemm_wres)

    M, K, N = 2048, 1024, 4096
    flops = 2 * M * N * K
    rows = []
    for dtype in ("f32", "bf16"):
        key = BrgemmKey(batch=1, m=M, n=N, k=K, dtype=dtype, beta0=True,
                        binary_kind="add", binary_bcast="bcast_col",
                        unary_kind="gelu", prologue="layer_norm")
        a = jnp.asarray(tensor_init("normal", (1, M, K), dtype, seed=0))
        b = jnp.asarray(tensor_init("normal", (1, K, N), dtype, seed=1)) * 0.03
        d = jnp.asarray(tensor_init("normal", (N,), dtype, seed=2))
        g = jnp.asarray(tensor_init("normal", (K,), "f32", seed=3)) * 0.1 + 1.0
        be = jnp.asarray(tensor_init("normal", (K,), "f32", seed=4)) * 0.1
        for sched in args.scheds.split(","):
            _WRES_SCHED_OVERRIDE[0] = sched
            try:
                fn = _build_brgemm_wres(key, False)
                if fn is None:
                    rows.append({"sched": sched, "dtype": dtype,
                                 "error": "refused"})
                    continue
                step = (lambda fn: lambda a_, b_, d_, g_, be_:
                        fn(a_, b_, None, d_, g_, be_))(fn)
                r = bench(step, (a, b, d, g, be), iters=4000, flops=flops)
                roof = roofline_flops(dtype)
                row = {"sched": sched, "dtype": dtype,
                       "gflops": round(r.gflops, 1),
                       "pct": round(r.gflops * 1e9 / roof * 100, 1),
                       "us": round(r.mean_seconds * 1e6, 2)}
            except Exception as e:
                row = {"sched": sched, "dtype": dtype,
                       "error": f"{type(e).__name__}: {e}"}
            finally:
                _WRES_SCHED_OVERRIDE[0] = None
            rows.append(row)
            print(json.dumps(row), flush=True)
    json.dump(rows, open(args.json, "w"), indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
