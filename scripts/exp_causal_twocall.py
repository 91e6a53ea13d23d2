#!/usr/bin/env python
"""r4 experiment: causal masked-full vs the two-call split (judge r2 #4).

Rows: flat causal attention (batch = B*heads) at the PERF.md shapes.
masked = auto strategy (qblock masked-full, the r3 answer);
twocall = band_lo + band_hi + dense rectangle with LSE merge.
GFLOPS count the causal triangle only (useful work) for both, so the %
column is directly comparable to PERF.md's causal rows.
"""

import json
import sys


def main() -> int:
    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.runtime.perf import bench
    from tpp_mlir_tpu.runtime.tensor_init import tensor_init
    from tpp_mlir_tpu.utils.target import roofline_flops
    from tpp_mlir_tpu.xsmm.flags import FlashMhaKey
    from tpp_mlir_tpu.xsmm.kernels import build_kernel

    rows = []
    for (B, S, D), dtype in [((8, 2048, 128), "bf16"),
                             ((8, 2048, 64), "bf16"),
                             ((8, 1024, 64), "f32"),
                             ((8, 1024, 128), "f32")]:
        q = jnp.asarray(tensor_init("normal", (B, S, D), dtype, seed=0))
        k = jnp.asarray(tensor_init("normal", (B, S, D), dtype, seed=1))
        v = jnp.asarray(tensor_init("normal", (B, S, D), dtype, seed=2))
        tri_flops = 2 * B * S * S * D   # 4*B*S*S*D / 2: triangle only
        ref = None
        for strat in ("auto", "twocall"):
            key = FlashMhaKey(batch=B, seq=S, seq_kv=S, head_dim=D,
                              dtype=dtype, scale=D ** -0.5, causal=True,
                              strategy=strat)
            try:
                fn = build_kernel(key, interpret=False)
                out = np.asarray(fn(q, k, v), np.float32)
                if ref is None:
                    ref = out
                else:
                    err = float(np.max(np.abs(out - ref))
                                / (np.max(np.abs(ref)) + 1e-9))
                    assert err < 3e-2, f"twocall numerics off: {err}"
                r = bench(fn, (q, k, v), iters=4000, flops=tri_flops)
                roof = roofline_flops(dtype)
                row = {"strategy": strat, "shape": [B, S, D],
                       "dtype": dtype, "gflops": round(r.gflops, 1),
                       "tri_pct": round(r.gflops * 1e9 / roof * 100, 1),
                       "us": round(r.mean_seconds * 1e6, 2)}
            except Exception as e:
                row = {"strategy": strat, "shape": [B, S, D],
                       "dtype": dtype,
                       "error": f"{type(e).__name__}: {e}"}
            rows.append(row)
            print(json.dumps(row), flush=True)
    json.dump(rows, open("/tmp/causal_twocall_results.json", "w"), indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
