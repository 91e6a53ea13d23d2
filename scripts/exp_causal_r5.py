#!/usr/bin/env python
"""r5 experiment: the causal policy crossover (r4 verdict #6b).

r4 left a hard S >= 2048 gate on the 3-call twocall split with nothing
measured between s1024 (twocall loses) and s2048 (twocall wins). This
run measures, in ONE process at D=128 bf16 b8:

  qblock   — masked-full, whole-KV-resident (the r3 baseline policy)
  twocall  — 3 calls + LSE merge (band_lo, band_hi, dense)
  twocall2 — 2 calls, NO merge: band folded into the rectangle
             (hi rows = one causal pass over the FULL KV)

at S in {1024, 1536, 2048}. GFLOPS count the causal triangle only.
The auto-policy gate in kernels._build_flash_mha updates to whatever
this measures.
"""

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--seqs", default="1024,1536,2048")
    p.add_argument("--json", default="benchmarks/results/causal_r5.json")
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.runtime.perf import bench
    from tpp_mlir_tpu.runtime.tensor_init import tensor_init
    from tpp_mlir_tpu.utils.target import roofline_flops
    from tpp_mlir_tpu.xsmm.flags import FlashMhaKey
    from tpp_mlir_tpu.xsmm.kernels import build_kernel

    rows = []
    B, D, dtype = 8, args.d, "bf16"
    for S in (int(x) for x in args.seqs.split(",")):
        q = jnp.asarray(tensor_init("normal", (B, S, D), dtype, seed=0))
        k = jnp.asarray(tensor_init("normal", (B, S, D), dtype, seed=1))
        v = jnp.asarray(tensor_init("normal", (B, S, D), dtype, seed=2))
        tri_flops = 2 * B * S * S * D
        ref = None
        for strat in ("qblock", "twocall", "twocall2"):
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
                    assert err < 3e-2, f"{strat} numerics off: {err}"
                r = bench(fn, (q, k, v), iters=2000, flops=tri_flops)
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
    json.dump(rows, open(args.json, "w"), indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
