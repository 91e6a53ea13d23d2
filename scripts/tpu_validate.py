#!/usr/bin/env python
"""Hardware validation: compile every kernel family via Mosaic on the real
TPU and compare against the jnp reference oracles (fpcmp-style tolerances).
The CPU test suite runs the same comparisons in interpret mode; this script
is the capability gate for the compiled path (the reference's lit
feature-gated integration suites, SURVEY.md section 4.6).

Usage: python scripts/tpu_validate.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.xsmm import build_kernel, reference_kernel
from tpp_mlir_tpu.xsmm.flags import (BatchMatmulKey, BlockedMatmulKey,
                                     BrgemmKey, ChainKey, ConvBrgemmKey,
                                     FlashMhaKey)


def rng(*shape, dtype=jnp.float32, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape,
                             jnp.float32).astype(dtype)


def check(name, key, args, tol):
    try:
        kfn = build_kernel(key, interpret=False)
        rfn = reference_kernel(key)
        got = np.asarray(kfn(*args), np.float32)
        want = np.asarray(rfn(*args), np.float32)
    except Exception as e:   # a failed row must not kill later rows
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return False
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    status = "OK " if err <= tol else "FAIL"
    print(f"{status} {name}: relerr {err:.2e} (tol {tol})", flush=True)
    return err <= tol


def main() -> int:
    ok = True
    # default-precision f32 compares against default-precision jnp on TPU:
    # both downcast the same way, so tolerances stay tight
    ok &= check("fused_brgemm f32 bias+relu",
                BrgemmKey(batch=2, m=256, n=512, k=384, beta0=True,
                          binary_kind="add", unary_kind="relu"),
                (rng(2, 256, 384), rng(2, 384, 512, seed=1), None,
                 rng(512, seed=2)), 1e-5)
    ok &= check("brgemm bf16 multiblock",
                BrgemmKey(batch=2, m=512, n=1024, k=768, dtype="bf16",
                          out_dtype="f32", beta0=True),
                (rng(2, 512, 768, dtype=jnp.bfloat16),
                 rng(2, 768, 1024, seed=1, dtype=jnp.bfloat16)), 3e-2)
    b = rng(4, 2, 128, 256, seed=1, dtype=jnp.bfloat16) \
        .reshape(4, 2, 64, 2, 256).transpose(0, 1, 2, 4, 3)
    ok &= check("blocked matmul bf16 vnni fused",
                BlockedMatmulKey(Mb=2, Nb=4, Kb=2, mb=256, nb=256, kb=128,
                                 dtype="bf16", out_dtype="f32", beta0=True,
                                 vnni=2, binary_kind="add",
                                 unary_kind="relu"),
                (rng(2, 2, 256, 128, dtype=jnp.bfloat16), b, None,
                 rng(4, 256, seed=3, dtype=jnp.bfloat16)), 3e-2)
    ok &= check("batch gemm softmax_lhs",
                BatchMatmulKey(batch=8, m=128, n=128, k=128, beta0=True,
                               softmax_lhs=True),
                (rng(8, 128, 128), rng(8, 128, 128, seed=1)), 1e-4)
    ok &= check("conv3x3 brgemm fused",
                ConvBrgemmKey(N=2, H=16, W=16, Cb=2, c=128, Kb=1, k=128,
                              R=3, S=3, beta0=True, binary_kind="add",
                              unary_kind="relu"),
                (rng(2, 2, 16, 16, 128), rng(1, 2, 3, 3, 128, 128, seed=1)
                 * 0.05, None, rng(1, 128, seed=2)), 1e-4)
    # online-softmax over bf16-truncated scores accumulates ~1e-3 relative
    # drift vs the single-pass softmax oracle at default precision
    ok &= check("flash attention causal",
                FlashMhaKey(batch=4, seq=512, seq_kv=512, head_dim=64,
                            scale=0.125, causal=True),
                (rng(4, 512, 64), rng(4, 512, 64, seed=1),
                 rng(4, 512, 64, seed=2)), 1e-2)
    wb = []
    for i in range(3):
        wb.append(rng(1024, 1024, seed=i + 1) * 0.04)
        wb.append(rng(1024, seed=i + 40))
    # three layers of bf16-pass truncation compound to ~1e-3 relative
    ok &= check("fused chain 3x1024 (streamed)",
                ChainKey(m=256, dims=(1024,) * 4, has_bias=True,
                         unary_kind="relu", last_unary="relu"),
                (rng(256, 1024), *wb), 5e-3)
    ok &= check("fused chain warm repeats=4",
                ChainKey(m=256, dims=(1024,) * 4, has_bias=True,
                         unary_kind="relu", last_unary="relu", repeats=4),
                (rng(256, 1024) * 0.1, *wb), 1e-2)
    # f16 family (r5 verdict #6): IEEE-half storage, f32 accumulate —
    # the Mosaic f16 capability gate for the tpp-gen --float-type=f16
    # surface (interpret differentials live in tests/xsmm)
    ok &= check("brgemm f16 fused bias+relu",
                BrgemmKey(batch=2, m=256, n=512, k=384, dtype="f16",
                          out_dtype="f32", beta0=True, binary_kind="add",
                          unary_kind="relu"),
                (rng(2, 256, 384, dtype=jnp.float16),
                 rng(2, 384, 512, seed=1, dtype=jnp.float16), None,
                 rng(512, seed=2, dtype=jnp.float16)), 3e-2)
    ok &= check("fused chain f16 2x512",
                ChainKey(m=128, dims=(512,) * 3, dtype="f16",
                         has_bias=True, unary_kind="relu",
                         last_unary=None),
                (rng(128, 512, dtype=jnp.float16),
                 rng(512, 512, seed=21, dtype=jnp.float16),
                 rng(512, seed=22, dtype=jnp.float16),
                 rng(512, 512, seed=23, dtype=jnp.float16),
                 rng(512, seed=24, dtype=jnp.float16)), 3e-2)
    print("ALL OK" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
