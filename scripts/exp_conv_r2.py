"""Round-2 conv experiments on the real TPU (run ONE at a time, nohup).

Validates the NHWC-native conv kernel / 1x1 rewrites on hardware and sweeps
the tuning space (G images per program, channel blocks), against the XLA
conv baseline and the round-1 NCHW-blocked path. Emits one JSON line per
result to stdout.

Usage: nohup python scripts/exp_conv_r2.py > /tmp/exp_conv_r2.log 2>&1 &
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpp_mlir_tpu.runtime.perf import bench
from tpp_mlir_tpu.xsmm.flags import BatchMatmulKey, BrgemmKey, ConvNhwcKey
from tpp_mlir_tpu.xsmm.kernels import build_kernel

PEAK = 197e12  # v5e bf16-class default-precision roofline


def report(name, res, err=None, extra=None):
    rec = {"name": name, "gflops": round(res.gflops, 1),
           "pct_roofline": round(res.gflops * 1e9 / PEAK * 100, 1),
           "mean_us": round(res.mean_seconds * 1e6, 2)}
    if err is not None:
        rec["max_err"] = float(err)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def rng(*shape, seed=0, dtype=jnp.float32):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
            .astype(dtype) * 0.05)


SHAPES = [  # (tag, N, H, W, C, K, R)
    ("c128_30", 8, 30, 30, 128, 128, 3),
    ("c256_16", 8, 16, 16, 256, 256, 3),
    ("c256_14_1x1", 8, 14, 14, 256, 256, 1),
]


def conv_flops(N, H, W, C, K, R):
    P = Q = H - R + 1
    return 2 * N * K * P * Q * C * R * R


def xla_conv_nhwc(tag, N, H, W, C, K, R, dtype=jnp.float32):
    i = rng(N, H, W, C, dtype=dtype)
    w = rng(R, R, C, K, seed=1, dtype=dtype)

    def step(i, w):
        return jax.lax.conv_general_dilated(
            i, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    res = bench(jax.jit(step), (i, w), flops=conv_flops(N, H, W, C, K, R))
    report(f"xla_conv_nhwc_{tag}", res)
    return step(i, w)  # ground truth for kernel validation


def xla_conv_nchw(tag, N, H, W, C, K, R):
    i = rng(N, C, H, W)
    w = rng(K, C, R, R, seed=1)

    def step(i, w):
        return jax.lax.conv_general_dilated(
            i, w, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))

    res = bench(jax.jit(step), (i, w), flops=conv_flops(N, H, W, C, K, R))
    report(f"xla_conv_nchw_{tag}", res)


def nhwc_kernel(tag, N, H, W, C, K, R, G, want, cblk=0, kblk=0,
                dtype="f32", strategy="window"):
    jdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    i = rng(N, H, W, C, dtype=jdt)
    w = rng(R, R, C, K, seed=1, dtype=jdt)
    key = ConvNhwcKey(N=N, H=H, W=W, C=C, K=K, R=R, S=R, dtype=dtype,
                      beta0=True, G=G, cblk=cblk, kblk=kblk,
                      strategy=strategy)
    name = f"nhwc_{strategy}_{tag}_G{G}_c{cblk}_k{kblk}_{dtype}"
    try:
        fn = build_kernel(key, False)
        out = fn(i, w)
        err = jnp.max(jnp.abs(out.astype(jnp.float32)
                              - want.astype(jnp.float32)))
        res = bench(fn, (i, w), flops=conv_flops(N, H, W, C, K, R))
        report(name, res, err=err)
    except Exception as e:
        print(json.dumps({"name": name, "error": str(e)[:300]}), flush=True)


def conv1x1_flat_matmul(tag, N, H, W, C, K):
    i = rng(N * H * W, C)
    w = rng(C, K, seed=1)
    key = BrgemmKey(batch=1, m=N * H * W, n=K, k=C, beta0=True,
                    binary_kind="add", binary_bcast="bcast_col",
                    unary_kind="relu")
    bias = rng(K, seed=2)
    fn = build_kernel(key, False)
    res = bench(lambda a, b, d: fn(a[None], b[None], None, d), (i, w, bias),
                flops=2 * N * H * W * C * K)
    report(f"conv1x1_flat_matmul_{tag}", res)


def conv1x1_lhs_shared(tag, N, H, W, C, K):
    wk = rng(K, C, seed=1)
    x = rng(N, C, H * W)
    key = BatchMatmulKey(batch=N, m=K, n=H * W, k=C, beta0=True,
                         lhs_shared=True)
    fn = build_kernel(key, False)
    # validate vs einsum
    want = jnp.einsum("mk,bkn->bmn", wk, x)
    got = fn(wk, x)
    err = jnp.max(jnp.abs(got - want))
    res = bench(fn, (wk, x), flops=2 * N * K * H * W * C)
    report(f"conv1x1_lhs_shared_{tag}", res, err=err)


def pipeline_convnet(name, cfg_kw, dtype="f32"):
    from tpp_mlir_tpu.models.convnet import ConvConfig, build_convnet
    from tpp_mlir_tpu.passes import run_pipeline
    from tpp_mlir_tpu.runtime import compile as tpp_compile

    cfg = ConvConfig(float_type=dtype, **cfg_kw)
    m = build_convnet(cfg)
    flops = m.attrs["flops"]
    run_pipeline(m, "default-tpp-passes")
    fn = tpp_compile(m)
    jdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    nhwc = cfg.layout == "nhwc"
    shape = ((cfg.batch, cfg.height, cfg.width, cfg.channels) if nhwc
             else (cfg.batch, cfg.channels, cfg.height, cfg.width))
    x = rng(*shape, dtype=jdt)
    res = bench(fn, (x,), flops=flops)
    report(f"pipeline_{name}", res)


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    t0 = time.time()

    truths = {}
    for tag, N, H, W, C, K, R in SHAPES:
        truths[tag] = xla_conv_nhwc(tag, N, H, W, C, K, R)
    xla_conv_nchw("c128_30", 8, 30, 30, 128, 128, 3)

    # window vs fullrow strategies
    for tag, N, H, W, C, K, R in SHAPES[:2]:
        nhwc_kernel(tag, N, H, W, C, K, R, 1, truths[tag],
                    strategy="window")
        for G in (1, 2, 4):
            nhwc_kernel(tag, N, H, W, C, K, R, G, truths[tag],
                        strategy="fullrow")
    # channel-block variants on the 256ch case (fullrow)
    nhwc_kernel("c256_16", 8, 16, 16, 256, 256, 3, 2, truths["c256_16"],
                cblk=256, strategy="fullrow")
    nhwc_kernel("c256_16", 8, 16, 16, 256, 256, 3, 2, truths["c256_16"],
                kblk=256, strategy="fullrow")
    # bf16
    nhwc_kernel("c128_30", 8, 30, 30, 128, 128, 3, 1, truths["c128_30"],
                dtype="bf16", strategy="fullrow")

    # 1x1 paths
    conv1x1_flat_matmul("c256_14", 8, 14, 14, 256, 256)
    conv1x1_lhs_shared("c256_14", 8, 14, 14, 256, 256)

    # full pipeline (epilogues + real lowering)
    pipeline_convnet("nhwc_c128", dict(batch=8, channels=128, filters=128,
                                       height=30, width=30, kernel=3,
                                       layout="nhwc"))
    pipeline_convnet("nhwc_c256", dict(batch=8, channels=256, filters=256,
                                       height=16, width=16, kernel=3,
                                       layout="nhwc"))
    pipeline_convnet("nhwc_1x1", dict(batch=8, channels=256, filters=256,
                                      height=14, width=14, kernel=1,
                                      layout="nhwc"))
    pipeline_convnet("nchw_1x1", dict(batch=8, channels=256, filters=256,
                                      height=14, width=14, kernel=1))
    pipeline_convnet("nhwc_2layer", dict(batch=8, channels=128, filters=128,
                                         height=30, width=30, kernel=3,
                                         layers=2, layout="nhwc"))

    print(json.dumps({"total_minutes": round((time.time() - t0) / 60, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
