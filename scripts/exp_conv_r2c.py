"""Follow-up conv measurements: honest XLA baselines (after the bench
poison fix — sum-of-all-outputs dependency) and the retuned 1x1 paths.

Usage: nohup python scripts/exp_conv_r2c.py > /tmp/exp_conv_r2c.log 2>&1 &
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from tpp_mlir_tpu.runtime.perf import bench
from tpp_mlir_tpu.xsmm.flags import ConvNhwcKey
from tpp_mlir_tpu.xsmm.kernels import build_kernel

PEAK = 197e12


def report(name, res, err=None):
    rec = {"name": name, "gflops": round(res.gflops, 1),
           "pct_roofline": round(res.gflops * 1e9 / PEAK * 100, 1),
           "mean_us": round(res.mean_seconds * 1e6, 2)}
    if err is not None:
        rec["max_err"] = float(err)
    print(json.dumps(rec), flush=True)


def rng(*shape, seed=0, dtype=jnp.float32):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
            .astype(dtype) * 0.05)


def conv_flops(N, H, W, C, K, R):
    P = Q = H - R + 1
    return 2 * N * K * P * Q * C * R * R


def xla_conv(tag, N, H, W, C, K, R, nhwc=True, dtype=jnp.float32):
    if nhwc:
        i, w = rng(N, H, W, C, dtype=dtype), rng(R, R, C, K, seed=1,
                                                 dtype=dtype)
        dn = ("NHWC", "HWIO", "NHWC")
    else:
        i, w = rng(N, C, H, W, dtype=dtype), rng(K, C, R, R, seed=1,
                                                 dtype=dtype)
        dn = ("NCHW", "OIHW", "NCHW")

    def step(i, w):
        return jax.lax.conv_general_dilated(i, w, (1, 1), "VALID",
                                            dimension_numbers=dn)

    res = bench(jax.jit(step), (i, w), flops=conv_flops(N, H, W, C, K, R))
    report(f"xla_conv_{tag}", res)


def kernel_1x1(tag, N, H, W, C, K):
    i = rng(N, H, W, C)
    w = rng(1, 1, C, K, seed=1)
    key = ConvNhwcKey(N=N, H=H, W=W, C=C, K=K, R=1, S=1, beta0=True,
                      strategy="fullrow")
    fn = build_kernel(key, False)
    want = jnp.einsum("nhwc,ck->nhwk", i, w[0, 0])
    err = jnp.max(jnp.abs(fn(i, w) - want))
    res = bench(fn, (i, w), flops=conv_flops(N, H, W, C, K, 1))
    report(f"nhwc_fullrow_1x1_{tag}", res, err=err)


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
    # honest XLA baselines (vs-XLA role: reference's OneDNN column)
    xla_conv("nhwc_c128_30", 8, 30, 30, 128, 128, 3)
    xla_conv("nhwc_c256_16", 8, 16, 16, 256, 256, 3)
    xla_conv("nhwc_1x1_c256_14", 8, 14, 14, 256, 256, 1)
    xla_conv("nchw_c128_30", 8, 30, 30, 128, 128, 3, nhwc=False)
    # retuned 1x1 via the one-tap fullrow kernel
    kernel_1x1("c256_14", 8, 14, 14, 256, 256)
    pipeline_convnet("nhwc_1x1_fullrow", dict(batch=8, channels=256,
                                              filters=256, height=14,
                                              width=14, kernel=1,
                                              layout="nhwc"))
    # sanity: MLP warm number unchanged by the poison fix (uses fed-back
    # matching shapes, not the poison path)
    from tpp_mlir_tpu.models.mlp import MlpConfig, build_mlp
    from tpp_mlir_tpu.passes import run_pipeline as rp
    from tpp_mlir_tpu.runtime import compile as tc
    m = build_mlp(MlpConfig(batch=256, layers=(1024,) * 4, bias=True,
                            relu=True))
    rp(m, "default-tpp-passes")
    x = rng(256, 1024)
    res = bench(tc(m), (x,), flops=m.attrs["flops"])
    report("pipeline_mlp_3x1024_stream", res)


if __name__ == "__main__":
    main()
