#!/usr/bin/env python
"""End-to-end: generate an MLP, inspect the pipeline, execute, benchmark.

Equivalent reference session:
    mlir-gen --batch=256 --layers=1024,1024 --bias --relu | \
        tpp-opt --default-tpp-passes | tpp-run -n 100
"""

import jax.numpy as jnp

from tpp_mlir_tpu.ir import parse_module
from tpp_mlir_tpu.models.mlp import MlpConfig, build_mlp
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.runtime import bench, compile, tensor_init

cfg = MlpConfig(batch=256, layers=(1024, 1024, 1024, 1024),
                float_type="bf16", bias=True, relu=True, kernel="const")
module = build_mlp(cfg)
print("=== generated IR ===")
print(module)

run_pipeline(module, "default-tpp-passes")
print("=== lowered IR (one fused whole-chain kernel) ===")
print(module)

fn = compile(module)
x = jnp.asarray(tensor_init("normal", (256, 1024), "bf16"))
print("output:", fn(x).shape)

res = bench(fn, (x,), iters=100, flops=module.attrs["flops"])
print(f"{res.gflops:.0f} GFLOP/s")
