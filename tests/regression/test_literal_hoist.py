"""Large literal constants must become runtime arguments of the jitted
program, not baked HLO literals.

Torch-imported weights are Module.literals entries; before the hoist,
GPT-2-class programs serialized hundreds of MB of weight literals into
the HLO and blew the axon tunnel's remote-compile request size limit
(measured: HTTP 413 on the 12-layer s1024 row, broken pipe on s256).
These tests pin (a) the hoist itself (no big consts in the traced
program), (b) numerics vs the eager path, and (c) the bench scan chains
threading the hoisted values through their outer jit instead of
re-capturing them as closure constants."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpp_mlir_tpu.runtime import compile as tpp_compile  # noqa: E402
from tpp_mlir_tpu.runtime.executor import HOIST_MIN_BYTES  # noqa: E402


def _linear_module(n=128):
    """Linear(n, n): one weight literal of exactly n*n*4 bytes (>= the
    64 KB hoist threshold at n=128) plus a small (un-hoisted) bias."""
    import torch.nn as nn

    from tpp_mlir_tpu.frontend import import_torch_fx

    torch.manual_seed(0)
    model = nn.Sequential(nn.Linear(n, n)).eval()
    return model, import_torch_fx(model, (4, n))


def test_big_literal_hoisted_and_numerics_match():
    model, m = _linear_module()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 128)),
                    jnp.float32)

    fn = tpp_compile(m)
    assert getattr(fn, "hoisted_literals", ()), \
        "128*128*4B weight >= HOIST_MIN_BYTES must be hoisted"
    assert all(int(np.prod(v.shape)) * v.dtype.itemsize >= HOIST_MIN_BYTES
               for v in fn.hoisted_literals)

    # the traced program must not contain the weight as a constant
    jaxpr = jax.make_jaxpr(fn.raw_fn)(x, *fn.hoisted_literals)
    const_bytes = [np.asarray(c).nbytes for c in jaxpr.consts
                   if hasattr(c, "nbytes") or isinstance(c, np.ndarray)]
    assert all(b < HOIST_MIN_BYTES for b in const_bytes), const_bytes

    want = tpp_compile(m, jit=False)(x)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    with torch.no_grad():
        tref = model(torch.from_numpy(np.asarray(x))).numpy()
    np.testing.assert_allclose(np.asarray(fn(x)), tref,
                               atol=1e-4, rtol=1e-4)


def test_perf_bench_scan_chain_threads_literals():
    """runtime.perf.bench (the driver's scan mode) must thread hoisted
    literals through its outer jit as arguments."""
    from tpp_mlir_tpu.runtime.perf import bench

    _, m = _linear_module()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 128)),
                    jnp.float32)
    fn = tpp_compile(m)
    assert fn.hoisted_literals
    res = bench(fn, (x,), iters=4, min_delta=0.0)
    assert res.mean_seconds > 0 and np.isfinite(res.mean_seconds)
    assert res.finals is not None


def test_ir_perf_bench_chain_threads_literals():
    """The in-IR perf.bench scan-chain lowering (tpp-bench path) with a
    hoisted-literal callee."""
    from tpp_mlir_tpu.tools.tpp_run import wrap_bench_main

    _, m = _linear_module()
    name = wrap_bench_main(m, "entry", 3)
    assert name is not None
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 128)),
                    jnp.float32)
    # interpret_kernels=False exercises the jitted scan chain (the module
    # is tl-only, so no Pallas kernels are involved on CPU)
    out = tpp_compile(m, name, jit=False, interpret_kernels=False)(x)
    mean, result = out
    assert float(mean) >= 0
    # 3 chained applications of the linear layer
    want = x
    eager = tpp_compile(m, jit=False)
    for _ in range(3):
        want = eager(want)
    np.testing.assert_allclose(np.asarray(result), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
