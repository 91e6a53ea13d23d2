"""perf.bench region op (reference PerfOps.td:99-188): round-trip,
verifier diagnostics, execution semantics (n chained applications), and
tpp-run -n wrapping through the op."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.ir import parse_module, print_module
from tpp_mlir_tpu.runtime import compile as tpp_compile


BENCH = """func @step(%x: tensor<8x16xf32>, %w: tensor<16x16xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<8x16xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<8x16xf32>
  %2 = tl.relu %1 : tensor<8x16xf32>
  return %2 : tensor<8x16xf32>
}
func @main(%x: tensor<8x16xf32>, %w: tensor<16x16xf32>) {
  %t, %r = perf.bench %x, %w {callee = "step", n = 5} : tensor<f32>, tensor<8x16xf32>
  return %t, %r : tensor<f32>, tensor<8x16xf32>
}
"""


def rng(*shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def test_perf_bench_roundtrip():
    m = parse_module(BENCH)
    m.verify()
    s = print_module(m)
    m2 = parse_module(s)
    m2.verify()
    assert print_module(m2) == s
    assert 'callee = "step"' in s and "n = 5" in s


def test_perf_bench_verifier_rejects():
    bad = [
        BENCH.replace('n = 5', 'n = 0'),                    # n < 1
        BENCH.replace('callee = "step", ', ''),             # missing callee
        BENCH.replace('"step"', '"nope"') if False else
        BENCH.replace('callee = "step"', 'callee = "main"'),  # self, bad sig
    ]
    for text in bad:
        with pytest.raises(ValueError):
            parse_module(text).verify()
    # callee whose result cannot chain into its leading arg
    nochain = """func @step(%x: tensor<8x16xf32>) {
  %0 = tl.reshape %x : tensor<16x8xf32>
  return %0 : tensor<16x8xf32>
}
func @main(%x: tensor<8x16xf32>) {
  %t, %r = perf.bench %x {callee = "step", n = 3} : tensor<f32>, tensor<8x16xf32>
  return %t, %r : tensor<f32>, tensor<8x16xf32>
}
"""
    with pytest.raises(ValueError):
        parse_module(nochain).verify()


def test_perf_bench_executes_n_chained_iterations():
    m = parse_module(BENCH)
    x, w = rng(8, 16), rng(16, 16, seed=1) * 0.3
    t, r = tpp_compile(m, "main", jit=False)(x, w)
    want = np.asarray(x)
    for _ in range(5):
        want = np.maximum(want @ np.asarray(w), 0.0)
    np.testing.assert_allclose(np.asarray(r), want, atol=1e-4, rtol=1e-4)
    assert float(t) > 0.0


def test_tpp_run_n_wraps_via_perf_bench():
    """tpp-run -n synthesizes the perf.bench main (MLIRBench
    createTimerLoop role) and times through the op."""
    from tpp_mlir_tpu.tools.tpp_run import run_module

    text = """module attributes {flops = 16640} {
func @entry(%x: tensor<8x32xf32>) {
  %w = tl.constant {init = "normal", seed = 1} : tensor<32x32xf32>
  %0 = tl.constant {init = "zero"} : tensor<8x32xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<8x32xf32>
  %2 = tl.relu %1 : tensor<8x32xf32>
  return %2 : tensor<8x32xf32>
}
}
"""
    m = parse_module(text)
    out = io.StringIO()
    res = run_module(m, "entry", n=4, out_stream=out)
    assert res["mean_seconds"] > 0
    assert "gflops" in out.getvalue()
    # the wrapper with the bench op is IN the module
    s = print_module(res["module"])
    assert "perf.bench" in s and 'callee = "entry"' in s


def test_tpp_run_n_falls_back_when_unchainable():
    from tpp_mlir_tpu.tools.tpp_run import run_module

    text = """func @entry(%x: tensor<8x32xf32>) {
  %w = tl.constant {init = "normal", seed = 1} : tensor<32x16xf32>
  %0 = tl.constant {init = "zero"} : tensor<8x16xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<8x16xf32>
  return %1 : tensor<8x16xf32>
}
"""
    m = parse_module(text)
    out = io.StringIO()
    res = run_module(m, "entry", n=4, out_stream=out)
    assert res["mean_seconds"] > 0           # harness fallback still times
    assert "perf.bench" not in print_module(res["module"])
