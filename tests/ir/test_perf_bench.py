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


LN_GEMM = """func @step(%x: tensor<64x128xf32>, %g: tensor<128xf32>, %b: tensor<128xf32>, %w: tensor<128x128xf32>, %bias: tensor<128xf32>) {
  %0 = tl.layer_norm %x, %g, %b {eps = 1e-05} : tensor<64x128xf32>
  %1 = tl.constant {init = "zero"} : tensor<64x128xf32>
  %2 = tl.matmul %0, %w, %1 : tensor<64x128xf32>
  %3 = tl.add %2, %bias : tensor<64x128xf32>
  %4 = tl.gelu %3 : tensor<64x128xf32>
  return %4 : tensor<64x128xf32>
}
"""


def test_ln_prologue_not_extracted_and_bench_keeps_ln():
    """Regression: a fused_brgemm carrying an LN prologue must NOT ride
    the ChainKey warm extraction (ChainKey cannot express the prologue —
    the warm bench would time AND return a different computation); the
    scan lowering must produce the LN-included value."""
    from tpp_mlir_tpu.passes import run_pipeline
    from tpp_mlir_tpu.runtime.executor import extract_bench_kernel
    from tpp_mlir_tpu.runtime import interpret

    m = parse_module(LN_GEMM)
    run_pipeline(m, "default-tpp-passes")
    s = print_module(m)
    assert 'prologue = "layer_norm"' in s, "precondition: LN fused"
    assert extract_bench_kernel(m, "step") is None

    # the bench wrapper (scan lowering) returns the LN-included result
    from tpp_mlir_tpu.tools.tpp_run import wrap_bench_main

    ref = parse_module(LN_GEMM)
    args = (rng(64, 128), rng(128, seed=1) * 0.1 + 1.0,
            rng(128, seed=2) * 0.1, rng(128, 128, seed=3) * 0.05,
            rng(128, seed=4))
    # perf.bench chains n applications: result feeds back as %x
    cur = args[0]
    for _ in range(3):
        out = interpret(ref, "step", cur, *args[1:])
        cur = out[0] if isinstance(out, tuple) else out
    wrapper = wrap_bench_main(m, "step", 3)
    outs = tpp_compile(m, wrapper, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(cur),
                               atol=1e-4, rtol=1e-4)


def test_perf_ops_refuse_jitted_compile():
    """Host timers inside a jitted program would bake trace-time
    constants into the HLO — compile(jit=True) of perf IR raises."""
    text = """func @main(%x: tensor<8x16xf32>) {
  %t0 = perf.timer_start : tensor<i64>
  %e = perf.timer_stop %t0 : tensor<f32>
  return %x : tensor<8x16xf32>
}
"""
    m = parse_module(text)
    fn = tpp_compile(m, "main", jit=True)
    with pytest.raises(NotImplementedError, match="jitted"):
        fn(rng(8, 16))


def test_bench_scan_path_with_check_ops():
    """Regression: the scan bench compiles its callee with checks NOT
    enforced — the check wrapper's host bool() would crash on tracers
    inside the scan body."""
    text = """func @step(%x: tensor<8x16xf32>, %w: tensor<16x16xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<8x16xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<8x16xf32>
  check.expect_sane %1
  return %1 : tensor<8x16xf32>
}
func @main(%x: tensor<8x16xf32>, %w: tensor<16x16xf32>) {
  %t, %r = perf.bench %x, %w {callee = "step", n = 4} : tensor<f32>, tensor<8x16xf32>
  return %t, %r : tensor<f32>, tensor<8x16xf32>
}
"""
    m = parse_module(text)
    t, r = tpp_compile(m, "main", jit=False)(rng(8, 16),
                                             rng(16, 16, seed=1))
    assert float(t) > 0 and np.isfinite(np.asarray(r)).all()


def test_bench_two_same_shaped_outputs_both_chain():
    """Regression: two same-shaped outputs collapsed into ONE carry slot
    (the second overwrote the first, whose producer XLA then DCE'd out
    of the scan — inflated rates). Both must feed back, so the bench
    result equals the manual two-track chain."""
    text = """func @step(%x: tensor<8x16xf32>, %y: tensor<8x16xf32>, %w: tensor<16x16xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<8x16xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<8x16xf32>
  %2 = tl.relu %1 : tensor<8x16xf32>
  %3 = tl.matmul %y, %w, %0 : tensor<8x16xf32>
  %4 = tl.tanh %3 : tensor<8x16xf32>
  return %2, %4 : tensor<8x16xf32>, tensor<8x16xf32>
}
func @main(%x: tensor<8x16xf32>, %y: tensor<8x16xf32>, %w: tensor<16x16xf32>) {
  %t, %a, %b = perf.bench %x, %y, %w {callee = "step", n = 3} : tensor<f32>, tensor<8x16xf32>, tensor<8x16xf32>
  return %t, %a, %b : tensor<f32>, tensor<8x16xf32>, tensor<8x16xf32>
}
"""
    from tpp_mlir_tpu.runtime import interpret

    m = parse_module(text)
    x, y, w = rng(8, 16), rng(8, 16, seed=1), rng(16, 16, seed=2) * 0.2
    outs = tpp_compile(m, "main", jit=False)(x, y, w)
    cx, cy = x, y
    for _ in range(3):
        cx, cy = interpret(m, "step", cx, cy, w)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(cx),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[2]), np.asarray(cy),
                               atol=1e-5, rtol=1e-5)
