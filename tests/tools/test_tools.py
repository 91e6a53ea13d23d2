"""Tool tests: tpp-gen | tpp-opt | tpp-run | tpp-fpcmp round trips
(the reference's mlir-gen.mlir end-to-end generator tests and fpcmp usage,
SURVEY.md section 4)."""

import io
import os
import sys

import numpy as np
import pytest

from tpp_mlir_tpu.ir import parse_module
from tpp_mlir_tpu.tools.fpcmp import compare_values, extract_floats
from tpp_mlir_tpu.tools.mlir_gen import (build_parser, config_from_args,
                                         generate_text)
from tpp_mlir_tpu.tools.tpp_run import print_tensor, run_module


def gen(argv):
    return generate_text(config_from_args(build_parser().parse_args(argv)))


def test_gen_flags_and_flops():
    text = gen(["--batch=8", "--layers=16,32,64", "--bias", "--relu"])
    assert "BENCH_TOTAL_FLOPS" in text
    m = parse_module(text)
    m.verify()
    # flops: 2*8*32*16 + 8*32 + 8*32 (layer1) + 2*8*64*32 + 8*64 + 8*64
    want = 2 * 8 * 32 * 16 + 2 * 8 * 32 + 2 * 8 * 64 * 32 + 2 * 8 * 64
    assert m.attrs["flops"] == want
    s = str(m)
    assert s.count("tl.matmul") == 2
    assert s.count("tl.relu") == 2


def test_gen_const_weights_softmax():
    text = gen(["--batch=4", "--layers=8,8", "--kernel=const", "--softmax",
                "--seed=3"])
    m = parse_module(text)
    s = str(m)
    assert "tl.constant" in s and "tl.softmax" in s
    # only the input is an argument
    assert len(m["entry"].args) == 1


def test_gen_run_roundtrip(capsys):
    text = gen(["--batch=8", "--layers=16,32", "--bias", "--relu",
                "--kernel=const"])
    m = parse_module(text)
    res = run_module(m, print_result=True, init_type="simple")
    out = capsys.readouterr().out
    floats = extract_floats(out)
    assert len(floats) == 8 * 32
    got = np.asarray(res["outputs"][0], np.float32).ravel()
    ok, msg = compare_values(list(got), floats, 1e-4, 1e-4)
    assert ok, msg


def test_run_linalg_to_loops_differential():
    """The reference's xsmm-vs-loops differential test via the tools."""
    text = gen(["--batch=8", "--layers=32,64", "--bias", "--relu"])
    m1 = parse_module(text)
    r1 = run_module(m1, init_type="rand", seed=5)
    m2 = parse_module(text)
    r2 = run_module(m2, init_type="rand", seed=5, linalg_to_loops=True)
    a = np.asarray(r1["outputs"][0], np.float32)
    b = np.asarray(r2["outputs"][0], np.float32)
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_fpcmp_tool(tmp_path):
    f1 = tmp_path / "a.txt"
    f2 = tmp_path / "b.txt"
    f1.write_text("( 1.0, 2.0 )\n( 3.0, 4.0 )\n")
    f2.write_text("( 1.0, 2.0000001 )\n( 3.0, 4.0 )\n")
    from tpp_mlir_tpu.tools.fpcmp import main
    assert main([str(f1), str(f2)]) == 0
    f2.write_text("( 1.0, 9.0 )\n( 3.0, 4.0 )\n")
    assert main([str(f1), str(f2)]) == 1


def test_tpp_opt_cli(tmp_path, capsys):
    from tpp_mlir_tpu.tools.tpp_opt import main
    src = tmp_path / "m.ir"
    src.write_text(gen(["--batch=8", "--layers=16,32", "--bias", "--relu"]))
    rc = main([str(src), "--default-tpp-passes"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "xsmm.fused_brgemm" in out


def test_print_tensor_format(capsys):
    print_tensor(np.arange(6, dtype=np.float32).reshape(2, 3))
    out = capsys.readouterr().out
    assert out == "( 0, 1, 2 )\n( 3, 4, 5 )\n"


def test_run_task_grid_mesh():
    """--task-grid: data-parallel batch sharding over the CPU mesh."""
    text = gen(["--batch=64", "--layers=32,32", "--bias", "--relu"])
    m1 = parse_module(text)
    r1 = run_module(m1, seed=3, init_type="rand")
    m2 = parse_module(text)
    r2 = run_module(m2, seed=3, init_type="rand", task_grid="8")
    a = np.asarray(r1["outputs"][0], np.float32)
    b = np.asarray(r2["outputs"][0], np.float32)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_cli_pipe_end_to_end(tmp_path):
    """tpp-gen | tpp-opt --default-tpp-passes | tpp-run - --print over real
    subprocess pipes (the reference's RUN-line usage)."""
    import subprocess

    # Hermetic children: drop the axon-tunnel trigger vars so sitecustomize
    # skips TPU registration (a CLI pipe needs no accelerator; with the
    # trigger present the child's register() can block minutes in a
    # grant-retry loop against the shared relay and time the test out).
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                        "_AXON_REGISTERED")}
    env["JAX_PLATFORMS"] = "cpu"
    gen = subprocess.run(
        [sys.executable, "-m", "tpp_mlir_tpu.tools.mlir_gen",
         "--batch=8", "--layers=16,16", "--bias", "--relu", "--seed=5"],
        capture_output=True, text=True, timeout=120, env=env)
    assert gen.returncode == 0
    opt = subprocess.run(
        [sys.executable, "-m", "tpp_mlir_tpu.tools.tpp_opt", "-",
         "--default-tpp-passes"],
        input=gen.stdout, capture_output=True, text=True, timeout=120, env=env)
    assert opt.returncode == 0 and "xsmm." in opt.stdout
    run = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from tpp_mlir_tpu.tools.tpp_run import main; import sys;"
         "sys.exit(main(['-', '--print', '--pipeline', 'cleanup']))"],
        input=opt.stdout, capture_output=True, text=True, timeout=300, env=env)
    assert run.returncode == 0, run.stderr[-1500:]
    floats = extract_floats(run.stdout)
    assert len(floats) == 8 * 16


def test_print_mlir_kernel_artifact_dump(capsys):
    """--print-mlir=kernel dumps each dispatched kernel's jaxpr + StableHLO
    (role of reference -print-mlir=llvm, DefaultPipeline.cpp:33-36)."""
    text = gen(["--batch=8", "--layers=32,32", "--bias", "--relu"])
    r = run_module(parse_module(text), init_type="rand",
                   print_mlir="kernel")
    err = capsys.readouterr().err
    assert "===== kernel" in err
    assert "jaxpr" in err and "stablehlo" in err
    arts = r["kernel_artifacts"]
    assert arts and all("stablehlo" in a or "error" in a
                        for a in arts.values())
    # artifact capture must not change results
    r2 = run_module(parse_module(text), init_type="rand")
    np.testing.assert_allclose(np.asarray(r["outputs"][0], np.float32),
                               np.asarray(r2["outputs"][0], np.float32))


def test_splat_to_random_cli(tmp_path, capsys):
    """-splat-to-random turns 'const'-init weight splats into random init
    (reference MLIRBench.cpp:111-164) — results change, accumulators keep
    semantics."""
    from tpp_mlir_tpu.tools.tpp_run import main
    f = tmp_path / "m.mlir"
    f.write_text("""func @entry(%x: tensor<8x16xf32>) {
  %w = tl.constant {init = "const", value = 0.5} : tensor<16x16xf32>
  %a = tl.constant {init = "zero"} : tensor<8x16xf32>
  %0 = tl.matmul %x, %w, %a : tensor<8x16xf32>
  return %0 : tensor<8x16xf32>
}
""")
    assert main([str(f), "--print", "-seed", "7",
                 "-init-type", "rand"]) == 0
    splat_out = capsys.readouterr().out
    assert main([str(f), "--print", "-seed", "7", "-init-type", "rand",
                 "-splat-to-random"]) == 0
    rand_out = capsys.readouterr().out
    assert splat_out and rand_out and splat_out != rand_out


def test_profile_cli(tmp_path):
    """--profile writes a jax trace directory (SURVEY.md section 5
    tracing/profiling)."""
    from tpp_mlir_tpu.tools.tpp_run import main
    f = tmp_path / "m.mlir"
    f.write_text("""func @entry(%x: tensor<8x8xf32>) {
  %0 = tl.relu %x : tensor<8x8xf32>
  return %0 : tensor<8x8xf32>
}
""")
    prof = tmp_path / "trace"
    assert main([str(f), "--profile", str(prof)]) == 0
    assert prof.exists() and any(prof.rglob("*"))


def test_fpcmp_equal_infinities_match():
    """inf - inf = NaN fails both tolerance tests: byte-identical files
    containing 'inf' compared as MISMATCH before the exact-equality
    fast path (python and native cores)."""
    from tpp_mlir_tpu.tools.fpcmp import compare_values

    inf = float("inf")
    ok, _ = compare_values([inf, 1.0], [inf, 1.0], 1e-6, 1e-4)
    assert ok
    ok, _ = compare_values([inf], [-inf], 1e-6, 1e-4)
    assert not ok


def test_tune_brgemm_operands_batched_accumulator_is_2d():
    """Regression: a (B, m, n) C crashed pallas_call on every batch>1
    non-beta0 key — the batch dim is reduced, C is always (m, n)."""
    from tpp_mlir_tpu.tools.tpp_tune import _brgemm_operands
    from tpp_mlir_tpu.xsmm.flags import BrgemmKey

    key = BrgemmKey(batch=4, m=64, n=64, k=64, dtype="f32", beta0=False)
    args = _brgemm_operands(key)
    assert args[0].shape == (4, 64, 64) and args[2].shape == (64, 64)
