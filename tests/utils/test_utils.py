"""utils tests: target descriptor, flop counting, logger."""

import io

from tpp_mlir_tpu.ir import parse_module
from tpp_mlir_tpu.utils.flops import count_flops
from tpp_mlir_tpu.utils.logger import Logger
from tpp_mlir_tpu.utils.target import TargetInfo, current_target


def test_target_descriptor():
    t = current_target()
    assert t.min_tile("f32") == (8, 128)
    assert t.min_tile("bf16") == (16, 128)
    assert t.vnni_factor("bf16") == 2
    assert t.vnni_factor("f32") == 1


def test_count_flops_matmul_chain():
    text = """func @entry(%x: tensor<16x32xf32>, %w: tensor<32x64xf32>, %b: tensor<64xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<16x64xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<16x64xf32>
  %2 = tl.add %1, %b : tensor<16x64xf32>
  %3 = tl.relu %2 : tensor<16x64xf32>
  return %3 : tensor<16x64xf32>
}
"""
    m = parse_module(text)
    assert count_flops(m) == 2 * 16 * 64 * 32 + 16 * 64 + 16 * 64


def test_count_flops_attention():
    text = """func @entry(%q: tensor<2x64x32xf32>, %k: tensor<2x64x32xf32>, %v: tensor<2x64x32xf32>) {
  %0 = tl.attention %q, %k, %v {scale = 1.0} : tensor<2x64x32xf32>
  return %0 : tensor<2x64x32xf32>
}
"""
    m = parse_module(text)
    assert count_flops(m) == 4 * 2 * 64 * 64 * 32 + 4 * 2 * 64 * 64


def test_logger_levels():
    """The documented contract (bench_driver -v help): -v info,
    -vv debug, -vvv trace; default prints errors only."""
    buf = io.StringIO()
    log = Logger(verbosity=1, stream=buf)
    log.info("hello")
    log.debug("world")
    log.trace("hidden")
    out = buf.getvalue()
    assert "hello" in out and "world" not in out and "hidden" not in out

    quiet = io.StringIO()
    Logger(verbosity=0, stream=quiet).info("nope")
    assert quiet.getvalue() == ""
    loud = io.StringIO()
    Logger(verbosity=2, stream=loud).debug("yes")
    assert "yes" in loud.getvalue()


def test_count_bytes_compulsory_traffic():
    from tpp_mlir_tpu.utils.flops import count_bytes

    text = """func @entry(%x: tensor<16x32xf32>) {
  %w = tl.constant {init = "normal", seed = 1} : tensor<32x64xf32>
  %z = tl.constant {init = "zero"} : tensor<16x64xf32>
  %1 = tl.matmul %x, %w, %z : tensor<16x64xf32>
  return %1 : tensor<16x64xf32>
}
"""
    m = parse_module(text)
    # arg read + result write + weight const read; the zero accumulator
    # (beta_0) never touches HBM
    assert count_bytes(m) == 4 * (16 * 32 + 16 * 64 + 32 * 64)
    # warm regime: constants live in VMEM across timed iterations
    assert count_bytes(m, warm=True) == 4 * (16 * 32 + 16 * 64)


def test_binding_roof_picks_the_lower_roof():
    from tpp_mlir_tpu.utils.target import binding_roof

    t = TargetInfo(name="tpu-test", generation=5, hbm_gbps=800.0,
                   peak_flops={"bf16": 200e12, "f32": 200e12})
    # high intensity (1000 flops/byte): compute-bound
    roof, bound = binding_roof("bf16", flops=1_000_000, bytes_moved=1000,
                               target=t)
    assert bound == "compute" and roof == 200e12
    # low intensity (1 flop/byte): bandwidth-bound, roof = bw * intensity
    roof, bound = binding_roof("bf16", flops=1000, bytes_moved=1000,
                               target=t)
    assert bound == "bandwidth" and abs(roof - 800e9) < 1e6
    # degenerate rows fall back to the compute roof
    roof, bound = binding_roof("bf16", flops=0, bytes_moved=0, target=t)
    assert bound == "compute"
    # on-chip regime (warm repeats / VMEM-resident scan chain): the HBM
    # roof is not a valid bound — compute roof even at low intensity
    roof, bound = binding_roof("bf16", flops=1000, bytes_moved=1000,
                               target=t, on_chip=True)
    assert bound == "compute" and roof == 200e12


def test_calibration_file_overrides_nominal(tmp_path, monkeypatch):
    import json
    import os

    from tpp_mlir_tpu.utils import target as tgt

    cal = {"targets": [{"device_kind": "TPU v5 lite",
                        "peak_flops": {"bf16": 222e12, "f32": 222e12}}]}
    path = os.path.join(os.path.dirname(tgt.__file__), "calibration.json")
    existed = os.path.exists(path)
    backup = open(path).read() if existed else None
    try:
        json.dump(cal, open(path, "w"))
        got = tgt._load_calibration("tpu v5 lite")
        assert got["bf16"] == 222e12
        assert tgt._load_calibration("tpu v4") == {}
    finally:
        if existed:
            open(path, "w").write(backup)
        else:
            os.remove(path)
