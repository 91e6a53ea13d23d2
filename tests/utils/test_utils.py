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
    buf = io.StringIO()
    log = Logger(verbosity=1, stream=buf)
    log.info("hello")
    log.debug("world")
    log.trace("hidden")
    out = buf.getvalue()
    assert "hello" in out and "world" in out and "hidden" not in out
