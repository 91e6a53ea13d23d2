"""Pass-option golden tests (reference pass-option lit coverage:
skip lists, vnni factor, register blocking) + strided-conv execution."""

import numpy as np

import jax.numpy as jnp

from tpp_mlir_tpu.ir import parse_module, print_module
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.passes.pass_manager import make_pass
from tpp_mlir_tpu.runtime import compile as tpp_compile
from tpp_mlir_tpu.runtime import tensor_init


def _args(module, seed=3):
    func = module["entry"]
    return tuple(
        jnp.asarray(tensor_init("rand", a.type.shape, a.type.dtype,
                                seed=seed + i))
        for i, a in enumerate(func.args))


MATMUL = """func @entry(%a: tensor<64x64xbf16>, %b: tensor<64x64xbf16>) {
  %c = tl.constant {init = "zero"} : tensor<64x64xbf16>
  %0 = tl.matmul %a, %b, %c : tensor<64x64xbf16>
  return %0 : tensor<64x64xbf16>
}
"""


def test_pack_vnni_factor_4():
    """--vnni=4 packs B as (K/4, N, 4) (reference PackVNNI vnni-factor
    option, ToBlockLayoutAndBack.cpp:642-680)."""
    m = parse_module(MATMUL)
    ref = tpp_compile(m, jit=False)
    args = _args(m)
    want = ref(*args)[0]
    m2 = parse_module(MATMUL)
    make_pass("pack-vnni", vnni=4).run(m2)
    s = print_module(m2)
    assert "tl.vnni_brgemm" in s and "vnni = 4" in s
    assert "tensor<1x16x64x4xbf16>" in s
    got = tpp_compile(m2, jit=False)(*args)[0]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_to_xsmm_skip_list():
    """convert-tl-to-xsmm honors the skip list (reference
    ConvertLinalgToXsmm.cpp:1186-1235 skip-operations)."""
    m = parse_module(MATMUL)
    make_pass("convert-tl-to-xsmm", skip=("matmul",)).run(m)
    s = print_module(m)
    assert "tl.matmul" in s and "xsmm.gemm" not in s
    m2 = parse_module(MATMUL)
    make_pass("convert-tl-to-xsmm").run(m2)
    assert "xsmm" in print_module(m2)


def test_register_blocking_module_attr():
    """--register-blocking forces tile_m/n/k on the anchor (reference
    tpp-run --registerBlocking, tpp-run.cpp:66-148)."""
    text = """func @entry(%a: tensor<256x256xf32>, %b: tensor<256x256xf32>) {
  %c = tl.constant {init = "zero"} : tensor<256x256xf32>
  %0 = tl.matmul %a, %b, %c : tensor<256x256xf32>
  %1 = tl.relu %0 : tensor<256x256xf32>
  return %1 : tensor<256x256xf32>
}
"""
    m = parse_module(text)
    m.attrs["register_blocking"] = (64, 128, 256)
    run_pipeline(m, "tile-and-fuse")
    mm = next(op for op in m["entry"].ops if op.opname == "tl.matmul")
    assert (mm.attrs["tile_m"], mm.attrs["tile_n"], mm.attrs["tile_k"]) \
        == (64, 128, 256)


def test_strided_conv_executes_vs_loops():
    """stride-2 NHWC conv runs end-to-end through the pipeline (xla
    strategy) and matches reference loop semantics."""
    text = """func @entry(%i: tensor<2x9x9x32xf32>, %w: tensor<3x3x32x32xf32>) {
  %z = tl.constant {init = "zero"} : tensor<2x4x4x32xf32>
  %0 = tl.conv2d_nhwc_hwcf %i, %w, %z {strides = [2, 2]} : tensor<2x4x4x32xf32>
  %b = tl.constant {init = "normal", seed = 9} : tensor<32xf32>
  %rb = tl.reshape %b : tensor<1x1x1x32xf32>
  %1 = tl.add %0, %rb : tensor<2x4x4x32xf32>
  %2 = tl.relu %1 : tensor<2x4x4x32xf32>
  return %2 : tensor<2x4x4x32xf32>
}
"""
    m = parse_module(text)
    ref = tpp_compile(m, jit=False)
    args = _args(m)
    want = ref(*args)[0]
    run_pipeline(m, "default-tpp-passes")
    s = print_module(m)
    assert "xsmm" in s and "conv2d" not in s
    got = tpp_compile(m, jit=False)(*args)[0]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-4, rtol=1e-4)


def test_pipelines_list_and_print_after(capsys):
    """tpp-opt --list names every registered pass/pipeline; --print-after
    stages IR per pass (reference mlir-opt print-ir-after)."""
    from tpp_mlir_tpu.tools.tpp_opt import main
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    for name in ("tpp-mapping", "linalg-lowering", "default-tpp-passes",
                 "tile-and-fuse", "pack-vnni", "convert-tl-to-xsmm"):
        assert name in out


def test_layer_norm_lowers_to_fused_kernel():
    """tl.layer_norm lowers to ONE xsmm.layer_norm invoke and matches the
    un-lowered reference execution."""
    text = """func @entry(%x: tensor<32x128xf32>, %g: tensor<128xf32>, %b: tensor<128xf32>) {
  %0 = tl.layer_norm %x, %g, %b {eps = 1e-05} : tensor<32x128xf32>
  return %0 : tensor<32x128xf32>
}
"""
    m = parse_module(text)
    ref = tpp_compile(m, jit=False)
    args = _args(m)
    want = ref(*args)
    want = want[0] if isinstance(want, tuple) else want
    m2 = parse_module(text)
    run_pipeline(m2, "default-tpp-passes")
    s = print_module(m2)
    assert "xsmm.layer_norm" in s and "tl.layer_norm" not in s
    got = tpp_compile(m2, jit=False)(*args)
    got = got[0] if isinstance(got, tuple) else got
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-5, rtol=1e-5)
