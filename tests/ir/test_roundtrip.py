"""IR construction, verification, and print/parse roundtrip tests
(equivalent of reference test/Dialect/* round-trip + invalid-op tests)."""

import pytest

from tpp_mlir_tpu.ir import (Function, Module, TensorType, TppBuilder,
                             parse_module, print_module)


def build_mlp_layer():
    f32 = "f32"
    m = Module()
    f = m.add(Function("entry", [
        TensorType((256, 1024), f32),
        TensorType((1024, 1024), f32),
        TensorType((1024,), f32),
    ], ["x", "w", "bias"]))
    b = TppBuilder(f)
    acc = b.constant(TensorType((256, 1024), f32), init="zero")
    y = b.matmul(f.args[0], f.args[1], acc)
    y = b.add(y, f.args[2])
    y = b.relu(y)
    b.ret(y)
    return m


def test_build_and_verify():
    m = build_mlp_layer()
    m.verify()
    text = print_module(m)
    assert "tl.matmul" in text and "tl.relu" in text


def test_roundtrip():
    m = build_mlp_layer()
    text = print_module(m)
    m2 = parse_module(text)
    m2.verify()
    assert print_module(m2) == text


def test_roundtrip_attrs():
    text = """module attributes {flops = 123} {
  func @f(%x: tensor<8x4xf32>) -> tensor<4x8xf32> {
    %0 = tl.transpose %x {perm = [1, 0]} : tensor<4x8xf32>
    return %0 : tensor<4x8xf32>
  }
}
"""
    m = parse_module(text)
    m.verify()
    assert m.attrs["flops"] == 123
    assert print_module(m) == text


def test_verifier_catches_shape_mismatch():
    text = """func @f(%a: tensor<4x8xf32>, %b: tensor<4x8xf32>, %c: tensor<4x4xf32>) {
  %0 = tl.matmul %a, %b, %c : tensor<4x4xf32>
  return %0 : tensor<4x4xf32>
}
"""
    m = parse_module(text)
    with pytest.raises(ValueError, match="shape mismatch"):
        m.verify()


def test_verifier_catches_bad_perm():
    text = """func @f(%a: tensor<4x8xf32>) {
  %0 = tl.transpose %a {perm = [0, 0]} : tensor<8x4xf32>
  return %0 : tensor<8x4xf32>
}
"""
    with pytest.raises(ValueError, match="perm"):
        parse_module(text).verify()


def test_use_before_def_rejected():
    from tpp_mlir_tpu.ir import ParseError
    text = """func @f(%a: tensor<4xf32>) {
  %0 = tl.relu %1 : tensor<4xf32>
  return %0 : tensor<4xf32>
}
"""
    with pytest.raises(ParseError):
        parse_module(text)


def test_pack_verifier():
    text = """func @f(%a: tensor<64x64xf32>) {
  %0 = tl.pack %a {inner_dims = [0, 1], inner_tiles = [32, 32]} : tensor<2x2x32x32xf32>
  return %0 : tensor<2x2x32x32xf32>
}
"""
    parse_module(text).verify()


def test_xsmm_dispatch_invoke_consistency():
    # equivalent of reference test/Dialect/Xsmm invalid dispatch/invoke tests
    text = """func @f(%a: tensor<4x8xf32>, %b: tensor<8x16xf32>, %c: tensor<4x16xf32>) {
  %0 = xsmm.gemm_dispatch {m = 4, n = 16, k = 8, dtype = "f32", flags = []} : tensor<i64>
  %1 = xsmm.gemm %0, %a, %b, %c : tensor<4x16xf32>
  return %1 : tensor<4x16xf32>
}
"""
    parse_module(text).verify()

    bad = text.replace("m = 4", "m = 5")
    with pytest.raises(ValueError, match="inconsistent"):
        parse_module(bad).verify()


def test_matcher_dsl():
    from tpp_mlir_tpu.ir.matcher import (Matcher, has_rank, is_bias_add,
                                         is_contraction, is_zero_op)

    m = build_mlp_layer()
    f = m["entry"]
    ops = f.ops
    assert is_zero_op(ops[0])
    assert is_contraction(ops[1])
    assert is_bias_add(ops[2])
    mm = Matcher("tl.matmul").operand(0, has_rank(2)).dtype_in("f32")
    assert mm(ops[1])
    assert not mm(ops[2])


def test_multi_function_module():
    """Passes iterate all functions in a module."""
    from tpp_mlir_tpu.passes import run_pipeline

    text = """module {
  func @f1(%x: tensor<8x128xf32>) -> tensor<8x128xf32> {
    %0 = tl.relu %x : tensor<8x128xf32>
    %1 = tl.relu %x : tensor<8x128xf32>
    %2 = tl.add %0, %1 : tensor<8x128xf32>
    return %2 : tensor<8x128xf32>
  }
  func @f2(%y: tensor<4x128xf32>) -> tensor<4x128xf32> {
    %0 = tl.exp %y : tensor<4x128xf32>
    return %0 : tensor<4x128xf32>
  }
}
"""
    m = parse_module(text)
    m.verify()
    assert len(m.funcs) == 2
    run_pipeline(m, "cleanup")
    s = print_module(m)
    assert s.count("func @") == 2
    assert s.count("tl.relu") == 1  # CSE within f1
