"""One invalid-IR case per verifier family (reference invalid.mlir test
files, test/Dialect/*/invalid*.mlir: every verifier must reject, with a
message naming the op)."""

import pytest

from tpp_mlir_tpu.ir import parse_module


def expect_invalid(text, match):
    m = parse_module(text)
    with pytest.raises(ValueError, match=match):
        m.verify()


def test_matmul_contraction_mismatch():
    expect_invalid("""func @f(%a: tensor<8x16xf32>, %b: tensor<32x8xf32>, %c: tensor<8x8xf32>) {
  %0 = tl.matmul %a, %b, %c : tensor<8x8xf32>
  return %0 : tensor<8x8xf32>
}
""", "tl.matmul")


def test_matmul_result_type_mismatch():
    expect_invalid("""func @f(%a: tensor<8x16xf32>, %b: tensor<16x8xf32>, %c: tensor<8x8xf32>) {
  %0 = tl.matmul %a, %b, %c : tensor<8x16xf32>
  return %0 : tensor<8x16xf32>
}
""", "tl.matmul")


def test_batch_matmul_batch_mismatch():
    expect_invalid("""func @f(%a: tensor<2x8x16xf32>, %b: tensor<3x16x8xf32>, %c: tensor<2x8x8xf32>) {
  %0 = tl.batch_matmul %a, %b, %c : tensor<2x8x8xf32>
  return %0 : tensor<2x8x8xf32>
}
""", "tl.batch_matmul")


def test_brgemm_rank():
    expect_invalid("""func @f(%a: tensor<8x16xf32>, %b: tensor<16x8xf32>, %c: tensor<8x8xf32>) {
  %0 = tl.brgemm %a, %b, %c : tensor<8x8xf32>
  return %0 : tensor<8x8xf32>
}
""", "tl.brgemm")


def test_blocked_matmul_block_mismatch():
    expect_invalid("""func @f(%a: tensor<2x2x32x32xf32>, %b: tensor<2x2x32x32xf32>, %c: tensor<2x2x32x16xf32>) {
  %0 = tl.blocked_matmul %a, %b, %c : tensor<2x2x32x16xf32>
  return %0 : tensor<2x2x32x16xf32>
}
""", "tl.blocked_matmul")


def test_pad_lo_hi_arity():
    expect_invalid("""func @f(%x: tensor<8x8xf32>) {
  %0 = tl.pad %x {lo = [1], hi = [1]} : tensor<10x8xf32>
  return %0 : tensor<10x8xf32>
}
""", "tl.pad")


def test_broadcast_incompatible():
    expect_invalid("""func @f(%x: tensor<3xf32>) {
  %0 = tl.broadcast %x : tensor<8x5xf32>
  return %0 : tensor<8x5xf32>
}
""", "tl.broadcast")


def test_transpose_bad_perm():
    expect_invalid("""func @f(%x: tensor<4x8xf32>) {
  %0 = tl.transpose %x {perm = [0, 0]} : tensor<8x4xf32>
  return %0 : tensor<8x4xf32>
}
""", "tl.transpose")


def test_vnni_pack_indivisible():
    expect_invalid("""func @f(%x: tensor<15x8xbf16>) {
  %0 = tl.vnni_pack %x {vnni = 2} : tensor<7x8x2xbf16>
  return %0 : tensor<7x8x2xbf16>
}
""", "tl.vnni_pack")


def test_reduce_bad_kind():
    expect_invalid("""func @f(%x: tensor<8x8xf32>) {
  %0 = tl.reduce %x {kind = "mean", axes = [1]} : tensor<8x1xf32>
  return %0 : tensor<8x1xf32>
}
""", "tl.reduce")


def test_reshape_element_count():
    expect_invalid("""func @f(%x: tensor<8x8xf32>) {
  %0 = tl.reshape %x : tensor<4x15xf32>
  return %0 : tensor<4x15xf32>
}
""", "tl.reshape")


def test_attention_shape_mismatch():
    expect_invalid("""func @f(%q: tensor<2x64x32xf32>, %k: tensor<2x64x16xf32>, %v: tensor<2x64x32xf32>) {
  %0 = tl.attention %q, %k, %v {scale = 1.0} : tensor<2x64x32xf32>
  return %0 : tensor<2x64x32xf32>
}
""", "tl.attention")


def test_pack_indivisible_tiles():
    expect_invalid("""func @f(%x: tensor<10x8xf32>) {
  %0 = tl.pack %x {inner_dims = [0, 1], inner_tiles = [4, 4]} : tensor<2x2x4x4xf32>
  return %0 : tensor<2x2x4x4xf32>
}
""", "tl.pack")


def test_unpack_shape_mismatch():
    expect_invalid("""func @f(%x: tensor<2x2x4x4xf32>) {
  %0 = tl.unpack %x {inner_dims = [0, 1], inner_tiles = [4, 4]} : tensor<8x12xf32>
  return %0 : tensor<8x12xf32>
}
""", "tl.unpack")


def test_conv_nchw_channel_mismatch():
    expect_invalid("""func @f(%i: tensor<1x8x10x10xf32>, %w: tensor<4x16x3x3xf32>, %o: tensor<1x4x8x8xf32>) {
  %0 = tl.conv2d_nchw_fchw %i, %w, %o : tensor<1x4x8x8xf32>
  return %0 : tensor<1x4x8x8xf32>
}
""", "tl.conv2d_nchw_fchw")


def test_conv_nhwc_output_mismatch():
    expect_invalid("""func @f(%i: tensor<1x10x10x8xf32>, %w: tensor<3x3x8x4xf32>, %o: tensor<1x9x9x4xf32>) {
  %0 = tl.conv2d_nhwc_hwcf %i, %w, %o : tensor<1x9x9x4xf32>
  return %0 : tensor<1x9x9x4xf32>
}
""", "tl.conv2d_nhwc_hwcf")


def test_xsmm_gemm_dispatch_operand_mismatch():
    """Dispatch<->invoke cross-check (reference XsmmVerify.cpp): invoke
    operand shapes must match the dispatch's m/n/k."""
    expect_invalid("""func @f(%a: tensor<8x16xf32>, %b: tensor<16x8xf32>, %c: tensor<8x8xf32>) {
  %d = xsmm.gemm_dispatch {m = 8, n = 8, k = 32, dtype = "f32", flags = []} : tensor<i64>
  %0 = xsmm.gemm %d, %a, %b, %c : tensor<8x8xf32>
  return %0 : tensor<8x8xf32>
}
""", "xsmm.gemm")


def test_xsmm_brgemm_batch_mismatch():
    expect_invalid("""func @f(%a: tensor<2x8x16xf32>, %b: tensor<4x16x8xf32>, %c: tensor<8x8xf32>) {
  %d = xsmm.brgemm_dispatch {m = 8, n = 8, k = 16, batch = 2, dtype = "f32", flags = []} : tensor<i64>
  %0 = xsmm.brgemm %d, %a, %b, %c : tensor<8x8xf32>
  return %0 : tensor<8x8xf32>
}
""", "xsmm.brgemm")


def test_xsmm_attention_seq_mismatch():
    expect_invalid("""func @f(%q: tensor<2x64x32xf32>, %k: tensor<2x32x32xf32>, %v: tensor<2x64x32xf32>) {
  %d = xsmm.attention_dispatch {batch = 2, seq = 64, seq_kv = 64, head_dim = 32, dtype = "f32", scale = 1.0, flags = []} : tensor<i64>
  %0 = xsmm.attention %d, %q, %k, %v : tensor<2x64x32xf32>
  return %0 : tensor<2x64x32xf32>
}
""", "xsmm.attention")


def test_generic_map_arity_mismatch():
    expect_invalid("""func @f(%a: tensor<8x8xf32>, %c: tensor<8x8xf32>) {
  %0 = tl.generic %a, %c {maps = [[0, 1]], iterators = ["parallel", "parallel"], body = ["add", ["arg", 0], ["arg", 1]]} : tensor<8x8xf32>
  return %0 : tensor<8x8xf32>
}
""", "tl.generic")


def test_cast_rank_change_rejected():
    expect_invalid("""func @f(%x: tensor<8x8xf32>) {
  %0 = tl.cast %x : tensor<8x4xbf16>
  return %0 : tensor<8x4xbf16>
}
""", "tl.cast")


def test_layer_norm_bad_gamma_shape():
    expect_invalid("""func @f(%x: tensor<8x32xf32>, %g: tensor<16xf32>, %b: tensor<16xf32>) {
  %0 = tl.layer_norm %x, %g, %b : tensor<8x32xf32>
  return %0 : tensor<8x32xf32>
}
""", "tl.layer_norm")


def test_gather_float_indices_rejected():
    expect_invalid("""func @f(%t: tensor<96x64xf32>, %i: tensor<2x16xf32>) {
  %0 = tl.gather %t, %i : tensor<2x16x64xf32>
  return %0 : tensor<2x16x64xf32>
}
""", "tl.gather")


def test_gather_bad_result_shape():
    expect_invalid("""func @f(%t: tensor<96x64xf32>, %i: tensor<2x16xi32>) {
  %0 = tl.gather %t, %i : tensor<2x16x32xf32>
  return %0 : tensor<2x16x32xf32>
}
""", "tl.gather")


def test_erase_refuses_returned_value():
    """Function.erase guards the returns-escape invariant at the IR
    level (the 39cdbae bug class: returns are not in .uses)."""
    import pytest

    from tpp_mlir_tpu.ir import parse_module

    m = parse_module("""func @f(%x: tensor<4x4xf32>) {
  %0 = tl.relu %x : tensor<4x4xf32>
  return %0 : tensor<4x4xf32>
}
""")
    f = m["f"]
    op = f.ops[0]
    with pytest.raises(ValueError, match="returned"):
        f.erase(op)


def test_parser_truncated_body_is_parse_error():
    import pytest

    from tpp_mlir_tpu.ir import parse_module
    from tpp_mlir_tpu.ir.parser import ParseError

    with pytest.raises(ParseError, match="end of input"):
        parse_module("func @f(%x: tensor<4xf32>) {")
