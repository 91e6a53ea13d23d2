"""Pass unit tests — golden-IR style, the pytest analogue of the
reference's FileCheck pass tests (test/Passes/*.mlir)."""

import pytest

from tpp_mlir_tpu.ir import parse_module, print_module
from tpp_mlir_tpu.passes import PassManager, make_pass, run_pipeline


def run(text, *passes, **opts):
    m = parse_module(text)
    m.verify()
    pm = PassManager()
    for p in passes:
        pm.add(make_pass(p, **opts) if opts else p)
    pm.run(m)
    return m


MLP = """func @entry(%x: tensor<256x1024xf32>, %w: tensor<1024x1024xf32>, %bias: tensor<1024xf32>) {
  %0 = tl.constant {init = "zero", seed = 0} : tensor<256x1024xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<256x1024xf32>
  %2 = tl.add %1, %bias : tensor<256x1024xf32>
  %3 = tl.relu %2 : tensor<256x1024xf32>
  return %3 : tensor<256x1024xf32>
}
"""


def test_cleanup_cse_dce():
    text = """func @f(%x: tensor<8x128xf32>) {
  %0 = tl.relu %x : tensor<8x128xf32>
  %1 = tl.relu %x : tensor<8x128xf32>
  %2 = tl.add %0, %1 : tensor<8x128xf32>
  %3 = tl.exp %x : tensor<8x128xf32>
  return %2 : tensor<8x128xf32>
}
"""
    m = run(text, "cleanup")
    s = print_module(m)
    assert s.count("tl.relu") == 1  # CSE merged
    assert "tl.exp" not in s        # DCE removed


def test_fold_add_into_dest():
    # equivalent of reference test FoldAddIntoDest: add(matmul(.., zero), y)
    text = """func @f(%a: tensor<64x64xf32>, %b: tensor<64x64xf32>, %y: tensor<64x64xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<64x64xf32>
  %1 = tl.matmul %a, %b, %0 : tensor<64x64xf32>
  %2 = tl.add %1, %y : tensor<64x64xf32>
  return %2 : tensor<64x64xf32>
}
"""
    m = run(text, "fold-add-into-dest", "cleanup")
    s = print_module(m)
    assert "tl.add" not in s
    assert "tl.matmul %a, %b, %y" in s


def test_decompose_softmax():
    text = """func @f(%x: tensor<16x128xf32>) {
  %0 = tl.softmax %x {axis = 1} : tensor<16x128xf32>
  return %0 : tensor<16x128xf32>
}
"""
    m = run(text, "decompose-softmax")
    s = print_module(m)
    for frag in ("tl.reduce", "tl.sub", "tl.exp", "tl.div"):
        assert frag in s
    assert "tl.softmax" not in s


def test_pack_matmul_golden():
    m = run(MLP, make_pass("pack-matmul", tiles=(128, 128, 256)))
    s = print_module(m)
    assert "tl.blocked_matmul" in s
    assert "tensor<2x4x128x256xf32>" in s   # packed A [Mb,Kb,mb,kb]
    assert "tensor<8x4x256x128xf32>" in s   # packed B [Nb,Kb,kb,nb]
    assert "tl.unpack" in s


def test_pack_matmul_skips_indivisible():
    text = MLP.replace("1024x1024", "1000x1000").replace("256x1024",
                                                         "256x1000") \
              .replace("tensor<1000xf32>", "tensor<1000xf32>")
    text = """func @f(%a: tensor<7x13xf32>, %b: tensor<13x17xf32>, %c: tensor<7x17xf32>) {
  %0 = tl.matmul %a, %b, %c : tensor<7x17xf32>
  return %0 : tensor<7x17xf32>
}
"""
    m = run(text, make_pass("pack-matmul", tiles=(128, 128, 256)))
    assert "tl.matmul" in print_module(m)  # unchanged


def test_propagate_pack_through_bias_relu():
    m = run(MLP, make_pass("pack-matmul", tiles=(128, 128, 256)),
            "propagate-pack", "cleanup")
    s = print_module(m)
    # bias add + relu now happen on the blocked tensor; single unpack at end
    assert s.count("tl.unpack") == 1
    idx_relu = s.index("tl.relu")
    idx_unpack = s.index("tl.unpack")
    assert idx_relu < idx_unpack


def test_constant_fold_pack():
    text = """func @f(%x: tensor<256x512xf32>) {
  %w = tl.constant {init = "rand", seed = 7} : tensor<512x512xf32>
  %c = tl.constant {init = "zero"} : tensor<256x512xf32>
  %0 = tl.matmul %x, %w, %c : tensor<256x512xf32>
  return %0 : tensor<256x512xf32>
}
"""
    m = run(text, make_pass("pack-matmul", tiles=(128, 128, 128)),
            "constant-fold-pack", "cleanup")
    s = print_module(m)
    # weight and zero-acc packs folded away; only the input pack remains
    assert "pack_inner_dims" in s
    assert s.count("tl.pack") == 1


def test_vnni_pack_bf16():
    text = """func @f(%a: tensor<4x64x64xbf16>, %b: tensor<4x64x128xbf16>, %c: tensor<64x128xbf16>) {
  %0 = tl.brgemm %a, %b, %c : tensor<64x128xbf16>
  return %0 : tensor<64x128xbf16>
}
"""
    m = run(text, "pack-vnni")
    s = print_module(m)
    assert "tl.vnni_brgemm" in s
    assert "tensor<4x32x128x2xbf16>" in s


def test_tile_and_fuse_groups():
    m = parse_module(MLP)
    run_pipeline(m, "tile-and-fuse")
    ops = {op.opname: op for op in m["entry"].ops}
    g = ops["tl.matmul"].attrs.get("fusion_group")
    assert g is not None
    assert ops["tl.add"].attrs.get("fusion_group") == g
    assert ops["tl.relu"].attrs.get("fusion_group") == g
    assert ops["tl.constant"].attrs.get("fusion_group") == g
    assert "tile_m" in ops["tl.matmul"].attrs


def test_convert_to_xsmm_and_combine():
    m = run(MLP, "convert-tl-to-xsmm", "xsmm-combine", "fold-xsmm-flags",
            "cleanup", "verify-xsmm")
    s = print_module(m)
    assert "xsmm.fused_brgemm_dispatch" in s
    assert 'binary_kind = "add"' in s
    assert 'unary_kind = "relu"' in s
    assert '"beta_0"' in s
    # chain collapsed: no separate binary/unary invokes remain
    assert "xsmm.binary" not in s.replace("binary_kind", "")
    assert "xsmm.gemm " not in s


def test_default_tpp_passes_packed_mlp():
    """Parity mode: physical blocked layouts, like the reference."""
    m = run(MLP, "default-tpp-passes-packed")
    s = print_module(m)
    # end state: packed weights + one fused blocked brgemm + unpack
    assert "xsmm.fused_brgemm" in s
    assert 'layout = "blocked"' in s
    assert '"beta_0"' in s


def test_default_tpp_passes_flat_mlp():
    """Default (TPU perf) mode: flat fused kernel, beta_0 folded."""
    m = run(MLP, "default-tpp-passes")
    s = print_module(m)
    assert "xsmm.fused_brgemm" in s
    assert "tl.pack" not in s
    assert '"beta_0"' in s


def test_conv_pipeline_ir():
    text = """func @f(%i: tensor<4x128x14x14xf32>, %w: tensor<256x128x3x3xf32>, %bias: tensor<256xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<4x256x12x12xf32>
  %1 = tl.conv2d_nchw_fchw %i, %w, %0 {strides = [1, 1]} : tensor<4x256x12x12xf32>
  %2 = tl.reshape %bias : tensor<256x1x1xf32>
  %3 = tl.add %1, %2 : tensor<4x256x12x12xf32>
  %4 = tl.relu %3 : tensor<4x256x12x12xf32>
  return %4 : tensor<4x256x12x12xf32>
}
"""
    m = run(text, "default-tpp-passes")
    s = print_module(m)
    # NCHW convs are normalized to the NHWC-native path by conv-to-nhwc.
    assert 'layout = "conv_nhwc"' in s
    assert "xsmm.brgemm" in s or "xsmm.fused_brgemm" in s


def test_verify_xsmm_rejects_mixed_use():
    text = """func @f(%a: tensor<4x8xf32>, %b: tensor<8x16xf32>, %c: tensor<4x16xf32>) {
  %0 = xsmm.gemm_dispatch {m = 4, n = 16, k = 8, dtype = "f32", flags = []} : tensor<i64>
  %1 = xsmm.gemm %0, %a, %b, %c : tensor<4x16xf32>
  perf.sink %0
  return %1 : tensor<4x16xf32>
}
"""
    m = parse_module(text)
    with pytest.raises(ValueError, match="non-invoke"):
        run_pipeline(m, "verify-xsmm")


def test_sink_transpose_residual_add_converges():
    """Regression: add(transpose(y), x) with a full-shape non-transpose
    operand must not ping-pong forever. The sink is one-way: transposes move
    from computed values onto graph leaves only."""
    text = """func @f(%x: tensor<2x8x8x4xf32>, %y: tensor<2x4x8x8xf32>) {
  %0 = tl.transpose %y {perm = [0, 2, 3, 1]} : tensor<2x8x8x4xf32>
  %1 = tl.add %0, %x : tensor<2x8x8x4xf32>
  %2 = tl.relu %1 : tensor<2x8x8x4xf32>
  return %2 : tensor<2x8x8x4xf32>
}
"""
    m = run(text, "sink-transpose")
    s = print_module(m)
    # %y is a block arg here, so the add stays put (both operands are
    # leaves); the pass must simply terminate.
    assert "tl.add" in s

    # Computed-source case: transpose of a relu sinks the add into the
    # pre-transpose domain, leaving one transpose on the leaf %x.
    text2 = """func @f(%x: tensor<2x8x8x4xf32>, %y: tensor<2x4x8x8xf32>) {
  %r = tl.relu %y : tensor<2x4x8x8xf32>
  %0 = tl.transpose %r {perm = [0, 2, 3, 1]} : tensor<2x8x8x4xf32>
  %1 = tl.add %0, %x : tensor<2x8x8x4xf32>
  return %1 : tensor<2x8x8x4xf32>
}
"""
    m2 = run(text2, "sink-transpose")
    s2 = print_module(m2)
    assert s2.count("tl.transpose") == 2  # one on %x, one on the result


def test_fold_const_scale_bn_into_conv():
    """conv + bias + eval-BN(scale+shift) folds into the conv constants:
    scale multiplies the weight literal, shift+bias merge into one add that
    conv-init-simplify absorbs as the accumulator init."""
    text = """func @f(%x: tensor<2x8x8x16xf32>) {
  %w = tl.constant {init = "rand", seed = 3} : tensor<3x3x16x16xf32>
  %acc = tl.constant {init = "zero"} : tensor<2x6x6x16xf32>
  %c = tl.conv2d_nhwc_hwcf %x, %w, %acc {strides = [1, 1]} : tensor<2x6x6x16xf32>
  %bias = tl.constant {init = "rand", seed = 4} : tensor<16xf32>
  %b1 = tl.add %c, %bias : tensor<2x6x6x16xf32>
  %s = tl.constant {init = "rand", seed = 5} : tensor<16xf32>
  %m1 = tl.mul %b1, %s : tensor<2x6x6x16xf32>
  %sh = tl.constant {init = "rand", seed = 6} : tensor<16xf32>
  %a2 = tl.add %m1, %sh : tensor<2x6x6x16xf32>
  %r = tl.relu %a2 : tensor<2x6x6x16xf32>
  return %r : tensor<2x6x6x16xf32>
}
"""
    m = run(text, "fold-const-scale", "conv-init-simplify", "cleanup")
    s = print_module(m)
    assert "tl.mul" not in s            # scale folded into the weight
    assert "tl.add" not in s            # adds merged + absorbed into acc
    assert 'literal' in s


def test_pad_commutes_with_transpose():
    text = """func @f(%x: tensor<2x4x8x8xf32>) {
  %0 = tl.transpose %x {perm = [0, 2, 3, 1]} : tensor<2x8x8x4xf32>
  %1 = tl.pad %0 {lo = [0, 1, 1, 0], hi = [0, 1, 1, 0]} : tensor<2x10x10x4xf32>
  %2 = tl.relu %1 : tensor<2x10x10x4xf32>
  return %2 : tensor<2x10x10x4xf32>
}
"""
    m = run(text, "sink-transpose")
    s = print_module(m)
    # pad moved above the transpose (NCHW padding on dims 2,3)
    assert s.index("tl.pad") < s.index("tl.transpose")
    assert "lo = [0, 0, 1, 1]" in s


def test_tile_and_fuse_diamond_multi_consumer():
    """add(relu(y), y) with y used twice: the all-users-in-worklist rule
    (reference hasAllUsersInWorklist, TileConsumerAndFuseProducers.cpp:
    332-457) admits the diamond into ONE fusion group."""
    text = """func @f(%a: tensor<64x64xf32>, %b: tensor<64x64xf32>) {
  %c = tl.constant {init = "zero"} : tensor<64x64xf32>
  %y = tl.matmul %a, %b, %c : tensor<64x64xf32>
  %r = tl.relu %y : tensor<64x64xf32>
  %z = tl.add %r, %y : tensor<64x64xf32>
  return %z : tensor<64x64xf32>
}
"""
    m = parse_module(text)
    run_pipeline(m, "tile-and-fuse")
    ops = {}
    for op in m["f"].ops:
        ops.setdefault(op.opname, op)
    g = ops["tl.matmul"].attrs.get("fusion_group")
    assert g is not None
    assert ops["tl.relu"].attrs.get("fusion_group") == g
    assert ops["tl.add"].attrs.get("fusion_group") == g
    assert ops["tl.constant"].attrs.get("fusion_group") == g


def test_tile_and_fuse_eltwise_producer():
    """An eltwise producer feeding the contraction (relu(x) @ w) joins the
    group when the contraction is its only user (reference fuses producers,
    not just consumer chains)."""
    text = """func @f(%x: tensor<64x64xf32>, %w: tensor<64x64xf32>) {
  %c = tl.constant {init = "zero"} : tensor<64x64xf32>
  %p = tl.relu %x : tensor<64x64xf32>
  %y = tl.matmul %p, %w, %c : tensor<64x64xf32>
  %z = tl.relu %y : tensor<64x64xf32>
  return %z : tensor<64x64xf32>
}
"""
    m = parse_module(text)
    run_pipeline(m, "tile-and-fuse")
    ops = list(m["f"].ops)
    mm = next(o for o in ops if o.opname == "tl.matmul")
    g = mm.attrs.get("fusion_group")
    assert g is not None
    relus = [o for o in ops if o.opname == "tl.relu"]
    assert all(o.attrs.get("fusion_group") == g for o in relus)


def test_tile_and_fuse_no_recompute_guard():
    """A producer with a user OUTSIDE the group must NOT be fused (fusing it
    would recompute the value in the tile loop)."""
    text = """func @f(%a: tensor<64x64xf32>, %b: tensor<64x64xf32>) {
  %c = tl.constant {init = "zero"} : tensor<64x64xf32>
  %p = tl.relu %a : tensor<64x64xf32>
  %y = tl.matmul %p, %b, %c : tensor<64x64xf32>
  %z = tl.relu %y : tensor<64x64xf32>
  return %z, %p : tensor<64x64xf32>, tensor<64x64xf32>
}
"""
    m = parse_module(text)
    run_pipeline(m, "tile-and-fuse")
    ops = list(m["f"].ops)
    mm = next(o for o in ops if o.opname == "tl.matmul")
    g = mm.attrs.get("fusion_group")
    assert g is not None
    pre = next(o for o in ops if o.opname == "tl.relu"
               and o.operands[0].owner is None)
    assert pre.attrs.get("fusion_group") != g
