"""Regressions for the func.returns escape hole: `Function.returns` are
not in `.uses`, so single-use/erase checks in the fusion passes treated
returned-and-once-consumed values as private — rewiring fold-residual-acc
silently changed a returned tensor's VALUE, and xsmm-combine /
attention-fusion erased returned ops ("returns undefined value" on valid
programs). Every pass now counts returns as an escape."""

import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.ir import parse_module, print_module
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.runtime import compile as tpp_compile
from tpp_mlir_tpu.runtime import tensor_init


def _rng(*shape, seed=0, scale=1.0):
    return jnp.asarray(tensor_init("rand", shape, "f32", seed=seed)) * scale


def _both(text, *args):
    """(reference eval, pipeline eval) of the same program."""
    ref = parse_module(text)
    low = parse_module(text)
    run_pipeline(low, "default-tpp-passes")
    r = tpp_compile(ref, jit=False)(*args)
    l = tpp_compile(low, jit=False)(*args)
    r = r if isinstance(r, tuple) else (r,)
    l = l if isinstance(l, tuple) else (l,)
    for a, b in zip(l, r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
    return print_module(low)


def test_fold_residual_keeps_returned_intermediate():
    """Returning BOTH the pre-residual gemm value and the residual sum:
    rewiring the accumulator would change the first return's value."""
    text = """func @entry(%x: tensor<64x128xf32>, %w: tensor<128x128xf32>, %b: tensor<128xf32>) {
  %0 = tl.constant {init = "zero", seed = 0} : tensor<64x128xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<64x128xf32>
  %2 = tl.add %1, %b : tensor<64x128xf32>
  %3 = tl.add %2, %x : tensor<64x128xf32>
  return %2, %3 : tensor<64x128xf32>, tensor<64x128xf32>
}
"""
    _both(text, _rng(64, 128), _rng(128, 128, seed=1, scale=0.05),
          _rng(128, seed=2))


def test_combine_keeps_returned_contraction():
    """Returning the raw matmul next to its activated epilogue: the chain
    fusion must not erase the returned contraction."""
    text = """func @entry(%x: tensor<64x128xf32>, %w: tensor<128x128xf32>, %b: tensor<128xf32>) {
  %0 = tl.constant {init = "zero", seed = 0} : tensor<64x128xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<64x128xf32>
  %2 = tl.add %1, %b : tensor<64x128xf32>
  %3 = tl.relu %2 : tensor<64x128xf32>
  return %1, %3 : tensor<64x128xf32>, tensor<64x128xf32>
}
"""
    _both(text, _rng(64, 128), _rng(128, 128, seed=1, scale=0.05),
          _rng(128, seed=2))


def test_combine_rejects_broadcast_up_binary():
    """A (1,N) gemm + (M,N) addend: the add RESULT is bigger than the
    contraction — fusing it changed m and returned a wrong-shaped value."""
    text = """func @entry(%x: tensor<1x64xf32>, %w: tensor<64x64xf32>, %r: tensor<32x64xf32>) {
  %0 = tl.constant {init = "zero", seed = 0} : tensor<1x64xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<1x64xf32>
  %2 = tl.add %1, %r : tensor<32x64xf32>
  return %2 : tensor<32x64xf32>
}
"""
    s = _both(text, _rng(1, 64), _rng(64, 64, seed=1, scale=0.05),
              _rng(32, 64, seed=2))
    assert "xsmm.binary" in s, "broadcast-up add must stay standalone"


def test_spatial_addend_not_classified_channel_bias():
    """A (Q,K)-shaped addend over an (N,P,Q,K) conv output varies along
    Q — it is NOT a per-channel bias; classifying it bcast_col made the
    kernel's reshape(1,K) crash."""
    text = """func @entry(%x: tensor<2x14x14x64xf32>, %w: tensor<3x3x64x64xf32>, %r: tensor<12x64xf32>) {
  %0 = tl.constant {init = "zero", seed = 0} : tensor<2x12x12x64xf32>
  %1 = tl.conv2d_nhwc_hwcf %x, %w, %0 : tensor<2x12x12x64xf32>
  %2 = tl.add %1, %r : tensor<2x12x12x64xf32>
  return %2 : tensor<2x12x12x64xf32>
}
"""
    _both(text, _rng(2, 14, 14, 64), _rng(3, 3, 64, 64, seed=1, scale=0.1),
          _rng(12, 64, seed=2))


def test_attention_fusion_keeps_returned_softmax():
    """softmax returned next to its consuming batch_matmul: the
    softmax-lhs fold must not erase it."""
    text = """func @entry(%s: tensor<4x16x16xf32>, %v: tensor<4x16x32xf32>) {
  %0 = tl.softmax %s : tensor<4x16x16xf32>
  %1 = tl.constant {init = "zero", seed = 0} : tensor<4x16x32xf32>
  %2 = tl.batch_matmul %0, %v, %1 : tensor<4x16x32xf32>
  return %0, %2 : tensor<4x16x16xf32>, tensor<4x16x32xf32>
}
"""
    _both(text, _rng(4, 16, 16), _rng(4, 16, 32, seed=1))


def test_pack_matmul_min_dim_honored():
    """min_dim is the tiny-matmul threshold: below it, no packing (the
    old nested check only ever skipped the exact single-tile case)."""
    from tpp_mlir_tpu.passes import make_pass

    text = """func @entry(%x: tensor<64x64xf32>, %w: tensor<64x64xf32>) {
  %0 = tl.constant {init = "zero", seed = 0} : tensor<64x64xf32>
  %1 = tl.matmul %x, %w, %0 : tensor<64x64xf32>
  return %1 : tensor<64x64xf32>
}
"""
    m = parse_module(text)
    make_pass("pack-matmul", tiles=(32, 32, 32), min_dim=64).run(m)
    assert "tl.pack" not in print_module(m)   # 8 tiles < 64: skip
    m2 = parse_module(text)
    make_pass("pack-matmul", tiles=(32, 32, 32), min_dim=4).run(m2)
    assert "tl.pack" in print_module(m2)      # 8 tiles >= 4: packs


def test_get_tile_for_dim_reference_formula():
    """Parity pin for the reference getTileForDim heuristic (kept next
    to pick_blocks, which is the measured TPU path)."""
    from tpp_mlir_tpu.passes.fuse import get_tile_for_dim

    assert get_tile_for_dim(1024, 512, 32) == 512       # aligned divisor
    assert get_tile_for_dim(1024, 500, 32) == 256       # snaps below
    assert get_tile_for_dim(96, 64, 32) == 32           # min_factor=2
    assert get_tile_for_dim(64, 64, 32) == 32           # 64 leaves 1 tile
    assert get_tile_for_dim(60, 64, 32) == 60           # no divisor: dim
