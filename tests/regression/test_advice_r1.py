"""Regression tests for the round-1 advisor findings (ADVICE.md).

Each test reproduces the reported hazard and asserts the fixed behavior:
  1. xsmm-combine must not flip operand order of non-commutative binaries.
  2. fold-add-into-dest must not create use-before-def (hoist or skip).
  3. torch importers must reject Conv2d dilation/groups/string padding.
  4. compile(interpret_kernels=False) must force compiled kernels (the
     tri-state must not collapse False to None).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.ir import parse_module, print_module
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.runtime import compile as tpp_compile


def rng(*shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def diff(text, args, atol=1e-4):
    ref = tpp_compile(parse_module(text), jit=False)(*args)
    low = parse_module(text)
    run_pipeline(low, "default-tpp-passes")
    got = tpp_compile(low, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=atol)
    return low


SUB_FLIPPED = """func @entry(%a: tensor<32x64xf32>, %b: tensor<64x64xf32>, %d: tensor<32x64xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<32x64xf32>
  %1 = tl.matmul %a, %b, %0 : tensor<32x64xf32>
  %2 = tl.sub %d, %1 : tensor<32x64xf32>
  return %2 : tensor<32x64xf32>
}
"""

SUB_STRAIGHT = """func @entry(%a: tensor<32x64xf32>, %b: tensor<64x64xf32>, %d: tensor<32x64xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<32x64xf32>
  %1 = tl.matmul %a, %b, %0 : tensor<32x64xf32>
  %2 = tl.sub %1, %d : tensor<32x64xf32>
  return %2 : tensor<32x64xf32>
}
"""


def test_combine_noncommutative_flipped_not_fused():
    # D - (A@B): the fused kernel computes acc OP bias, so fusing would
    # silently return (A@B) - D. Must stay correct (unfused is fine).
    args = (rng(32, 64), rng(64, 64, seed=1), rng(32, 64, seed=2))
    diff(SUB_FLIPPED, args)


def test_combine_noncommutative_straight_fuses():
    # (A@B) - D matches the epilogue order and may fuse; numerics must hold.
    args = (rng(32, 64), rng(64, 64, seed=1), rng(32, 64, seed=2))
    low = diff(SUB_STRAIGHT, args)
    s = print_module(low)
    assert "xsmm.fused_brgemm" in s  # the legal direction still fuses


DIV_FLIPPED = SUB_FLIPPED.replace("tl.sub", "tl.div")


def test_combine_div_flipped_not_fused():
    args = (rng(32, 64), rng(64, 64, seed=1),
            jnp.abs(rng(32, 64, seed=2)) + 1.0)
    diff(DIV_FLIPPED, args)


FOLD_DOMINANCE = """func @entry(%a: tensor<32x64xf32>, %b: tensor<64x64xf32>, %y: tensor<32x64xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<32x64xf32>
  %1 = tl.matmul %a, %b, %0 : tensor<32x64xf32>
  %2 = tl.relu %y : tensor<32x64xf32>
  %3 = tl.add %1, %2 : tensor<32x64xf32>
  return %3 : tensor<32x64xf32>
}
"""


def test_fold_add_into_dest_hoists_addend():
    # The addend's producer (relu) sits after the contraction; the pass must
    # hoist it (it only depends on %y) instead of creating use-before-def.
    args = (rng(32, 64), rng(64, 64, seed=1), rng(32, 64, seed=2))
    low = diff(FOLD_DOMINANCE, args)
    # the fold happened: no standalone add survives before lowering
    assert "tl.add" not in print_module(low)


FOLD_BLOCKED = """func @entry(%a: tensor<32x64xf32>, %b: tensor<64x64xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<32x64xf32>
  %1 = tl.matmul %a, %b, %0 : tensor<32x64xf32>
  %2 = tl.relu %1 : tensor<32x64xf32>
  %3 = tl.add %1, %2 : tensor<32x64xf32>
  return %3 : tensor<32x64xf32>
}
"""


def test_fold_add_into_dest_skips_dependent_addend():
    # The addend depends on the contraction itself: hoisting is illegal and
    # the fold must be skipped — and %1 has 2 uses anyway. Must stay correct.
    args = (rng(32, 64), rng(64, 64, seed=1))
    diff(FOLD_BLOCKED, args)


def test_torch_conv2d_guards():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from tpp_mlir_tpu.frontend import import_torch, import_torch_fx

    for bad in (nn.Conv2d(8, 8, 3, dilation=2),
                nn.Conv2d(8, 8, 3, groups=8),
                nn.Conv2d(8, 8, 3, padding="same")):
        model = nn.Sequential(bad)
        with pytest.raises(NotImplementedError):
            import_torch(model, (1, 8, 16, 16))
        with pytest.raises(NotImplementedError):
            import_torch_fx(model, (1, 8, 16, 16))


def test_torch_importers_shared_lowering_agree():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from tpp_mlir_tpu.frontend import import_torch, import_torch_fx
    from tpp_mlir_tpu.runtime import interpret as tpp_interpret

    torch.manual_seed(0)
    model = nn.Sequential(nn.Conv2d(4, 8, 3, padding=1), nn.ReLU(),
                          nn.Flatten(), nn.Linear(8 * 8 * 8, 16))
    x = rng(2, 4, 8, 8)
    m1 = import_torch(model, (2, 4, 8, 8))
    m2 = import_torch_fx(model, (2, 4, 8, 8))
    o1 = tpp_interpret(m1, "entry", x)[0]
    o2 = tpp_interpret(m2, "entry", x)[0]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    assert m1.attrs["flops"] == m2.attrs["flops"] > 0


def test_compile_interpret_tristate(monkeypatch):
    from tpp_mlir_tpu.runtime import executor

    real_cache = executor.global_cache()
    seen = []

    class Recorder:
        def dispatch(self, key, interpret=None):
            seen.append(interpret)
            return real_cache.dispatch(key, True)

    monkeypatch.setattr(executor, "global_cache", lambda: Recorder())
    text = """func @entry(%a: tensor<16x128xf32>, %b: tensor<128x128xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<16x128xf32>
  %1 = tl.matmul %a, %b, %0 : tensor<16x128xf32>
  return %1 : tensor<16x128xf32>
}
"""
    m = parse_module(text)
    run_pipeline(m, "default-tpp-passes")
    args = (rng(16, 128), rng(128, 128, seed=1))

    tpp_compile(m, interpret_kernels=False, jit=False)(*args)
    assert seen and all(v is False for v in seen)  # False NOT coerced to None

    seen.clear()
    tpp_compile(m, jit=False)(*args)
    assert seen and all(v is None for v in seen)   # default stays tri-state
