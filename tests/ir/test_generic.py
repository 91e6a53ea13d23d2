"""tl.generic: verifier, round-trip, classification, degeneralize/generalize,
direct generic->xsmm lowering with map-based broadcast flags (reference
ConvertLinalgToXsmm.cpp:181-640, LinalgDeGeneralize.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.ir import parse_module, print_module
from tpp_mlir_tpu.ir.affine import classify_generic, infer_bcast_from_map
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.runtime import compile as tpp_compile


def rng(*shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


GENERIC_MATMUL = """func @entry(%a: tensor<32x64xf32>, %b: tensor<64x48xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<32x48xf32>
  %1 = tl.generic %a, %b, %0 {body = ["add", ["mul", ["arg", 0], ["arg", 1]], ["arg", 2]], indexing_maps = [[0, 2], [2, 1], [0, 1]], iterator_types = ["parallel", "parallel", "reduction"]} : tensor<32x48xf32>
  return %1 : tensor<32x48xf32>
}
"""


def test_generic_roundtrip_and_eval():
    m = parse_module(GENERIC_MATMUL)
    m.verify()
    s = print_module(m)
    m2 = parse_module(s)
    assert print_module(m2) == s
    a, b = rng(32, 64), rng(64, 48, seed=1)
    got = tpp_compile(m, jit=False)(a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(a @ b),
                               atol=1e-4, rtol=1e-4)


def test_generic_verifier_rejects():
    bad_cases = [
        # map rank mismatch
        GENERIC_MATMUL.replace("[0, 2], [2, 1]", "[0], [2, 1]"),
        # output map uses a reduction dim
        GENERIC_MATMUL.replace("[2, 1], [0, 1]", "[2, 1], [0, 2]"),
        # non-projected-permutation map
        GENERIC_MATMUL.replace("[0, 2], [2, 1]", "[0, 0], [2, 1]"),
        # body references a missing arg
        GENERIC_MATMUL.replace('["arg", 2]', '["arg", 7]'),
    ]
    for text in bad_cases:
        with pytest.raises(ValueError):
            parse_module(text).verify()


def test_classify_matmul_brgemm_binary():
    m = parse_module(GENERIC_MATMUL)
    op = next(o for o in m["entry"].ops if o.opname == "tl.generic")
    assert classify_generic(op) == ("contraction", "matmul", False)


def test_infer_bcast_from_map_square_unambiguous():
    # the shape-based hazard: a (N,) operand against a square (N,N) output
    assert infer_bcast_from_map((0, 1), (1,)) == "bcast_col"
    assert infer_bcast_from_map((0, 1), (0,)) == "bcast_row"
    assert infer_bcast_from_map((0, 1), ()) == "bcast_scalar"
    assert infer_bcast_from_map((0, 1), (0, 1)) == "none"


def test_degeneralize_row_broadcast_square():
    """Square-matrix row broadcast: map says d0 (rows); degeneralize must
    insert the (m,1) reshape. Shape-based inference would answer bcast_col
    and silently compute the wrong thing."""
    text = """func @entry(%x: tensor<64x64xf32>, %v: tensor<64xf32>) {
  %1 = tl.generic %x, %v, %x {body = ["add", ["arg", 0], ["arg", 1]], indexing_maps = [[0, 1], [0], [0, 1]], iterator_types = ["parallel", "parallel"]} : tensor<64x64xf32>
  return %1 : tensor<64x64xf32>
}
"""
    x, v = rng(64, 64), rng(64, seed=1)
    want = np.asarray(x) + np.asarray(v)[:, None]   # row-indexed: column vec
    m = parse_module(text)
    got_ref = tpp_compile(m, jit=False)(x, v)
    np.testing.assert_allclose(np.asarray(got_ref), want, atol=1e-6)

    low = parse_module(text)
    run_pipeline(low, "default-tpp-passes")
    got = tpp_compile(low, jit=False)(x, v)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_generic_mlp_lowers_to_same_fused_kernel():
    """A generic-form MLP (tpp-gen --output=generic) lowers to the same
    fused kernels as the named form, differentially tested."""
    from tpp_mlir_tpu.models.mlp import MlpConfig, build_mlp

    cfg = dict(batch=32, layers=(64, 64, 64), bias=True, relu=True,
               kernel="args")
    named = build_mlp(MlpConfig(**cfg))
    gen = build_mlp(MlpConfig(output="generic", **cfg))
    s = print_module(gen)
    assert s.count("tl.generic") == 6  # 2 layers x (matmul, bias, relu)

    run_pipeline(named, "default-tpp-passes")
    run_pipeline(gen, "default-tpp-passes")
    sn, sg = print_module(named), print_module(gen)
    assert ("xsmm.fused_chain" in sg) == ("xsmm.fused_chain" in sn)
    assert "tl.generic" not in sg

    args = (rng(32, 64), rng(64, 64, seed=1), rng(64, seed=2),
            rng(64, 64, seed=3), rng(64, seed=4),
            rng(64, 64, seed=5), rng(64, seed=6))
    on = tpp_compile(named, jit=False)(*args)
    og = tpp_compile(gen, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(og), np.asarray(on), atol=1e-5)


def test_generalize_roundtrip():
    """named -> generic -> named round-trips numerically and structurally."""
    text = """func @entry(%a: tensor<16x32xf32>, %b: tensor<32x24xf32>, %bias: tensor<24xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<16x24xf32>
  %1 = tl.matmul %a, %b, %0 : tensor<16x24xf32>
  %2 = tl.add %1, %bias : tensor<16x24xf32>
  %3 = tl.relu %2 : tensor<16x24xf32>
  return %3 : tensor<16x24xf32>
}
"""
    args = (rng(16, 32), rng(32, 24, seed=1), rng(24, seed=2))
    ref = tpp_compile(parse_module(text), jit=False)(*args)

    m = parse_module(text)
    run_pipeline(m, "generalize-named-ops")
    s = print_module(m)
    assert "tl.matmul" not in s and "tl.add" not in s and "tl.relu" not in s
    assert s.count("tl.generic") == 3
    got_g = tpp_compile(m, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref), atol=1e-5)

    run_pipeline(m, "degeneralize")
    s2 = print_module(m)
    assert "tl.generic" not in s2
    assert "tl.matmul" in s2 and "tl.relu" in s2
    got_n = tpp_compile(m, jit=False)(*args)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(ref), atol=1e-5)


def test_direct_generic_to_xsmm():
    """linalg-lowering alone (no degeneralize) matches generics directly —
    the reference's ConvertLinalgToXsmm core — with map-derived flags."""
    m = parse_module(GENERIC_MATMUL)
    run_pipeline(m, "linalg-lowering")
    s = print_module(m)
    assert "xsmm.gemm" in s and "tl.generic" not in s
    a, b = rng(32, 64), rng(64, 48, seed=1)
    got = tpp_compile(m, jit=False)(a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(a @ b),
                               atol=1e-4, rtol=1e-4)

    # binary with a row-broadcast (map (0,)) on a square output
    text = """func @entry(%x: tensor<64x64xf32>, %v: tensor<64xf32>) {
  %1 = tl.generic %x, %v, %x {body = ["mul", ["arg", 0], ["arg", 1]], indexing_maps = [[0, 1], [0], [0, 1]], iterator_types = ["parallel", "parallel"]} : tensor<64x64xf32>
  return %1 : tensor<64x64xf32>
}
"""
    m2 = parse_module(text)
    run_pipeline(m2, "linalg-lowering")
    s2 = print_module(m2)
    assert 'bcast_b = "bcast_row"' in s2
    x, v = rng(64, 64), rng(64, seed=1)
    got2 = tpp_compile(m2, jit=False)(x, v)
    np.testing.assert_allclose(np.asarray(got2),
                               np.asarray(x) * np.asarray(v)[:, None],
                               atol=1e-5)


def test_generic_brgemm_classify_and_lower():
    text = """func @entry(%a: tensor<4x16x32xf32>, %b: tensor<4x32x24xf32>) {
  %0 = tl.constant {init = "zero"} : tensor<16x24xf32>
  %1 = tl.generic %a, %b, %0 {body = ["add", ["mul", ["arg", 0], ["arg", 1]], ["arg", 2]], indexing_maps = [[2, 0, 3], [2, 3, 1], [0, 1]], iterator_types = ["parallel", "parallel", "reduction", "reduction"]} : tensor<16x24xf32>
  return %1 : tensor<16x24xf32>
}
"""
    m = parse_module(text)
    op = next(o for o in m["entry"].ops if o.opname == "tl.generic")
    assert classify_generic(op) == ("contraction", "brgemm", False)
    a, b = rng(4, 16, 32), rng(4, 32, 24, seed=1)
    want = np.einsum("bmk,bkn->mn", np.asarray(a), np.asarray(b))
    low = parse_module(text)
    run_pipeline(low, "default-tpp-passes")
    got = tpp_compile(low, jit=False)(a, b)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-3)


def test_matcher_generic_predicates():
    from tpp_mlir_tpu.ir.matcher import Matcher

    m = parse_module(GENERIC_MATMUL)
    op = next(o for o in m["entry"].ops if o.opname == "tl.generic")
    mm = (Matcher("tl.generic").num_loops(3).dim(2, "reduction")
          .body_head("add").indexing_map(2, lambda mp: mp == (0, 1)))
    assert mm(op)
    assert not Matcher("tl.generic").num_loops(2)(op)
    assert not Matcher("tl.generic").body_head("mul")(op)


def test_tpp_gen_output_generic_cli():
    from tpp_mlir_tpu.tools.mlir_gen import build_parser, config_from_args, \
        generate_text

    args = build_parser().parse_args(
        ["--batch=8", "--layers=16,16", "--bias", "--relu",
         "--output=generic", "--kernel=args"])
    text = generate_text(config_from_args(args))
    assert "tl.generic" in text and "tl.matmul" not in text
    m = parse_module(text)
    m.verify()
