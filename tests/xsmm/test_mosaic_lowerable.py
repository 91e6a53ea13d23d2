"""Guard against primitives Mosaic cannot lower inside TPU kernels.

Interpret-mode CPU tests execute kernel bodies with the full XLA:CPU op set,
so a primitive like `erfc` (what jax.nn.gelu(approximate=False) lowers
through) passes every numeric test yet fails to compile on real TPU:
"Unimplemented primitive in Pallas TPU lowering ... erfc" (measured r3 on
the imported transformer block's exact-GELU epilogue).

This test closes the gap WITHOUT TPU hardware: trace the compiled-mode
(interpret=False) kernels to a jaxpr and assert no known-unsupported
primitive appears anywhere under the pallas_call. Tracing is
platform-independent — only execution needs the TPU.
"""

import jax
import jax.numpy as jnp
import pytest

from tpp_mlir_tpu.xsmm.flags import ChainKey
from tpp_mlir_tpu.xsmm.kernels import build_kernel

# Primitives Mosaic has no TPU lowering for (discovered on v5e, jax 0.9:
# BOTH erf and erfc fail with "Unimplemented primitive in Pallas TPU
# lowering" — exact gelu therefore runs a polynomial erf, _erf_poly).
UNSUPPORTED = ("erfc", "erf", "erf_inv")


def assert_lowerable(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    text = str(jaxpr)
    for prim in UNSUPPORTED:
        # match the primitive name as a word: "erfc " in eqn position
        assert f" {prim} " not in text and f"{prim}[" not in text, (
            f"kernel jaxpr contains `{prim}`, which Mosaic cannot lower "
            f"on TPU")


@pytest.mark.parametrize("unary", ["relu", "gelu", "gelu_tanh", "tanh",
                                   "exp", "square", "sqrt", "negate"])
def test_chain_epilogues_mosaic_lowerable(unary):
    key = ChainKey(m=8, dims=(128, 128), dtype="f32", has_bias=True,
                   unary_kind=unary, last_unary=unary)
    fn = build_kernel(key, interpret=False)
    x = jnp.zeros((8, 128), jnp.float32)
    w = jnp.zeros((128, 128), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    assert_lowerable(fn, x, w, b)


def test_exact_gelu_kernel_matches_torch_reference():
    """The in-kernel exact-gelu spelling (0.5*x*(1+erf)) must still match
    torch nn.GELU (erfc-based jax.nn.gelu) to f32 roundoff."""
    key = ChainKey(m=8, dims=(128, 128), dtype="f32", has_bias=True,
                   unary_kind="gelu", last_unary="gelu")
    fn = build_kernel(key, interpret=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 128), jnp.float32) * 3.0
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 128),
                          jnp.float32) / 16.0
    b = jax.random.normal(jax.random.PRNGKey(2), (128,), jnp.float32)
    got = fn(x, w, b)
    want = jax.nn.gelu(x @ w + b, approximate=False)
    assert jnp.max(jnp.abs(got - want)) < 1e-5


def test_grouped_and_int8_gemm_mosaic_lowerable():
    """The scalar-prefetch grouped GEMM and the int8 compute GEMM trace
    (compiled mode) without Mosaic-unsupported primitives."""
    from tpp_mlir_tpu.xsmm.flags import GroupedGemmKey, Int8GemmKey

    gkey = GroupedGemmKey(n_groups=2, m=256, n=256, k=128, bm=128,
                          dtype="bf16", unary_kind="gelu")
    gfn = build_kernel(gkey, interpret=False)
    ge = jnp.zeros((2,), jnp.int32)
    assert_lowerable(gfn, ge, jnp.zeros((256, 128), jnp.bfloat16),
                     jnp.zeros((2, 128, 256), jnp.bfloat16))

    skey = GroupedGemmKey(n_groups=2, m=256, n=256, k=128, bm=128,
                          dtype="bf16", unary_kind="gelu", layers=3)
    sfn = build_kernel(skey, interpret=False)
    assert_lowerable(sfn, jnp.zeros((), jnp.int32), ge,
                     jnp.zeros((256, 128), jnp.bfloat16),
                     jnp.zeros((3, 2, 128, 256), jnp.bfloat16))

    ikey = Int8GemmKey(m=32, n=256, k=128)
    ifn = build_kernel(ikey, interpret=False)
    assert_lowerable(ifn, jnp.zeros((32, 128), jnp.int8),
                     jnp.zeros((128, 256), jnp.int8),
                     jnp.zeros((32,), jnp.float32),
                     jnp.zeros((256,), jnp.float32))


def test_decode_attn_int8_kv_mosaic_lowerable():
    """The int8-KV decode-attention kernel (stacked + scale operands)
    traces compiled-mode without Mosaic-unsupported primitives."""
    from tpp_mlir_tpu.xsmm.decode_attn import (DecodeAttnKey,
                                               build_decode_attn)

    key = DecodeAttnKey(batch=2, heads=8, seq=128, head_dim=128,
                        dtype="bf16", stacked=2, kv_quant=True)
    fn = build_decode_attn(key, interpret=False)
    q = jnp.zeros((2, 8, 128), jnp.bfloat16)
    kc = jnp.zeros((2, 2, 8, 128, 128), jnp.int8)
    ks = jnp.zeros((2, 2, 8, 128), jnp.float32)
    assert_lowerable(lambda *a: fn(*a, li=jnp.asarray(0, jnp.int32),
                                   k_s=ks, v_s=ks),
                     q, kc, kc, jnp.asarray(5, jnp.int32))


def test_grouped_training_kernels_mosaic_lowerable():
    """The grouped dgrad (transpose_b) and wgrad kernels trace
    compiled-mode without Mosaic-unsupported primitives."""
    from tpp_mlir_tpu.xsmm.flags import GroupedGemmKey, GroupedWgradKey

    tkey = GroupedGemmKey(n_groups=2, m=256, n=128, k=256, bm=128,
                          dtype="bf16", transpose_b=True, out_dtype="f32")
    tfn = build_kernel(tkey, interpret=False)
    ge = jnp.zeros((2,), jnp.int32)
    assert_lowerable(tfn, ge, jnp.zeros((256, 256), jnp.bfloat16),
                     jnp.zeros((2, 128, 256), jnp.bfloat16))

    wkey = GroupedWgradKey(n_groups=2, m=256, k=256, n=128, bm=128,
                           dtype="bf16")
    wfn = build_kernel(wkey, interpret=False)
    assert_lowerable(wfn, ge, jnp.zeros((256, 256), jnp.bfloat16),
                     jnp.zeros((256, 128), jnp.bfloat16))


def test_r6_kernel_variants_mosaic_lowerable():
    """r6 additions: stacked+transpose_b grouped dgrad, int8 GEMM with
    fused bias+gelu, and the pack2 head-pair decode attention all trace
    compiled-mode without Mosaic-unsupported primitives."""
    from tpp_mlir_tpu.xsmm.decode_attn import (DecodeAttnKey,
                                               build_decode_attn)
    from tpp_mlir_tpu.xsmm.flags import GroupedGemmKey, Int8GemmKey

    ge = jnp.zeros((2,), jnp.int32)
    li = jnp.zeros((), jnp.int32)
    stkey = GroupedGemmKey(n_groups=2, m=256, n=128, k=256, bm=128,
                           dtype="bf16", transpose_b=True,
                           out_dtype="f32", layers=3)
    stfn = build_kernel(stkey, interpret=False)
    assert_lowerable(stfn, li, ge, jnp.zeros((256, 256), jnp.bfloat16),
                     jnp.zeros((3, 2, 128, 256), jnp.bfloat16))

    ikey = Int8GemmKey(m=32, n=256, k=128, has_bias=True,
                       unary_kind="gelu")
    ifn = build_kernel(ikey, interpret=False)
    assert_lowerable(ifn, jnp.zeros((32, 128), jnp.int8),
                     jnp.zeros((128, 256), jnp.int8),
                     jnp.zeros((32,), jnp.float32),
                     jnp.zeros((256,), jnp.float32),
                     jnp.zeros((256,), jnp.float32))

    pkey = DecodeAttnKey(batch=2, heads=4, seq=128, head_dim=64,
                         dtype="bf16", stacked=2, pack2=True)
    pfn = build_decode_attn(pkey, interpret=False)
    q = jnp.zeros((2, 2, 128), jnp.bfloat16)
    kc = jnp.zeros((2, 2, 2, 128, 128), jnp.bfloat16)
    assert_lowerable(lambda *a: pfn(*a, li=jnp.asarray(0, jnp.int32)),
                     q, kc, kc, jnp.asarray(5, jnp.int32))
