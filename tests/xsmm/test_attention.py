"""Flash-attention kernel + attention-fusion pass tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.models import mha
from tpp_mlir_tpu.passes import run_pipeline
from tpp_mlir_tpu.runtime import compile as tpp_compile
from tpp_mlir_tpu.xsmm import build_kernel, reference_kernel
from tpp_mlir_tpu.xsmm.flags import FlashMhaKey


def rng(*shape, dtype=jnp.float32, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape,
                             jnp.float32).astype(dtype)


def test_flash_kernel_matches_softmax():
    key = FlashMhaKey(batch=2, seq=64, seq_kv=64, head_dim=32,
                      bq=32, bk=32, scale=0.125)
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q, k, v = rng(2, 64, 32), rng(2, 64, 32, seed=1), rng(2, 64, 32, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-5, rtol=1e-5)


def test_flash_kernel_causal():
    key = FlashMhaKey(batch=1, seq=64, seq_kv=64, head_dim=32,
                      bq=32, bk=32, causal=True)
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q, k, v = rng(1, 64, 32), rng(1, 64, 32, seed=1), rng(1, 64, 32, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-5, rtol=1e-5)


def test_flash_kernel_bf16():
    key = FlashMhaKey(batch=2, seq=128, seq_kv=128, head_dim=64,
                      dtype="bf16", out_dtype="f32")
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q = rng(2, 128, 64, dtype=jnp.bfloat16)
    k = rng(2, 128, 64, seed=1, dtype=jnp.bfloat16)
    v = rng(2, 128, 64, seed=2, dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=3e-2, rtol=3e-2)


def test_attention_fusion_from_mha_model():
    """The MHA benchmark model lowers to one xsmm.attention kernel."""
    m = mha.build_mha(batch=1, heads=2, seq=64, head_dim=32)
    ref = tpp_compile(m, jit=False)
    args = tuple(rng(2, 64, 32, seed=i) for i in range(3))
    want = ref(*args)[0]

    run_pipeline(m, "default-tpp-passes")
    s = str(m)
    assert "xsmm.attention" in s
    assert "tl.softmax" not in s and "xsmm.batch_gemm" not in s
    got = tpp_compile(m, jit=False)(*args)[0]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-4, rtol=1e-4)


def test_softmax_v_fusion():
    """softmax(s) @ V fuses into one batched kernel (the reference's
    out-softmax-times-value benchmark kernel)."""
    m = mha.build_softmax_v(batch=2, heads=2, seq=32, head_dim=32)
    ref = tpp_compile(m, jit=False)
    s = rng(4, 32, 32, seed=0)
    v = rng(4, 32, 32, seed=1)
    want = ref(s, v)[0]
    run_pipeline(m, "default-tpp-passes")
    low = str(m)
    assert "softmax_lhs = true" in low
    assert "tl.softmax" not in low and "tl.exp" not in low
    got = tpp_compile(m, jit=False)(s, v)[0]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-5, rtol=1e-5)


def test_flash_qblock_whole_kv_long_seq():
    """s=2048 takes the whole-KV-resident q-blocked variant (no online
    softmax); differential vs the plain softmax reference."""
    from tpp_mlir_tpu.xsmm.kernels import _build_flash_mha_qblock

    key = FlashMhaKey(batch=1, seq=2048, seq_kv=2048, head_dim=64,
                      scale=0.125)
    assert _build_flash_mha_qblock(key, True) is not None  # fits VMEM
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q = rng(1, 2048, 64)
    k = rng(1, 2048, 64, seed=1)
    v = rng(1, 2048, 64, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_flash_qblock_causal():
    from tpp_mlir_tpu.xsmm.kernels import _build_flash_mha_qblock

    key = FlashMhaKey(batch=1, seq=2048, seq_kv=2048, head_dim=64,
                      causal=True)
    kfn = _build_flash_mha_qblock(key, True)
    assert kfn is not None
    rfn = reference_kernel(key)
    q = rng(1, 2048, 64)
    k = rng(1, 2048, 64, seed=1)
    v = rng(1, 2048, 64, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_flash_blocked_causal_block_skip():
    """Explicit bq/bk force the blocked online-softmax path; causal results
    must be identical with the above-diagonal kv blocks skipped."""
    key = FlashMhaKey(batch=1, seq=256, seq_kv=256, head_dim=32,
                      bq=64, bk=64, causal=True)
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q, k, v = rng(1, 256, 32), rng(1, 256, 32, seed=1), rng(1, 256, 32, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-5, rtol=1e-5)

def test_flash_strategies_agree():
    """grouped / qblock / blocked are selectable via FlashMhaKey.strategy
    and all match the plain softmax reference on one input."""
    base = dict(batch=2, seq=512, seq_kv=512, head_dim=64, scale=0.125)
    q, k, v = rng(2, 512, 64), rng(2, 512, 64, seed=1), rng(2, 512, 64, seed=2)
    rfn = reference_kernel(FlashMhaKey(**base))
    want = np.asarray(rfn(q, k, v), np.float32)
    for strat in ("grouped", "qblock", "blocked"):
        kfn = build_kernel(FlashMhaKey(**base, strategy=strat),
                           interpret=True)
        np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                                   want, atol=1e-4, rtol=1e-4,
                                   err_msg=strat)


def test_flash_qblock_d128():
    """head_dim=128 fills the MXU contraction (the D=64 rows cap at ~50%);
    the qblock variant must handle it."""
    key = FlashMhaKey(batch=1, seq=1024, seq_kv=1024, head_dim=128,
                      scale=0.088, strategy="qblock")
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q = rng(1, 1024, 128)
    k = rng(1, 1024, 128, seed=1)
    v = rng(1, 1024, 128, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_flash_causal_s1024_routes_to_chunk_skip():
    """auto + causal + s>=512 routes to the kv-chunk-skipping qblock variant
    (several q blocks, so above-diagonal chunks are skipped)."""
    key = FlashMhaKey(batch=1, seq=1024, seq_kv=1024, head_dim=64,
                      causal=True)
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q = rng(1, 1024, 64)
    k = rng(1, 1024, 64, seed=1)
    v = rng(1, 1024, 64, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-4, rtol=1e-4)


def _exec(m, args):
    return np.asarray(tpp_compile(m, jit=False)(*args)[0], np.float32)


def test_attention_fusion_scale_after_softmax():
    """(softmax(QKt)*c) @ V fuses to attention * c (r2 verdict: the pass
    bailed on scale-after-softmax)."""
    from tpp_mlir_tpu.ir import parse_module
    text = """func @entry(%q: tensor<2x32x32xf32>, %k: tensor<2x32x32xf32>, %v: tensor<2x32x32xf32>) {
  %kt = tl.transpose %k {perm = [0, 2, 1]} : tensor<2x32x32xf32>
  %z = tl.constant {init = "zero"} : tensor<2x32x32xf32>
  %s = tl.batch_matmul %q, %kt, %z : tensor<2x32x32xf32>
  %p = tl.softmax %s {axis = 2} : tensor<2x32x32xf32>
  %c = tl.constant {init = "const", value = 0.5} : tensor<1xf32>
  %ps = tl.mul %p, %c : tensor<2x32x32xf32>
  %z2 = tl.constant {init = "zero"} : tensor<2x32x32xf32>
  %o = tl.batch_matmul %ps, %v, %z2 : tensor<2x32x32xf32>
  return %o : tensor<2x32x32xf32>
}
"""
    m = parse_module(text)
    args = tuple(rng(2, 32, 32, seed=i) for i in range(3))
    want = _exec(parse_module(text), args)
    run_pipeline(m, "default-tpp-passes")
    s = str(m)
    assert "xsmm.attention" in s and "tl.softmax" not in s
    np.testing.assert_allclose(_exec(m, args), want, atol=1e-5, rtol=1e-5)


def test_attention_fusion_q_side_scale_and_accumulator():
    """scale on Q before QKt folds into the attention scale; a non-zero
    output accumulator becomes a post-add."""
    from tpp_mlir_tpu.ir import parse_module
    text = """func @entry(%q: tensor<2x32x32xf32>, %k: tensor<2x32x32xf32>, %v: tensor<2x32x32xf32>, %acc: tensor<2x32x32xf32>) {
  %c = tl.constant {init = "const", value = 0.176776} : tensor<1xf32>
  %qs = tl.mul %q, %c : tensor<2x32x32xf32>
  %kt = tl.transpose %k {perm = [0, 2, 1]} : tensor<2x32x32xf32>
  %z = tl.constant {init = "zero"} : tensor<2x32x32xf32>
  %s = tl.batch_matmul %qs, %kt, %z : tensor<2x32x32xf32>
  %p = tl.softmax %s {axis = 2} : tensor<2x32x32xf32>
  %o = tl.batch_matmul %p, %v, %acc : tensor<2x32x32xf32>
  return %o : tensor<2x32x32xf32>
}
"""
    m = parse_module(text)
    args = tuple(rng(2, 32, 32, seed=i) for i in range(4))
    want = _exec(parse_module(text), args)
    run_pipeline(m, "default-tpp-passes")
    s = str(m)
    assert "xsmm.attention" in s and "tl.softmax" not in s
    assert "scale = 0.176776" in s
    np.testing.assert_allclose(_exec(m, args), want, atol=1e-5, rtol=1e-5)


def test_flash_bench_repeats_matches_double_application():
    """FlashMhaKey.repeats: the in-kernel warm-KV timed region; repeats=2
    must equal attn(attn(q)) with the same K/V."""
    base = FlashMhaKey(batch=2, seq=256, seq_kv=256, head_dim=64,
                      scale=0.125)
    q, k, v = rng(2, 256, 64), rng(2, 256, 64, seed=1), rng(2, 256, 64, seed=2)
    one = build_kernel(base, interpret=True)
    want = np.asarray(one(one(q, k, v), k, v), np.float32)
    import dataclasses
    twice = build_kernel(dataclasses.replace(base, repeats=2),
                         interpret=True)
    np.testing.assert_allclose(np.asarray(twice(q, k, v), np.float32),
                               want, atol=1e-4, rtol=1e-4)


def test_extract_bench_kernel_attention():
    """A lowered single-attention program qualifies for the warm perf.bench
    extraction (r2 verdict: extraction was MLP/fc-only)."""
    from tpp_mlir_tpu.runtime.executor import extract_bench_kernel

    m = mha.build_mha(batch=2, heads=2, seq=128, head_dim=32, fused=True,
                      scale=0.125)
    run_pipeline(m, "default-tpp-passes")
    hit = extract_bench_kernel(m)
    assert hit is not None
    key, get_operands = hit
    assert isinstance(key, FlashMhaKey)
    args = tuple(rng(4, 128, 32, seed=i) for i in range(3))
    ops = get_operands(args)
    assert len(ops) == 3 and all(o.shape == (4, 128, 32) for o in ops)


def test_mha_block_full_graph_lowers_and_matches():
    """The FULL MHA block (projections + head split + fused core + output
    projection — reference fp32-mha-tensorflow-seq-len-32.mlir role) lowers
    to gemm+attention invokes and matches reference semantics."""
    m = mha.build_mha_block(batch=2, heads=4, seq=16, head_dim=32)
    x = rng(32, 128, seed=3)
    want = np.asarray(tpp_compile(m, jit=False)(x)[0], np.float32)
    m2 = mha.build_mha_block(batch=2, heads=4, seq=16, head_dim=32)
    run_pipeline(m2, "default-tpp-passes")
    s = str(m2)
    assert "xsmm.attention" in s and "tl.softmax" not in s
    assert "xsmm.gemm" in s
    got = np.asarray(tpp_compile(m2, jit=False)(x)[0], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_flash_tokens_layout_lane_sliced_heads():
    """Token-layout attention (B, S, H*D) with heads selected as 128-wide
    lane column blocks (2 heads per program at D=64) — zero head-split
    relayout. Differential vs the split-merge reference."""
    key = FlashMhaKey(batch=2, seq=128, seq_kv=128, head_dim=64, heads=8,
                      scale=0.125)
    from tpp_mlir_tpu.xsmm.kernels import _build_flash_mha_tokens
    assert _build_flash_mha_tokens(key, True) is not None
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q = rng(2, 128, 512)
    k = rng(2, 128, 512, seed=1)
    v = rng(2, 128, 512, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_flash_tokens_layout_causal():
    key = FlashMhaKey(batch=1, seq=256, seq_kv=256, head_dim=64, heads=4,
                      scale=0.125, causal=True)
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q = rng(1, 256, 256)
    k = rng(1, 256, 256, seed=1)
    v = rng(1, 256, 256, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_flash_packed_reference_differential():
    """qkv_packed keys: reference mirrors the kernel's single-operand
    (B, S, 3E) call convention, so kernel-vs-reference differentials run
    on the same argument (advisor r2 finding). D=128 exercises the Pallas
    tokens kernel; the reference slices [Q | K | V] column groups."""
    key = FlashMhaKey(batch=2, seq=256, seq_kv=256, head_dim=128, heads=2,
                      scale=128 ** -0.5, qkv_packed=True)
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    x = rng(2, 256, 3 * 256)
    # executor call convention for packed invokes: fn(x, x, x)
    np.testing.assert_allclose(np.asarray(kfn(x, x, x), np.float32),
                               np.asarray(rfn(x, x, x), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_flash_packed_forced_tokens_small_head_falls_back():
    """strategy='tokens' at D=64/H=1 packed: the W_ == E lane escape is
    split-operand-only (packed last dim is 3E) — the tokens builder must
    refuse (return None) rather than emit a Mosaic-illegal block, and the
    dispatch must still produce a working kernel via the slice fallback."""
    from tpp_mlir_tpu.xsmm.kernels import _build_flash_mha_tokens
    key = FlashMhaKey(batch=1, seq=128, seq_kv=128, head_dim=64, heads=1,
                      scale=0.125, qkv_packed=True, strategy="tokens")
    assert _build_flash_mha_tokens(key, True) is None
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    x = rng(1, 128, 3 * 64)
    np.testing.assert_allclose(np.asarray(kfn(x), np.float32),
                               np.asarray(rfn(x), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_torch_mha_import_emits_token_layout():
    """The torch MultiheadAttention import emits token-layout tl.attention
    (heads attr) with NO transposes around the core."""
    import torch
    import torch.nn as nn

    from tpp_mlir_tpu.frontend import import_torch_fx

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = nn.MultiheadAttention(64, 4, batch_first=True)

        def forward(self, x):
            a, _ = self.attn(x, x, x, need_weights=False)
            return a

    m = import_torch_fx(M().eval(), (2, 16, 64))
    s = str(m)
    assert "heads = 4" in s
    assert "tl.transpose" not in s


def test_tokens_kernel_causal_d128():
    """Causal masking through the PHASE-SPLIT token-layout kernel at D=128
    (the Pallas path — D<128 delegates to XLA): mask applies per q-block
    at its row offset; differential vs dense reference."""
    import numpy as np

    from tpp_mlir_tpu.xsmm.cache import _GLOBAL
    from tpp_mlir_tpu.xsmm.flags import FlashMhaKey

    B, S, D, H = 2, 256, 128, 2
    E = H * D
    key = FlashMhaKey(batch=B, seq=S, seq_kv=S, head_dim=D, dtype="f32",
                      scale=D ** -0.5, heads=H, causal=True,
                      strategy="tokens")
    fn = _GLOBAL.dispatch(key, interpret=True)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, E).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, E).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, E).astype(np.float32))
    got = np.asarray(fn(q, k, v))

    qh = np.asarray(q).reshape(B, S, H, D).transpose(0, 2, 1, 3)
    kh = np.asarray(k).reshape(B, S, H, D).transpose(0, 2, 1, 3)
    vh = np.asarray(v).reshape(B, S, H, D).transpose(0, 2, 1, 3)
    s = np.einsum("bhqd,bhkd->bhqk", qh, kh) * (D ** -0.5)
    mask = np.tril(np.ones((S, S), bool))
    s = np.where(mask[None, None], s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, vh).transpose(0, 2, 1, 3) \
        .reshape(B, S, E)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_flash_causal_twocall_differential():
    """strategy='twocall' (band_lo + band_hi + dense-rectangle with LSE
    merge) matches the dense causal reference — low rows come straight
    from band_lo, high rows from the stats merge."""
    key = FlashMhaKey(batch=2, seq=512, seq_kv=512, head_dim=64,
                      scale=0.125, causal=True, strategy="twocall")
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q = rng(2, 512, 64)
    k = rng(2, 512, 64, seed=1)
    v = rng(2, 512, 64, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_flash_causal_twocall_refuses_noncausal():
    import pytest as _pytest
    key = FlashMhaKey(batch=1, seq=512, seq_kv=512, head_dim=64,
                      scale=0.125, causal=False, strategy="twocall")
    with _pytest.raises(ValueError):
        build_kernel(key, interpret=True)


def test_flash_causal_auto_routes_twocall_at_2048():
    """auto + causal + s>=2048 at D<128 routes to the fold2 split
    (measured r5 at s2048 D64 bf16: fold2 23.6 / twocall 23.5 / qblock
    17.6%% of triangle roof — tie with one fewer call; twocall is the
    fallback); numerics must match the dense causal reference through
    the auto path."""
    key = FlashMhaKey(batch=1, seq=2048, seq_kv=2048, head_dim=64,
                      scale=0.125, causal=True)
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q = rng(1, 2048, 64)
    k = rng(1, 2048, 64, seed=1)
    v = rng(1, 2048, 64, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_flash_block_overrides_must_divide():
    """Regression: the blocked path has no tail masking — a user bq/bk
    override that doesn't divide seq/seq_kv would let padded KV columns
    add unmasked mass to the softmax denominator. Reject loudly."""
    import pytest

    from tpp_mlir_tpu.xsmm import build_kernel
    from tpp_mlir_tpu.xsmm.flags import FlashMhaKey

    with pytest.raises(ValueError, match="must divide"):
        build_kernel(FlashMhaKey(batch=2, seq=256, seq_kv=384,
                                 head_dim=64, strategy="blocked", bk=256),
                     interpret=True)
    with pytest.raises(ValueError, match="must divide"):
        build_kernel(FlashMhaKey(batch=2, seq=384, seq_kv=256,
                                 head_dim=64, strategy="blocked", bq=256),
                     interpret=True)


def test_flash_causal_auto_routes_fold2_at_1024_d128():
    """auto + causal + S>=1024 + D>=128 routes to the 2-call fold2
    split (measured r5: 50.6/54.3/46.8%% of triangle roof at s1024/
    1536/2048 D=128 bf16 — above qblock AND twocall at every point);
    numerics must match the dense causal reference through the auto
    path. D=64 routes fold2 from s2048 (previous test)."""
    key = FlashMhaKey(batch=1, seq=1024, seq_kv=1024, head_dim=128,
                      scale=0.125, causal=True)
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q = rng(1, 1024, 128)
    k = rng(1, 1024, 128, seed=1)
    v = rng(1, 1024, 128, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_flash_causal_fold2_differential():
    """strategy='twocall2' (band folded into the rectangle: lo causal
    half + hi causal-over-FULL-KV, no LSE merge) matches the dense
    causal reference."""
    key = FlashMhaKey(batch=2, seq=512, seq_kv=512, head_dim=64,
                      scale=0.125, causal=True, strategy="twocall2")
    kfn = build_kernel(key, interpret=True)
    rfn = reference_kernel(key)
    q = rng(2, 512, 64)
    k = rng(2, 512, 64, seed=1)
    v = rng(2, 512, 64, seed=2)
    np.testing.assert_allclose(np.asarray(kfn(q, k, v), np.float32),
                               np.asarray(rfn(q, k, v), np.float32),
                               atol=1e-4, rtol=1e-4)


def test_flash_heads_route_long_seq_d_lt_128():
    """r7 delegation: causal token-layout attention at D<128, s>=1024
    auto-routes to the flash-train FORWARD (no per-head lane slices, no
    (B,H,S,S) HBM scores — 1.28x the token-layout kernel on hardware,
    flash_infer_r7.json). Differential vs the token-layout softmax
    reference, plus the forced strategy="flash_heads" spelling."""
    from tpp_mlir_tpu.xsmm.kernels import _build_attn_flash_heads

    B, S, D, H = 1, 1024, 16, 2
    E = H * D
    base = dict(batch=B, seq=S, seq_kv=S, head_dim=D, dtype="f32",
                scale=D ** -0.5, heads=H, causal=True)
    auto = FlashMhaKey(**base)
    assert _build_attn_flash_heads(auto, True) is not None  # fits VMEM
    q, k, v = (rng(B, S, E, seed=i) for i in range(3))
    want = np.asarray(reference_kernel(auto)(q, k, v), np.float32)
    for key in (auto, FlashMhaKey(**base, strategy="flash_heads")):
        got = np.asarray(build_kernel(key, interpret=True)(q, k, v),
                         np.float32)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4,
                                   err_msg=key.strategy)
    # the packed spelling stays on the tokens kernel in auto mode
    # (measured: slicing the packed operand into the flash kernel costs
    # the r5b pallas-input copy and loses in-pipeline) but the forced
    # strategy must still work for A/Bs
    packed = FlashMhaKey(**base, qkv_packed=True,
                         strategy="flash_heads")
    x = jnp.concatenate([q, k, v], axis=-1)
    got = np.asarray(build_kernel(packed, interpret=True)(x), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4,
                               err_msg="qkv_packed")
