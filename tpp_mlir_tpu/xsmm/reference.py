"""Pure-jnp reference semantics for every kernel.

The reference differentially tests the xsmm path against naive scalar loops
(-linalg-to-loops, SURVEY.md section 4); here the "loops" role is played by
straight-line jnp, which XLA compiles without any of our blocking decisions.
Tests compare Pallas kernels against these with fpcmp-style tolerances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .flags import (BinaryKey, BlockedMatmulKey, BrgemmKey, ConvBrgemmKey,
                    UnaryKey)
from .kernels import _BINARY_FNS, _UNARY_FNS, _jdt


def _epi(res, d, key):
    if key.binary_kind:
        if d.ndim == 1:
            d = d.reshape(1, -1) if key.binary_bcast == "bcast_col" \
                else d.reshape(-1, 1)
        res = _BINARY_FNS[key.binary_kind](res, d.astype(res.dtype))
    if key.unary_kind:
        res = _UNARY_FNS[key.unary_kind](res)
    return res


def brgemm_reference(key: BrgemmKey):
    out_dtype = _jdt(key.out_dtype or key.dtype)

    def fn(a, b, c=None, d=None):
        if key.vnni:
            # B [batch, k/v, n, v] -> [batch, k, n]
            bb, kv, n, v = b.shape
            b = b.transpose(0, 1, 3, 2).reshape(bb, kv * v, n)
        if key.transpose_b:
            b = b.transpose(0, 2, 1)
        acc = jnp.einsum("bmk,bkn->mn", a.astype(jnp.float32),
                         b.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        if not key.beta0:
            acc = acc + c.astype(jnp.float32)
        acc = _epi(acc, d, key) if (key.binary_kind or key.unary_kind) else acc
        return acc.astype(out_dtype)
    return fn


def blocked_matmul_reference(key: BlockedMatmulKey):
    out_dtype = _jdt(key.out_dtype or key.dtype)

    def fn(a, b, c=None, d=None):
        if key.vnni:
            Nb, Kb, kv, nb, v = b.shape
            b = b.transpose(0, 1, 2, 4, 3).reshape(Nb, Kb, kv * v, nb)
        acc = jnp.einsum("MKmk,NKkn->MNmn", a.astype(jnp.float32),
                         b.astype(jnp.float32))
        if not key.beta0:
            acc = acc + c.astype(jnp.float32)
        if key.binary_kind:
            acc = _BINARY_FNS[key.binary_kind](acc, d[None, :, None, :].astype(acc.dtype))
        if key.unary_kind:
            acc = _UNARY_FNS[key.unary_kind](acc)
        return acc.astype(out_dtype)
    return fn


def conv_brgemm_reference(key: ConvBrgemmKey):
    out_dtype = _jdt(key.out_dtype or key.dtype)

    def fn(i, w, cacc=None, d=None):
        # i [N,Cb,H,W,c] -> NHWC; w [Kb,Cb,R,S,c,k] -> RSCK; XLA conv as oracle
        N, Cb, H, W, c = i.shape
        Kb, _, R, S, _, k = w.shape
        nhwc = i.transpose(0, 2, 3, 1, 4).reshape(N, H, W, Cb * c)
        rsck = w.transpose(2, 3, 1, 4, 0, 5).reshape(R, S, Cb * c, Kb * k)
        out = jax.lax.conv_general_dilated(
            nhwc.astype(jnp.float32), rsck.astype(jnp.float32),
            window_strides=(key.stride_h, key.stride_w), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        P, Q = key.P, key.Q
        out = out.reshape(N, P, Q, Kb, k).transpose(0, 3, 1, 2, 4)
        if not key.beta0:
            out = out + cacc.astype(jnp.float32)
        if key.binary_kind:
            out = _BINARY_FNS[key.binary_kind](
                out, d[None, :, None, None, :].astype(out.dtype))
        if key.unary_kind:
            out = _UNARY_FNS[key.unary_kind](out)
        return out.astype(out_dtype)
    return fn


def batch_matmul_reference(key):
    from .flags import BatchMatmulKey
    out_dtype = _jdt(key.out_dtype or key.dtype)

    def fn(a, b, c=None):
        a = a.astype(jnp.float32)
        if key.softmax_lhs:
            a = jax.nn.softmax(a, axis=-1)
        acc = jnp.einsum("bmk,bkn->bmn", a, b.astype(jnp.float32))
        if not key.beta0:
            acc = acc + c.astype(jnp.float32)
        return acc.astype(out_dtype)
    return fn


def chain_reference(key):
    from .flags import ChainKey
    from .kernels import _UNARY_FNS as UF, _jdt as jd

    out_dtype = jd(key.out_dtype or key.dtype)

    rdt = jd(key.dtype)

    def fn(x, *wb):
        L = len(key.dims) - 1
        h = x
        for _ in range(max(1, key.repeats)):
            h = h.astype(rdt)
            hh = h.astype(jnp.float32)
            idx = 0
            for li in range(L):
                w = wb[idx]; idx += 1
                z = jnp.dot(hh.astype(w.dtype), w,
                            preferred_element_type=jnp.float32)
                if key.has_bias:
                    z = z + wb[idx].reshape(1, -1).astype(jnp.float32)
                    idx += 1
                kind = key.unary_kind if li < L - 1 else key.last_unary
                hh = UF[kind or "identity"](z)
            h = hh
        return h.astype(out_dtype)
    return fn


def flash_mha_reference(key):
    out_dtype = _jdt(key.out_dtype or key.dtype)

    def core(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * key.scale
        if key.causal:
            S, Skv = s.shape[1], s.shape[2]
            mask = jnp.tril(jnp.ones((S, Skv), bool))
            s = jnp.where(mask[None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", p,
                          v.astype(jnp.float32)).astype(out_dtype)

    if not key.heads:
        return core

    H, D = key.heads, key.head_dim

    def fn(q, k, v):
        # token layout (B, S, H*D): split, run per-head, merge back
        def sp(x):
            B_, s_, _ = x.shape
            return x.reshape(B_, s_, H, D).transpose(0, 2, 1, 3).reshape(
                B_ * H, s_, D)
        o = core(sp(q), sp(k), sp(v))
        B_, S_ = q.shape[0], q.shape[1]
        return o.reshape(B_, H, S_, D).transpose(0, 2, 1, 3).reshape(
            B_, S_, H * D)

    if getattr(key, "qkv_packed", False):
        # packed keys take ONE (B, S, 3E) operand — mirror the kernel
        # call convention (_build_attn_xla_tokens) so reference-vs-kernel
        # differentials run on the same arguments (advisor r2 finding)
        E = H * D

        def packed(x, *_):
            return fn(x[..., :E], x[..., E:2 * E], x[..., 2 * E:])
        return packed
    return fn


def grouped_gemm_reference(key):
    """Per-block straight-line semantics of the grouped (ragged-batch)
    GEMM: O[i*bm:(i+1)*bm] = unary(A[i*bm:(i+1)*bm] @ B[ge[i]])."""
    out_dtype = _jdt(key.out_dtype or key.dtype)
    bm = key.bm

    def body(ge, a, b):
        nb = a.shape[0] // bm
        blocks = a.reshape(nb, bm, key.k).astype(jnp.float32)
        w = b.astype(jnp.float32)[ge]                 # (nb, k|n, n|k)
        eq = "gmk,gnk->gmn" if key.transpose_b else "gmk,gkn->gmn"
        acc = jnp.einsum(eq, blocks, w)
        if key.unary_kind:
            acc = _UNARY_FNS[key.unary_kind](acc)
        return acc.reshape(key.m, key.n).astype(out_dtype)

    if key.layers:
        def fn(li, ge, a, b):
            li = jnp.asarray(li, jnp.int32).reshape(())
            return body(ge, a, jax.lax.dynamic_index_in_dim(
                b, li, axis=0, keepdims=False))
        return fn
    return body


def grouped_wgrad_reference(key):
    """Straight-line semantics of the grouped weight gradient:
    dW[g] = sum_{i: ge[i]==g} A[i].T @ dY[i] (A arrives as (k, m))."""
    bm = key.bm

    def fn(ge, xt, dy):
        nb = key.m // bm
        xb = xt.astype(jnp.float32).reshape(key.k, nb, bm)
        yb = dy.astype(jnp.float32).reshape(nb, bm, key.n)
        db = jnp.einsum("kim,imn->ikn", xb, yb)       # per-block wgrad
        oh = (ge[:, None] == jnp.arange(key.n_groups)).astype(jnp.float32)
        return jnp.einsum("ig,ikn->gkn", oh, db)
    return fn


def int8_gemm_reference(key):
    """Exact int32-accumulate semantics of the int8 compute GEMM."""
    out_dtype = _jdt(key.out_dtype)

    def fn(xq, wq, xscale, wscale, bias=None):
        acc = jnp.dot(xq.astype(jnp.int32), wq.astype(jnp.int32))
        y = (acc.astype(jnp.float32)
             * xscale.reshape(key.m, 1).astype(jnp.float32)
             * wscale.reshape(1, key.n).astype(jnp.float32))
        if key.has_bias:
            y = y + bias.reshape(1, key.n).astype(jnp.float32)
        if key.unary_kind:
            y = _UNARY_FNS[key.unary_kind](y)
        return y.astype(out_dtype)
    return fn


def reference_kernel(key):
    from .kernels import _build_binary, _build_unary
    from .flags import GroupedGemmKey, GroupedWgradKey, Int8GemmKey

    if isinstance(key, GroupedGemmKey):
        return grouped_gemm_reference(key)
    if isinstance(key, GroupedWgradKey):
        return grouped_wgrad_reference(key)
    if isinstance(key, Int8GemmKey):
        return int8_gemm_reference(key)
    if isinstance(key, BrgemmKey):
        return brgemm_reference(key)
    if isinstance(key, BlockedMatmulKey):
        return blocked_matmul_reference(key)
    if isinstance(key, ConvBrgemmKey):
        return conv_brgemm_reference(key)
    from .flags import BatchMatmulKey, ChainKey, ConvNhwcKey, FlashMhaKey
    if isinstance(key, ConvNhwcKey):
        # interpret-mode xla strategy IS the reference semantics: exact
        # f32 lax conv + epilogue, no Pallas
        from .kernels import _build_conv_nhwc_xla
        from dataclasses import replace
        return _build_conv_nhwc_xla(replace(key, strategy="xla"), True)
    if isinstance(key, ChainKey):
        return chain_reference(key)
    if isinstance(key, BatchMatmulKey):
        return batch_matmul_reference(key)
    if isinstance(key, FlashMhaKey):
        return flash_mha_reference(key)
    if isinstance(key, (UnaryKey, BinaryKey)):
        # eltwise kernels are already jnp closures; reference == kernel
        return (_build_unary if isinstance(key, UnaryKey)
                else _build_binary)(key, True)
    from .flags import LayerNormKey
    if isinstance(key, LayerNormKey):
        import jax
        import jax.numpy as jnp

        def ln(x, gamma=None, beta=None):
            x = x.astype(jnp.float32)
            mean = jnp.mean(x, axis=-1, keepdims=True)
            d = x - mean
            var = jnp.mean(d * d, axis=-1, keepdims=True)
            y = d * jax.lax.rsqrt(var + key.eps)
            if key.affine:
                y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
            return y.astype(jnp.dtype(
                {"f32": "float32", "bf16": "bfloat16",
                 "f16": "float16"}[key.out_dtype or key.dtype]))
        return ln
    raise TypeError(key)
