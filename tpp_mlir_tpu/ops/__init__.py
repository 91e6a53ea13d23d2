"""Public functional op API over the kernel cache.

For users who want the TPP kernels directly as JAX ops, without going through
the IR pipeline (the analogue of calling the reference runtime's C ABI
directly). All ops are jit-compatible: the dispatch resolves at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..xsmm.cache import global_cache
from ..xsmm.flags import BlockedMatmulKey, BrgemmKey, ConvBrgemmKey


def _dt(x) -> str:
    return {"float32": "f32", "bfloat16": "bf16", "float16": "f16"}[
        jnp.dtype(x.dtype).name]


def gemm(a, b, c=None, *, out_dtype=None, transpose_b=False,
         interpret=None):
    """C(+)= A @ B on the MXU with f32 accumulation."""
    m, k = a.shape
    n = b.shape[0] if transpose_b else b.shape[1]
    key = BrgemmKey(batch=1, m=m, n=n, k=k, dtype=_dt(a),
                    out_dtype=out_dtype, beta0=c is None,
                    transpose_b=transpose_b)
    fn = global_cache().dispatch(key, interpret)
    return fn(a[None], b[None], c)


def brgemm(a, b, c=None, *, out_dtype=None, interpret=None):
    """Batch-reduce GEMM: C(+)= sum_i A[i] @ B[i]."""
    bt, m, k = a.shape
    n = b.shape[-1]
    key = BrgemmKey(batch=bt, m=m, n=n, k=k, dtype=_dt(a),
                    out_dtype=out_dtype, beta0=c is None)
    fn = global_cache().dispatch(key, interpret)
    return fn(a, b, c)


def fused_mlp_layer(x, w, bias=None, *, activation="relu", out_dtype=None,
                    interpret=None):
    """One MLP layer as one kernel: activation(x @ w + bias) — the
    xsmm.fused_brgemm surface (bias on VPU, matmul on MXU, single output
    write)."""
    m, k = x.shape
    n = w.shape[1]
    key = BrgemmKey(batch=1, m=m, n=n, k=k, dtype=_dt(x),
                    out_dtype=out_dtype, beta0=True,
                    binary_kind="add" if bias is not None else None,
                    binary_bcast="bcast_col",
                    unary_kind=activation)
    fn = global_cache().dispatch(key, interpret)
    return fn(x[None], w[None], None, bias)


def blocked_matmul(a, b, c=None, *, vnni=0, bias=None, activation=None,
                   out_dtype=None, interpret=None):
    """Packed-layout matmul C[Mb,Nb,mb,nb] += A[Mb,Kb,mb,kb]*B[Nb,Kb,kb,nb]."""
    Mb, Kb, mb, kb = a.shape
    Nb, nb = b.shape[0], b.shape[-2] if vnni else b.shape[-1]
    key = BlockedMatmulKey(Mb=Mb, Nb=Nb, Kb=Kb, mb=mb, nb=nb, kb=kb,
                           dtype=_dt(a), out_dtype=out_dtype, beta0=c is None,
                           vnni=vnni,
                           binary_kind="add" if bias is not None else None,
                           unary_kind=activation)
    fn = global_cache().dispatch(key, interpret)
    return fn(a, b, c, bias)


def conv2d_brgemm(i, w, c=None, *, bias=None, activation=None,
                  strides=(1, 1), out_dtype=None, interpret=None):
    """Channel-blocked conv as BRGEMM: I[N,Cb,H,W,c] * W[Kb,Cb,R,S,c,k]."""
    N, Cb, H, Wd, cc = i.shape
    Kb, _, R, S, _, k = w.shape
    key = ConvBrgemmKey(N=N, H=H, W=Wd, Cb=Cb, c=cc, Kb=Kb, k=k, R=R, S=S,
                        stride_h=strides[0], stride_w=strides[1],
                        dtype=_dt(i), out_dtype=out_dtype, beta0=c is None,
                        binary_kind="add" if bias is not None else None,
                        unary_kind=activation)
    fn = global_cache().dispatch(key, interpret)
    return fn(i, w, c, bias)


def relu(x):
    return jnp.maximum(x, 0)


def vnni_pack(w, vf: int = 2):
    """[.., K, N] -> [.., K/vf, N, vf] (reference xsmm unary VNNI2)."""
    *lead, K, N = w.shape
    return jnp.moveaxis(w.reshape(*lead, K // vf, vf, N), -2, -1)
