"""Flash-attention TRAINING kernels: fwd (+LSE) and bwd as Pallas
whole-slab programs, wrapped in a custom VJP.

Why this exists (r7 train bisect, train_bisect_r7.json): the dense GPT
train step at B8 s512 spends 15.3 ms of 44.5 ms in composed-attention
fwd+bwd — 34% of the step on 7.5% of the flops — because XLA's AD of
einsum→mask→softmax→einsum materializes the (B, H, S, S) f32 scores
and softmax in the forward, saves them as residuals, and runs 4+ more
full-matrix HBM round trips in the backward. The flash formulation
keeps every (S, S) intermediate in VMEM: the forward saves only
(q, k, v, lse) — O(S·D) per head — and the backward RECOMPUTES the
softmax tile-free from the saved LSE.

Design (constraints per CLAUDE.md):
- grid (B, H), whole (S, D) slabs per program: one large dot per
  operand pair (Mosaic wants one big dot, not guarded chunks — the r3
  causal lesson), causal runs masked-full;
- exp2-domain softmax with scale·log2e folded into the QK product
  (+4-11 roofline points, r3); the saved LSE is BASE-2 with the scale
  folded — a private convention between fwd and bwd (both kernels
  here), never user-facing;
- the backward's heavy dots (dV = Pᵀ·dO, dQ = dS·K, dK = dSᵀ·Q)
  contract over S — full 128-lane MXU contractions even at D=64 where
  the QK/dP dots half-fill (the documented D=64 ceiling applies only
  to the two D-contractions);
- dot_general dimension numbers express every transpose (no value
  transposes — shape casts don't lower);
- f32 accumulation everywhere; bf16 inputs feed the MXU directly and
  the recomputed P/dS cast to bf16 before their dots (the
  default-precision mirror, kernels.py _mxu_input_dtype); interpret
  mode with f32 inputs stays f32-exact for CPU differential tests.

Reference analogue: none (the reference has no training); the design
follows the public flash-attention backward recurrence (Dao et al.),
re-shaped for whole-slab v5e programs.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LOG2E = math.log2(math.e)


@dataclass(frozen=True)
class FlashTrainKey:
    """Key for the training-attention kernel pair. Shapes are the
    heads-split (B, H, S, D) layout; scale folds into the kernels."""

    batch: int
    heads: int
    seq: int
    head_dim: int
    dtype: str = "bf16"          # operand dtype: f32 | bf16
    causal: bool = True
    scale: float = 1.0
    # heads per program: grid (B, H/hpp) with an in-kernel head loop
    # (the decode_attn pattern). hpp=1 measured 11 ms/step of pure
    # per-program overhead at the GPT-2 geometry — 2,304 tiny programs
    # per train step; bigger programs amortize the fixed cost. Pick
    # with flash_train_hpp() (largest divisor whose slabs fit VMEM).
    hpp: int = 1


def flash_train_fits(key: FlashTrainKey, vmem_bytes: int) -> bool:
    """VMEM gate for the WHOLE-SLAB form. The backward holds up to
    ~3 live (S, S) f32 values (P, dP, dS) plus 7 lane-padded (S, D)
    head-slabs per program double-buffered; lane padding is real
    (D pads to 128)."""
    S = key.seq
    dsz = 2 if key.dtype in ("bf16", "f16") else 4
    dpad = -(-key.head_dim // 128) * 128
    blocks = 7 * key.hpp * S * dpad * dsz * 2   # per-head slabs, 2x
    values = 3 * S * S * 4                   # P, dP, dS live f32
    return blocks + values + (1 << 20) < int(vmem_bytes * 0.9)


def flash_train_hpp(key: FlashTrainKey, vmem_bytes: int) -> int:
    """Largest head count per program (divisor of H) whose backward
    slabs fit VMEM."""
    import dataclasses

    best = 0
    for hpp in range(1, key.heads + 1):
        if key.heads % hpp:
            continue
        if flash_train_fits(dataclasses.replace(key, hpp=hpp),
                            vmem_bytes):
            best = hpp
    return best


def flash_fwd_fits(key: FlashTrainKey, vmem_bytes: int) -> bool:
    """FORWARD-only gate (the r7 inference-prefill route): the fwd holds
    q/k/v/o slabs double-buffered plus ~2 live (S, S) f32 values (the
    logits and the exp2 probabilities) — much lighter than the backward
    (flash_train_fits). Measured fitting at bf16 s1024 d64 hpp=1 on v5e
    where the backward gate refuses (flash_infer_r7.json ran it)."""
    S = key.seq
    dsz = 2 if key.dtype in ("bf16", "f16") else 4
    dpad = -(-key.head_dim // 128) * 128
    blocks = 4 * key.hpp * S * dpad * dsz * 2
    values = 2 * S * S * 4
    return blocks + values + (1 << 20) < int(vmem_bytes * 0.9)


def flash_fwd_hpp(key: FlashTrainKey, vmem_bytes: int) -> int:
    """Largest head count per program whose FORWARD slabs fit VMEM."""
    import dataclasses

    best = 0
    for hpp in range(1, key.heads + 1):
        if key.heads % hpp:
            continue
        if flash_fwd_fits(dataclasses.replace(key, hpp=hpp), vmem_bytes):
            best = hpp
    return best


def _masked_logits2(q, k, key: FlashTrainKey):
    """(S, S) QK product in the base-2 exponent domain, causal-masked.
    Operands stay in their storage dtype (bf16 feeds the MXU); f32
    accumulation via preferred_element_type."""
    S = key.seq
    s2 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (key.scale * LOG2E)
    if key.causal:
        ri = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        s2 = jnp.where(ci <= ri, s2, -1e30)
    return s2


def _pv_dtype(key: FlashTrainKey):
    return jnp.bfloat16 if key.dtype in ("bf16", "f16") else jnp.float32


@functools.lru_cache(maxsize=None)
def build_flash_train_fwd(key: FlashTrainKey, interpret: bool):
    """`fn(q, k, v) -> (o f32, lse2 f32)` over (B, H, S, D) operands;
    lse2 is the base-2 log-sum-exp with the scale folded (private —
    consumed only by the bwd kernel below)."""
    B, H, S, D = key.batch, key.heads, key.seq, key.head_dim
    hpp = key.hpp
    assert H % hpp == 0, (H, hpp)
    pv = _pv_dtype(key)
    odt = jnp.bfloat16 if key.dtype in ("bf16", "f16") else jnp.float32

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
        for h in range(hpp):
            q, k, v = q_ref[0, h], k_ref[0, h], v_ref[0, h]
            s2 = _masked_logits2(q, k, key)
            m2 = jnp.max(s2, axis=1, keepdims=True)
            p = jnp.exp2(s2 - m2)
            l = jnp.sum(p, axis=1, keepdims=True)       # (S, 1) f32
            o = jax.lax.dot_general(
                p.astype(pv), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / l
            o_ref[0, h] = o.astype(odt)
            # (S, 1) with a trailing unit dim: a (.., S) block fails
            # the Mosaic last-two-dims rule on hardware; (.., S, 1)
            # passes (S 8-div, 1 == array dim) — the decode_attn
            # scale-column trick
            lse_ref[0, h] = m2 + jnp.log(l) * LOG2E

    blk = lambda b, h: (b, h, 0, 0)
    call = pl.pallas_call(
        kernel, grid=(B, H // hpp), interpret=interpret,
        in_specs=[pl.BlockSpec((1, hpp, S, D), blk)] * 3,
        out_specs=[pl.BlockSpec((1, hpp, S, D), blk),
                   pl.BlockSpec((1, hpp, S, 1), blk)],
        out_shape=[jax.ShapeDtypeStruct((B, H, S, D), odt),
                   jax.ShapeDtypeStruct((B, H, S, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * S * D,
            bytes_accessed=(3 + 2) * B * H * S * D * 4,
            transcendentals=B * H * S * S),
    )
    return call


@functools.lru_cache(maxsize=None)
def build_flash_train_bwd(key: FlashTrainKey, interpret: bool):
    """`fn(q, k, v, do, lse2, delta) -> (dq, dk, dv)` (all f32 outs).
    delta = rowsum(do * o), computed outside (one fused XLA pass).
    P is recomputed from (q, k, lse2); dS = P ∘ (dP - delta) · scale.
    The dV/dQ/dK dots contract over S (full-lane MXU)."""
    B, H, S, D = key.batch, key.heads, key.seq, key.head_dim
    hpp = key.hpp
    assert H % hpp == 0, (H, hpp)
    pv = _pv_dtype(key)
    odt = jnp.bfloat16 if key.dtype in ("bf16", "f16") else jnp.float32

    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
               dq_ref, dk_ref, dv_ref):
        for h in range(hpp):
            q, k, v = q_ref[0, h], k_ref[0, h], v_ref[0, h]
            do = do_ref[0, h]
            lse2 = lse_ref[0, h]                        # (S, 1)
            delta = dlt_ref[0, h]                       # (S, 1)
            s2 = _masked_logits2(q, k, key)
            p = jnp.exp2(s2 - lse2)                     # (S, S) f32
            pc = p.astype(pv)
            # dV = Pᵀ dO : contract the query axis (S, full-lane)
            dv_ref[0, h] = jax.lax.dot_general(
                pc, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(odt)
            # dP = dO Vᵀ : contract D
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = (p * (dp - delta) * key.scale).astype(pv)
            # dQ = dS K : contract the key axis
            dq_ref[0, h] = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(odt)
            # dK = dSᵀ Q : contract the query axis
            dk_ref[0, h] = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(odt)

    blk = lambda b, h: (b, h, 0, 0)
    call = pl.pallas_call(
        kernel, grid=(B, H // hpp), interpret=interpret,
        in_specs=[pl.BlockSpec((1, hpp, S, D), blk)] * 4
        + [pl.BlockSpec((1, hpp, S, 1), blk)] * 2,
        out_specs=[pl.BlockSpec((1, hpp, S, D), blk)] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, H, S, D), odt)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * S * S * D,
            bytes_accessed=7 * B * H * S * D * 4,
            transcendentals=B * H * S * S),
    )
    return call


@functools.lru_cache(maxsize=None)
def _flash_vjp(key: FlashTrainKey, interpret: bool):
    fwd_call = build_flash_train_fwd(key, interpret)
    bwd_call = build_flash_train_bwd(key, interpret)

    @jax.custom_vjp
    def attn(q, k, v):
        o, _ = fwd_call(q, k, v)
        return o

    def fwd(q, k, v):
        o, lse2 = fwd_call(q, k, v)
        return o, (q, k, v, o, lse2)

    def bwd(res, g):
        q, k, v, o, lse2 = res
        delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)         # (B, H, S, 1)
        dq, dk, dv = bwd_call(q, k, v, g.astype(q.dtype), lse2, delta)
        return (dq.astype(q.dtype), dk.astype(k.dtype),
                dv.astype(v.dtype))

    attn.defvjp(fwd, bwd)
    return attn


def flash_attention_train(q, k, v, scale, causal: bool = True,
                          interpret: bool | None = None):
    """Drop-in for `composed_causal_attention` on the TRAINING path:
    (B, S, H, D) heads-split operands (GQA KV broadcast like composed),
    returns (B, S, H, D) f32. Differentiable via the Pallas kernel
    pair; O(S·D) residuals instead of the (B, H, S, S) softmax."""
    from ..utils.target import current_target, on_tpu

    if interpret is None:
        interpret = not on_tpu()
    B, S, H, D = q.shape
    if k.shape[2] != H:
        # GQA: repeat OUTSIDE the custom VJP — jnp.repeat's transpose
        # (the group-sum of dk/dv) is XLA's, and exactly right
        g = H // k.shape[2]
        k = jnp.repeat(k, g, axis=2)
        v = jnp.repeat(v, g, axis=2)
    key = FlashTrainKey(batch=B, heads=H, seq=S, head_dim=D,
                        dtype="bf16" if q.dtype == jnp.bfloat16
                        else "f32", causal=causal, scale=float(scale))
    hpp = flash_train_hpp(key, current_target().vmem_bytes)
    import dataclasses
    key = dataclasses.replace(key, hpp=max(hpp, 1))
    attn = _flash_vjp(key, interpret)
    t = lambda a: jnp.transpose(a, (0, 2, 1, 3))
    return t(attn(t(q), t(k), t(v)))
