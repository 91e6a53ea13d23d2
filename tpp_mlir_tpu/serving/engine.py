"""Autoregressive serving engine: prefill + KV-cache decode for the GPT
model family (models/gpt.py).

The reference framework stops at single-shot inference benchmarks; serving
an LM needs the decode loop: a prompt PREFILL (one causal forward that also
writes every layer's K/V into a cache) followed by per-token DECODE steps
(one new token attends to the cached keys/values). This module is the
TPU-native design of that loop:

- Static shapes everywhere: the cache is allocated at `max_seq` up front
  and decode masks by position, so ONE compiled step serves every token
  (XLA traces once; no per-position recompiles).
- Prefill rides the same flash-attention kernels as the benchmark family
  (FlashMhaKey token layout, causal) under the measured delegation policy
  (D >= 128 always; D < 128 only at seq >= 1024 where XLA's composed path
  materializes the (B,H,S,S) scores in HBM — PERF.md r4).
- Decode attention is deliberately COMPOSED (jnp einsum, no Pallas): with
  one query token the MXU contraction is M=1 — a matvec over the cache,
  HBM-bandwidth-bound by the K/V read. XLA's fused gather+matvec is the
  right tool; a Pallas kernel has nothing to win (same reasoning as the
  measured conv delegation, docs/DESIGN.md).
- The decode loop is a `lax.scan` over steps (compiler-friendly control
  flow), with greedy or temperature sampling inside the scan.

Weights come from the same torch module the importer benchmarks
(`params_from_torch`) or from `init_params` for synthetic runs.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass


@dataclass(frozen=True)
class GptConfig:
    vocab: int = 50304
    embed: int = 768
    heads: int = 12
    layers: int = 12
    mlp_ratio: int = 4
    max_seq: int = 1024
    dtype: str = "f32"   # compute/storage dtype: f32 | bf16
    kv_heads: int | None = None   # GQA: KV heads < query heads (None=MHA)
    kv_quant: str | None = None   # "int8": per-(token, head) KV cache quant
    # Mixtral-class sparse-expert FFN: every block's MLP becomes
    # n_experts expert FFNs with a linear router; each token runs its
    # top_k experts, gates = renormalized softmax over the selected
    # logits. 0 = dense (GPT-2 class).
    n_experts: int = 0
    top_k: int = 2
    # Decode-time MoE FFN form: "auto" picks by traffic model (see
    # _moe_ffn_decode), or force "slice" | "gather" | "scan" (the
    # exp_moe_decode.py experiment knob).
    moe_decode_form: str = "auto"
    # Prefill-time MoE FFN form: "scan" (exact, n_experts x dense
    # compute), "sorted" (GShard capacity-bounded dispatch,
    # ~top_k x dense compute; tokens beyond capacity_factor drop to a
    # zero FFN delta — the standard serving/training trade), or
    # "grouped" (dropless grouped-expert Pallas BRGEMM: ~top_k x dense
    # compute AND exact — see _moe_ffn_grouped).
    moe_prefill_form: str = "scan"
    moe_capacity_factor: float = 1.25
    # row-block quantum of the grouped form (per-expert rows pad to a
    # multiple of this; also the kernel's m block)
    moe_group_bm: int = 128
    # grouped form under the stacked-layer scan: keep the expert
    # weights OUT of the scan xs and index the layer inside the
    # kernel's BlockSpec (GroupedGemmKey.layers) instead of slicing a
    # (n_e, E, F) slab per layer — a value-level slice feeding a
    # pallas_call materializes a copy (same finding as the decode
    # attention cache, exp_decode_form r5). False = the r5a per-layer
    # slab form (the exp_moe_stack.py A/B knob).
    moe_group_stacked: bool = True
    # int8 MXU COMPUTE for QTensor (quantize_params) weights: prefill
    # and any matmul with >= 32 activation rows runs int8 x int8 -> s32
    # on the MXU (~2x bf16 rate) with per-row activation quantization.
    # Decode at small batch stays on the weight-only dequant path (it
    # is HBM-bound; int8 compute buys nothing at M < 32).
    int8_compute: bool = False
    # Single-token decode attention form: "auto" runs the streaming
    # Pallas kernel (xsmm/decode_attn.py) on TPU when MHA, un-quantized
    # KV and the (1, H, S, D) K/V blocks fit VMEM (measured ~2.5x the
    # XLA batched-matvec emission at b8, exp_decode_attn r5); "xla"
    # forces the einsum path; "pallas" forces the kernel (interpret
    # mode off-TPU — the differential-test hook).
    decode_attn: str = "auto"
    # LLaMA-class architecture axes (combine with kv_heads for the full
    # LLaMA-2/3 recipe): rotary position embeddings instead of the
    # learned wpe table, RMSNorm instead of LayerNorm (no mean, no
    # bias), SwiGLU FFN (silu(h@w1) * (h@w3)) @ w2 instead of GELU.
    rope: bool = False
    rms_norm: bool = False
    swiglu: bool = False
    rope_theta: float = 10000.0
    # Pack TWO D=64 heads per 128-lane group in the KV cache
    # ((L, B, H/2, S, 2D) layout) and run the pack2 decode-attention
    # kernel: each cache row streams 256 contiguous bytes instead of
    # 128 and VMEM holds half the lane-padded blocks (r5 verdict #4
    # A/B against the b8 decode residual). MHA + unquantized KV +
    # Pallas decode only; prefill/extend are unaffected except the
    # cache layout (make_extend rejects packed caches).
    kv_packed: bool = False
    # Activation checkpointing (training): wrap each layer of the
    # prefill scan in jax.checkpoint, so backward re-runs one layer's
    # forward instead of saving every layer's activations — the lever
    # that fits the B8 s512 MoE training geometry in HBM (the scan
    # form's saved per-expert (T, F) activations OOM'd at 23 GB, r5).
    # ~4/3x forward flops for ~L x less live activation memory.
    # Inference (no grad) is unaffected: checkpoint is identity under
    # plain jit.
    remat: bool = False
    # Training-attention form for the PREFILL path: route
    # _attention_full through the Pallas flash training VJP
    # (xsmm/flash_train.py) — O(S*D) residuals instead of the
    # (B, H, S, S) f32 softmax XLA's AD saves (the r7 bisect priced
    # composed attention fwd+bwd at 34% of the dense train step).
    # Opt-in: the prefill-based trainers (exp_moe_train, exp_spec_real)
    # set it; inference defaults keep the measured delegation policy.
    # Falls back to that policy when the whole-slab kernels don't fit
    # VMEM or the dtype has no Mosaic lowering (f16).
    flash_attn: bool = False

    @classmethod
    def llama(cls, **kw):
        """LLaMA-2/3-class preset: RoPE + RMSNorm + SwiGLU (pass
        kv_heads for GQA)."""
        kw.setdefault("rope", True)
        kw.setdefault("rms_norm", True)
        kw.setdefault("swiglu", True)
        return cls(**kw)

    def __post_init__(self):
        if self.kv_heads is not None:
            assert self.heads % self.kv_heads == 0, \
                f"heads {self.heads} not divisible by kv_heads " \
                f"{self.kv_heads}"
        if self.n_experts:
            assert 1 <= self.top_k <= self.n_experts, \
                (self.top_k, self.n_experts)
            assert not self.swiglu, \
                "MoE experts use GELU in v1 (SwiGLU experts: future work)"
        if self.rope:
            assert self.head_dim % 2 == 0, "RoPE needs an even head_dim"
        if self.kv_packed:
            assert self.kv_heads is None, "kv_packed is MHA-only"
            assert self.heads % 2 == 0, "kv_packed pairs heads"
            assert 2 * self.head_dim <= 128, \
                f"kv_packed packs two heads per 128-lane group; " \
                f"head_dim {self.head_dim} is already lane-full"
            assert self.kv_quant is None, "kv_packed is bf16/f32 KV only"
            assert self.decode_attn != "xla", \
                "kv_packed needs the Pallas decode kernel (the packed " \
                "layout has no einsum path)"

    @property
    def head_dim(self) -> int:
        return self.embed // self.heads

    @property
    def kv_h(self) -> int:
        """KV head count: grouped-query attention shares each KV head
        across heads/kv_h query heads (LLaMA-2/3 style), dividing the
        decode-dominant KV-cache bytes by that group size."""
        return self.kv_heads or self.heads

    @property
    def kv_dim(self) -> int:
        return self.kv_h * self.head_dim


def _np_dtype(dtype: str):
    import jax.numpy as jnp

    return {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype]


def params_from_torch(model, cfg: GptConfig):
    """Extract a params pytree from a models/gpt.py GptTorch instance.
    Weight matrices are stored (in, out) so forward is x @ W (no
    transposes at run time)."""
    import jax.numpy as jnp

    dt = _np_dtype(cfg.dtype)

    assert cfg.kv_h == cfg.heads, \
        "params_from_torch: models/gpt.py is MHA; GQA configs use " \
        "init_params or an external checkpoint loader"

    def t(x):
        return jnp.asarray(x.detach().cpu().float().numpy()).astype(dt)

    E = cfg.embed
    blocks = []
    for blk in model.blocks:
        w = blk.attn.in_proj_weight   # (3E, E) rows [q; k; v]
        b = blk.attn.in_proj_bias
        blocks.append({
            "ln1_g": t(blk.ln1.weight), "ln1_b": t(blk.ln1.bias),
            "wq": t(w[:E].T), "bq": t(b[:E]),
            "wk": t(w[E:2 * E].T), "bk": t(b[E:2 * E]),
            "wv": t(w[2 * E:].T), "bv": t(b[2 * E:]),
            "wo": t(blk.attn.out_proj.weight.T),
            "bo": t(blk.attn.out_proj.bias),
            "ln2_g": t(blk.ln2.weight), "ln2_b": t(blk.ln2.bias),
            "w1": t(blk.fc1.weight.T), "b1": t(blk.fc1.bias),
            "w2": t(blk.fc2.weight.T), "b2": t(blk.fc2.bias),
        })
    return {
        "wte": t(model.wte.weight),
        "wpe": t(model.wpe),
        "blocks": blocks,
        "lnf_g": t(model.ln_f.weight), "lnf_b": t(model.ln_f.bias),
        "lm_head": t(model.lm_head.weight.T),
    }


def init_params(cfg: GptConfig, seed: int = 0):
    """Random params for synthetic serving benchmarks (no torch needed)."""
    import jax
    import jax.numpy as jnp

    dt = _np_dtype(cfg.dtype)
    E, V, S = cfg.embed, cfg.vocab, cfg.max_seq
    key = jax.random.PRNGKey(seed)

    def nrm(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    ks = iter(jax.random.split(key, 4 + 16 * cfg.layers))
    F = cfg.mlp_ratio * E
    blocks = []
    for _ in range(cfg.layers):
        blk = {
            "ln1_g": jnp.ones((E,), dt),
            "wq": nrm(next(ks), (E, E), E ** -0.5),
            "bq": jnp.zeros((E,), dt),
            "wk": nrm(next(ks), (E, cfg.kv_dim), E ** -0.5),
            "bk": jnp.zeros((cfg.kv_dim,), dt),
            "wv": nrm(next(ks), (E, cfg.kv_dim), E ** -0.5),
            "bv": jnp.zeros((cfg.kv_dim,), dt),
            "wo": nrm(next(ks), (E, E), E ** -0.5),
            "bo": jnp.zeros((E,), dt),
            "ln2_g": jnp.ones((E,), dt),
        }
        if not cfg.rms_norm:
            blk["ln1_b"] = jnp.zeros((E,), dt)
            blk["ln2_b"] = jnp.zeros((E,), dt)
        if cfg.swiglu:
            # SwiGLU: gate (w1) + up (w3) + down (w2), biasless (LLaMA)
            blk["w1"] = nrm(next(ks), (E, F), E ** -0.5)
            blk["w3"] = nrm(next(ks), (E, F), E ** -0.5)
            blk["w2"] = nrm(next(ks), (F, E), F ** -0.5)
        elif cfg.n_experts:
            # expert FFNs are biasless (Mixtral convention); the router
            # is a plain linear over the block input
            blk["wr"] = nrm(next(ks), (E, cfg.n_experts), E ** -0.5)
            blk["w1"] = nrm(next(ks), (cfg.n_experts, E, F), E ** -0.5)
            blk["w2"] = nrm(next(ks), (cfg.n_experts, F, E), F ** -0.5)
        else:
            blk["w1"] = nrm(next(ks), (E, F), E ** -0.5)
            blk["b1"] = jnp.zeros((F,), dt)
            blk["w2"] = nrm(next(ks), (F, E), F ** -0.5)
            blk["b2"] = jnp.zeros((E,), dt)
        blocks.append(blk)
    out = {
        "wte": nrm(next(ks), (V, E), 0.02),
        "blocks": blocks,
        "lnf_g": jnp.ones((E,), dt),
        "lm_head": nrm(next(ks), (E, V), E ** -0.5),
    }
    if not cfg.rope:
        out["wpe"] = nrm(next(ks), (S, E), 0.02)
    if not cfg.rms_norm:
        out["lnf_b"] = jnp.zeros((E,), dt)
    return out


def stack_params(params):
    """Stack the per-layer block dicts into one pytree of (L, ...) arrays.

    Stacked params switch prefill/decode to a `lax.scan` over layers: the
    traced program holds ONE block body instead of L copies, so XLA
    compiles ~L× less HLO (seconds instead of tens of minutes for the
    12-layer family through the remote-compile tunnel) at identical
    numerics. The scan carries x; per-layer KV cache slices ride the scan
    xs/ys, which XLA writes in place into the preallocated output.

    Stacking is leaf-wise over the block pytrees, so quantized blocks
    (QTensor leaves, serving/quant.py) stack transparently: int8 q and
    f32 scale each gain the leading L dim."""
    import jax
    import jax.numpy as jnp

    blocks = params["blocks"]
    if isinstance(blocks, dict):        # already stacked
        return params
    out = dict(params)
    out["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return out


def _ln(x, g, b, eps=1e-5):
    import jax
    import jax.numpy as jnp

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    d = xf - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return ((d * jax.lax.rsqrt(var + eps)) * g.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


def _rmsnorm(x, g, eps=1e-5):
    import jax
    import jax.numpy as jnp

    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)
            * g.astype(jnp.float32)).astype(x.dtype)


def _block_norm(x, blk, which, cfg):
    """LayerNorm or RMSNorm per cfg.rms_norm (RMS has no bias)."""
    g = blk[f"{which}_g"]
    if cfg.rms_norm:
        return _rmsnorm(x, g)
    return _ln(x, g, blk[f"{which}_b"])


def _rope(x, pos, theta: float):
    """Rotary position embedding, rotate-half convention. x: (..., D)
    with heads split; pos broadcastable against x's token dims —
    (S,) for prefill rows, a scalar or (B,) (slotted batching) for
    decode. Rotation happens in f32; K is cached POST-rotation so the
    decode attention needs no re-rotation of the cache."""
    import jax.numpy as jnp

    D = x.shape[-1]
    half = D // 2
    xf = x.astype(jnp.float32)
    inv = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = jnp.asarray(pos, jnp.float32)[..., None] * inv   # (..., half)
    # broadcast angle against x's (..., H, D) layout: pos carries the
    # token dims; insert the head axis
    ang = ang[..., None, :]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = xf[..., :half], xf[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


def _mm_int8(x, w, b=None, unary=None):
    """int8 COMPUTE path: quantize the activation rows to symmetric int8
    (per-row scale) and run the int8 x int8 -> int32 Pallas MXU GEMM
    (xsmm Int8GemmKey, ~2x the bf16 MXU rate on v5e), dequantizing once
    on the f32 accumulator tile — with bias and activation FUSED into
    that tile epilogue (r5 verdict #3: left unfused they were separate
    (T, n) f32 HBM round trips the bf16 path never pays). Adds
    activation-quantization error on top of the weight-only path
    (bounded by max|row|/254 per element pre-contraction); rows pad to
    the int8 sublane quantum (32)."""
    import jax.numpy as jnp

    from ..xsmm import build_kernel
    from ..xsmm.flags import Int8GemmKey
    from .quant import quantize_tokens

    lead, K = x.shape[:-1], x.shape[-1]
    N = w.q.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    Mp = -(-M // 32) * 32
    xq, xs = quantize_tokens(x2)              # (M, K) s8, (M,) f32
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        xs = jnp.pad(xs, (0, Mp - M))
    key = Int8GemmKey(m=Mp, n=N, k=K, out_dtype="f32",
                      has_bias=b is not None, unary_kind=unary)
    args = (xq, w.q, xs, w.scale) + ((b,) if b is not None else ())
    y = build_kernel(key)(*args)
    return y[:M].reshape(*lead, N)


def _mm(x, w, int8: bool = False):
    """f32-accumulate contraction; a QTensor weight (weight-only int8,
    serving/quant.py) contracts against its int8 payload cast to the
    activation dtype — the s8->bf16 convert fuses into the dot's tiled
    operand read, so HBM traffic is the int8 bytes — and dequant-scales
    the RESULT (per-out-column scale factors out of the sum exactly).
    int8=True additionally routes QTensor weights through the int8 MXU
    COMPUTE kernel when the row count covers an int8 tile (32) — the
    compute-bound prefill/large-batch regime (GptConfig.int8_compute)."""
    import math

    import jax.numpy as jnp

    from .quant import QTensor

    if isinstance(w, QTensor):
        if int8 and math.prod(x.shape[:-1]) >= 32:
            return _mm_int8(x, w)
        return jnp.dot(x, w.q.astype(x.dtype),
                       preferred_element_type=jnp.float32) * w.scale
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _dot(x, w, b=None, int8: bool = False, unary: str | None = None):
    """Contraction + bias (+ optional fused activation). On the int8
    MXU-compute route bias and `unary` fuse into the kernel's
    accumulator-tile epilogue; on every other route the math is the
    byte-identical legacy sequence (bias in f32, cast, activation in
    f32) so existing numerics are untouched."""
    import math

    import jax
    import jax.numpy as jnp

    from .quant import QTensor

    if (int8 and isinstance(w, QTensor)
            and math.prod(x.shape[:-1]) >= 32):
        return _mm_int8(x, w, b=b, unary=unary).astype(x.dtype)
    y = _mm(x, w)
    if b is not None:
        y = y + b.astype(jnp.float32)
    y = y.astype(x.dtype)
    if unary == "gelu":
        y = jax.nn.gelu(y.astype(jnp.float32),
                        approximate=False).astype(x.dtype)
    elif unary is not None:
        raise NotImplementedError(f"unfused fallback for unary={unary}")
    return y


def _moe_gates(h, wr, top_k: int):
    """Router: top_k expert ids + renormalized softmax gates (the
    Mixtral convention — softmax over the SELECTED logits only).
    h: (..., E) -> gates (..., k) f32, idx (..., k) i32."""
    import jax
    import jax.numpy as jnp

    logits = _mm(h, wr)                       # (..., n_e) f32
    vals, idx = jax.lax.top_k(logits, top_k)
    return jax.nn.softmax(vals, axis=-1), idx


def _moe_ffn_scan(h, blk, top_k: int):
    """Exact scan-over-experts MoE FFN — the PREFILL form: every expert
    FFN runs over all T tokens (dense compute, n_experts× the dense-FFN
    flops, but weights stream once and nothing materializes beyond one
    (T, F) activation per expert step). No capacity factor, no token
    dropping: the sparse gates select exactly. h: (T, E) -> (T, E).

    Perf roadmap (documented, not yet needed at current scales): a
    sort-by-expert dispatch brings prefill back to top_k/n_experts of
    this compute; the ep-sharded GShard path lives in parallel/moe.py."""
    import jax
    import jax.numpy as jnp

    gates, idx = _moe_gates(h, blk["wr"], top_k)      # (T, k)
    T = h.shape[0]
    n_e = blk["wr"].shape[-1]
    dense = jnp.zeros((T, n_e), jnp.float32).at[
        jnp.arange(T)[:, None], idx].add(gates)       # (T, n_e)

    def body(acc, ew):
        w1, w2, g = ew
        a = jax.nn.gelu(_mm(h, w1), approximate=False).astype(h.dtype)
        return acc + g[:, None] * _mm(a, w2), None

    acc0 = jnp.zeros(h.shape, jnp.float32)
    acc, _ = jax.lax.scan(body, acc0,
                          (blk["w1"], blk["w2"], dense.T))
    return acc.astype(h.dtype)


def _moe_ffn_gather(h, blk, top_k: int):
    """Gather-form MoE FFN — the DECODE form: only the selected experts'
    weights are read (B·k expert reads instead of n_experts), which is
    the whole MoE serving win in the bandwidth-bound decode regime.
    h: (B, E) -> (B, E). Exact same math as the scan form."""
    import jax
    import jax.numpy as jnp

    gates, idx = _moe_gates(h, blk["wr"], top_k)      # (B, k)
    w1s = jnp.take(blk["w1"], idx, axis=0)            # (B, k, E, F)
    w2s = jnp.take(blk["w2"], idx, axis=0)            # (B, k, F, E)
    a = jnp.einsum("be,bkef->bkf", h, w1s,
                   preferred_element_type=jnp.float32)
    a = jax.nn.gelu(a, approximate=False).astype(h.dtype)
    y = jnp.einsum("bkf,bkfe->bke", a, w2s,
                   preferred_element_type=jnp.float32)
    return jnp.sum(gates[..., None] * y, axis=1).astype(h.dtype)


def _moe_ffn_sorted(h, blk, top_k: int, capacity_factor: float = 1.25):
    """GShard-style sorted dispatch — the PREFILL form for large T:
    sort the T*k (token, expert) assignments by expert, pack each
    expert's tokens into a (n_experts, C) table with capacity
    C = ceil(cf * T * k / n), run ONE batched (n, C, E) x (n, E, F)
    einsum per FFN layer — each expert's weights stream exactly once
    and the dense compute is ~cf*k x a dense FFN instead of the exact
    scan form's n x. Assignments beyond an expert's capacity contribute
    a ZERO delta for that expert slot (standard GShard token dropping;
    raise capacity_factor for exactness headroom). Static shapes
    throughout — sort + segment arithmetic, no dynamic sizes, so one
    XLA compilation serves every routing. h: (T, E) -> (T, E)."""
    import jax
    import jax.numpy as jnp

    gates, idx = _moe_gates(h, blk["wr"], top_k)      # (T, k)
    T = h.shape[0]
    n_e = blk["wr"].shape[-1]
    A = T * top_k
    C = max(1, int(-(-capacity_factor * A // n_e)))   # ceil
    e_flat = idx.reshape(A)                            # expert per assignment
    t_flat = jnp.repeat(jnp.arange(T), top_k)          # source token
    g_flat = gates.reshape(A)
    # stable sort by expert id keeps token order within each expert
    order = jnp.argsort(e_flat, stable=True)
    e_s, t_s, g_s = e_flat[order], t_flat[order], g_flat[order]
    # rank of each assignment within its expert group = position - start
    pos = jnp.arange(A)
    start = jnp.searchsorted(e_s, jnp.arange(n_e), side="left")  # (n_e,)
    rank = pos - start[e_s]
    keep = rank < C
    # scatter assignments into the (n_e, C) token table; dropped and
    # empty slots point at row T of an h padded with one zero row
    slot = e_s * C + jnp.where(keep, rank, 0)
    table = jnp.full((n_e * C,), T, jnp.int32).at[
        jnp.where(keep, slot, n_e * C)].set(t_s, mode="drop")
    gtab = jnp.zeros((n_e * C,), g_s.dtype).at[
        jnp.where(keep, slot, n_e * C)].set(g_s, mode="drop")
    hp = jnp.concatenate([h, jnp.zeros((1, h.shape[-1]), h.dtype)], 0)
    xg = hp[table].reshape(n_e, C, -1)                 # (n, C, E)
    a = jnp.einsum("nce,nef->ncf", xg, blk["w1"],
                   preferred_element_type=jnp.float32)
    a = jax.nn.gelu(a, approximate=False).astype(h.dtype)
    y = jnp.einsum("ncf,nfe->nce", a, blk["w2"],
                   preferred_element_type=jnp.float32)  # (n, C, E)
    y = (gtab[:, None] * y.reshape(n_e * C, -1))
    # combine: scatter-add expert outputs back to their source tokens
    out = jnp.zeros((T + 1, h.shape[-1]), jnp.float32).at[table].add(y)
    return out[:T].astype(h.dtype)


def _moe_ffn_grouped(h, blk, cfg, stacked=None):
    """Dropless grouped-expert dispatch — the megablocks form on the
    grouped Pallas BRGEMM (xsmm GroupedGemmKey): sort the T*k (token,
    expert) assignments by expert, pad each expert's rows to a bm
    multiple (static worst-case bound, so NO token is ever dropped —
    exact vs the dense-selection oracle, unlike the capacity-bounded
    sorted form), then run the two FFN GEMMs as grouped kernels whose
    weight block index comes from a scalar-prefetch block->expert map.
    Each expert's weights stream ~once; no (n_e, C, E) capacity table
    or scatter round trip materializes between the GEMMs — gelu is the
    first kernel's epilogue. h: (T, E) -> (T, E)."""
    from .quant import QTensor

    if stacked is None and isinstance(blk["w1"], QTensor):
        return _moe_ffn_scan(h, blk, cfg.top_k)   # weight-only quant form
    top_k = cfg.top_k
    T, E = h.shape
    n_e = blk["wr"].shape[-1]
    bm = cfg.moe_group_bm
    if stacked is None:
        # differentiable (custom-VJP) core: forward identical, backward
        # runs the grouped dgrad/wgrad kernels -- training at grouped
        # speed (see _grouped_ffn_trainable)
        core = _grouped_ffn_trainable(top_k, n_e, bm, cfg.dtype)
        return core(h, blk["wr"], blk["w1"], blk["w2"])
    # stacked-layer scan: the (L, ...) weight tables stay whole and the
    # kernel BlockSpec indexes the layer -- no per-layer slab copy (see
    # GptConfig.moe_group_stacked). Routed through the custom-VJP core
    # with layers=L: under plain jit only the primal runs -- the same
    # fused-gelu kernel pair as the r5b inference path -- and under AD
    # the backward stays on grouped kernels with the SAME in-kernel
    # layer indexing, so training stops paying the scan-xs slab copies
    # (r5 verdict #1a; the r5a per-layer form is moe_group_stacked=False).
    w1f, w2f, li = stacked
    core = _grouped_ffn_trainable(top_k, n_e, bm, cfg.dtype,
                                  layers=w1f.shape[0])
    return core(h, blk["wr"], w1f, w2f, li)


def _grouped_dispatch(idx, T: int, n_e: int, bm: int, top_k: int):
    """The scatter-free single-sort grouped dispatch maps (shared by the
    inference path and the custom-VJP training core).

    SCATTER-FREE: XLA:TPU lowers scatter to a serialized per-index loop
    (measured: the .at[].set/add spelling ran the end-to-end prefill at
    half the rate). SINGLE-SORT: a TPU sort is a bitonic network
    (~log^2(A) compare passes with fixed overhead) — the r4 two-argsort
    glue cost ~230 us against a ~510 us kernel pair. The one sort runs
    on the fused key e*A + i (unique, orders like a stable sort by
    expert); source token = (key % A) // top_k, assignment id = key % A.
    The combine side's rank-within-expert comes from a one-hot cumsum.

    Per-expert rows pad to a bm multiple with a MINIMUM of one block
    (sum_e max(round_up(cnt_e, bm), bm) <= (ceil(A/bm) + n_e) * bm — the
    same STATIC bound, so one compiled kernel serves every routing; the
    min block keeps every expert indexed in ge, which is the grouped-
    wgrad kernel's write-coverage contract).

    Returns {A_pad, ge (A_pad//bm,) block->expert, tt (A_pad,) source
    token (T = padding sentinel), aid (A_pad,) flat assignment id
    (A = sentinel), rows (T, top_k) assignment -> padded slot}."""
    import jax
    import jax.numpy as jnp

    A = T * top_k
    A_pad = (-(-A // bm) + n_e) * bm
    e_flat = idx.reshape(A)
    oh = (e_flat[:, None] == jnp.arange(n_e)).astype(jnp.int32)
    csum = jnp.cumsum(oh, axis=0)                     # (A, n_e) inclusive
    rank = jnp.take_along_axis(csum, e_flat[:, None], 1)[:, 0] - 1
    counts = csum[-1]                                 # (n_e,)
    start = jnp.cumsum(counts) - counts               # exclusive
    padded = jnp.maximum(((counts + bm - 1) // bm) * bm, bm)
    ends = jnp.cumsum(padded)
    offs = ends - padded
    fused = e_flat.astype(jnp.int32) * jnp.int32(A) + \
        jnp.arange(A, dtype=jnp.int32)
    srt = jax.lax.sort(fused)
    a_s = srt % jnp.int32(A)                          # flat assignment id
    t_s = a_s // jnp.int32(top_k)
    # padded slot p -> (expert, local slot) -> sorted index; padding
    # slots read the sentinel (token T / assignment A)
    pslot = jnp.arange(A_pad)
    pe = jnp.minimum(jnp.searchsorted(ends, pslot, side="right"),
                     n_e - 1)
    loc = pslot - offs[pe]
    valid = loc < counts[pe]
    si = start[pe] + jnp.where(valid, loc, 0)
    return {
        "A_pad": A_pad,
        "ge": pe[::bm].astype(jnp.int32),
        "tt": jnp.where(valid, t_s[si], T),
        "aid": jnp.where(valid, a_s[si], A),
        "rows": (offs[e_flat] + rank).reshape(T, top_k),
    }


def _grouped_combine(gates, ys, rows, top_k: int):
    """Gather-combine: out[t] = sum_j gates[t, j] * ys[rows[t, j]].
    UNROLLED over top_k: a single ys[(T, k)] gather makes XLA
    materialize the (T, k, E) f32 intermediate and stream it three more
    times through the multiply/reduce (~138 MB of VPU traffic at the
    serving geometry); k separate gathers fuse into one FMA pass each
    (39 us, moe_grouped_r5)."""
    import jax.numpy as jnp

    T = gates.shape[0]
    out = jnp.zeros((T, ys.shape[-1]), jnp.float32)
    for j in range(top_k):
        out = out + (gates[:, j, None].astype(jnp.float32)
                     * ys[rows[:, j]].astype(jnp.float32))
    return out


@functools.lru_cache(maxsize=None)
def _grouped_ffn_trainable(top_k: int, n_e: int, bm: int, dtype: str,
                           layers: int = 0):
    """Differentiable dropless grouped-expert FFN: custom-VJP
    `core(h, wr, w1, w2) -> (T, E)` whose forward IS the inference
    grouped path (single-sort dispatch + two grouped Pallas BRGEMMs)
    and whose backward stays on grouped kernels AND scatter-free — the
    megablocks training form on this framework's machinery:

      dys    gather of dout by the slot->token map, x gathered gates
             (the combine's backward is a GATHER because the dispatch
             already carries the inverse maps — no scatter-add)
      da     grouped dgrad: dys @ w2[ge]^T — GroupedGemmKey.transpose_b
             with w2 in its NATURAL (n_e, F, E) = (g, n, k) layout
      dz1    exact-gelu VJP on the saved f32 pre-activation
      dw1/2  GroupedWgradKey: accumulate-until-expert-change, one MXU
             pass per (row block, n-tile) — dense-wgrad flops, no
             n_experts x inflation and no capacity table
      dxs    grouped dgrad over w1 (n_e, E, F) = (g, n, k)
      dh     top_k gathers of dxs by `rows` + the router VJP
      dwr    VJP of the renormalized softmax over the FIXED top-k
             selection (routing indices carry no gradient — the
             standard MoE convention)

    Under plain jit (no grad) only the primal runs — the fused-gelu
    inference kernels, unchanged. Under AD the forward saves xs, the
    f32 z1 (so value-level gelu matches the fused kernel's f32-epilogue
    numerics exactly) and ys; wrap the caller in jax.checkpoint
    (GptConfig.remat) to trade the activation memory back.

    `layers` L > 0 is the STACKED-layer training form (r5 verdict #1a):
    core(h, wr, w1f, w2f, li) with the FULL (L, n_e, ., .) expert
    tables held out of the layer scan's xs and the layer index fed to
    every grouped kernel's BlockSpec (GroupedGemmKey.layers) — forward
    AND dgrad pay no per-layer slab copy (the measured ~127 us/layer
    cost of a value-level slice feeding a pallas_call). The wgrad stays
    per-layer compact; its cotangent scatters into the zeros (L, ...)
    table with one DUS, which XLA's add-of-DUS-into-zeros rewrite folds
    into the scan's gradient accumulator in place (layers touch
    disjoint slabs, so the accumulation is exact in any dtype)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..xsmm import build_kernel
    from ..xsmm.flags import GroupedGemmKey, GroupedWgradKey

    def _keys(T, E, F):
        A_pad = (-(-T * top_k // bm) + n_e) * bm
        k1 = GroupedGemmKey(n_groups=n_e, m=A_pad, n=F, k=E, dtype=dtype,
                            bm=bm, unary_kind="gelu", layers=layers)
        k2 = GroupedGemmKey(n_groups=n_e, m=A_pad, n=E, k=F, dtype=dtype,
                            bm=bm, layers=layers)
        return A_pad, k1, k2

    def _run(kk, ge, x, w, li):
        fn = build_kernel(kk)
        return fn(li, ge, x, w) if layers else fn(ge, x, w)

    def _gates_given_idx(h, wr, idx):
        # _moe_gates with the selection FIXED: lax.top_k's values are
        # the logits at the top-k indices, so this matches its numerics
        logits = _mm(h, wr)
        vals = jnp.take_along_axis(logits, idx, axis=-1)
        return jax.nn.softmax(vals, axis=-1)

    def _core(h, wr, w1, w2, li):
        T, E = h.shape
        F = w1.shape[-1]
        gates, idx = _moe_gates(h, wr, top_k)
        d = _grouped_dispatch(idx, T, n_e, bm, top_k)
        hp = jnp.concatenate([h, jnp.zeros((1, E), h.dtype)], 0)
        xs = hp[d["tt"]]
        _, k1, k2 = _keys(T, E, F)
        a = _run(k1, d["ge"], xs, w1, li)             # gelu(xs @ w1[e])
        ys = _run(k2, d["ge"], a, w2, li)             # (A_pad, E)
        return _grouped_combine(gates, ys, d["rows"], top_k) \
            .astype(h.dtype)

    def _fwd(h, wr, w1, w2, li):
        T, E = h.shape
        F = w1.shape[-1]
        gates, idx = _moe_gates(h, wr, top_k)
        d = _grouped_dispatch(idx, T, n_e, bm, top_k)
        hp = jnp.concatenate([h, jnp.zeros((1, E), h.dtype)], 0)
        xs = hp[d["tt"]]
        _, k1, k2 = _keys(T, E, F)
        # pre-activation computed in f32 (gelu on the f32 accumulator is
        # exactly the fused kernel's epilogue path) but SAVED at the
        # compute dtype: the (A_pad, F) slab is the largest residual and
        # f32 storage doubled its fwd-write + bwd-read HBM traffic (r6;
        # f32 configs are unaffected — cdt == f32 keeps bitwise parity
        # with the oracle-pinned tests)
        z1 = _run(dataclasses.replace(k1, unary_kind=None,
                                      out_dtype="f32"),
                  d["ge"], xs, w1, li)
        a = jax.nn.gelu(z1, approximate=False).astype(xs.dtype)
        ys = _run(k2, d["ge"], a, w2, li)
        out = _grouped_combine(gates, ys, d["rows"], top_k).astype(h.dtype)
        z1s = z1.astype(_np_dtype(dtype))
        return out, (h, wr, w1, w2, li, gates, idx, d["ge"], d["tt"],
                     d["aid"], d["rows"], xs, z1s, ys)

    def _bwd(res, dout):
        h, wr, w1, w2, li, gates, idx, ge, tt, aid, rows, xs, z1, ys = res
        T, E = h.shape
        F = w1.shape[-1]
        A = T * top_k
        A_pad, k1, k2 = _keys(T, E, F)
        cdt = _np_dtype(dtype)
        z1 = z1.astype(jnp.float32)   # saved at cdt (see _fwd)
        do32 = dout.astype(jnp.float32)
        # combine backward — all gathers (sentinel rows read zero):
        # dys[p] = gates_flat[aid[p]] * dout[tt[p]]
        dop = jnp.concatenate([do32, jnp.zeros((1, E), jnp.float32)], 0)
        gflat = jnp.concatenate(
            [gates.reshape(A).astype(jnp.float32),
             jnp.zeros((1,), jnp.float32)], 0)
        dys = (gflat[aid][:, None] * dop[tt]).astype(cdt)
        # dgates[t, j] = dout[t] . ys[rows[t, j]]
        dgates = jnp.stack(
            [jnp.sum(do32 * ys[rows[:, j]].astype(jnp.float32), axis=-1)
             for j in range(top_k)], axis=-1)
        # kernel-pair backward on grouped kernels (layers flows through
        # the replaced keys, so the stacked form's dgrad reads w1f/w2f
        # with in-kernel layer indexing too)
        da = _run(dataclasses.replace(k2, n=F, k=E, transpose_b=True,
                                      out_dtype="f32"),
                  ge, dys, w2, li)                    # dys @ w2[e]^T
        _, gelu_vjp = jax.vjp(
            lambda z: jax.nn.gelu(z, approximate=False), z1)
        dz1 = gelu_vjp(da)[0].astype(cdt)
        a = jax.nn.gelu(z1, approximate=False).astype(cdt)
        dw2 = build_kernel(GroupedWgradKey(
            n_groups=n_e, m=A_pad, k=F, n=E, dtype=dtype, bm=bm))(
                ge, a.T, dys)                         # (n_e, F, E) f32
        dw1 = build_kernel(GroupedWgradKey(
            n_groups=n_e, m=A_pad, k=E, n=F, dtype=dtype, bm=bm))(
                ge, xs.T, dz1)                        # (n_e, E, F) f32
        dxs = _run(dataclasses.replace(k1, n=E, k=F, unary_kind=None,
                                       transpose_b=True, out_dtype="f32"),
                   ge, dz1, w1, li)                   # dz1 @ w1[e]^T
        # dispatch backward: xs rows are copies of h rows at KNOWN
        # slots, so dh = sum_j dxs[rows[:, j]] — gathers, no scatter
        dh = jnp.zeros((T, E), jnp.float32)
        for j in range(top_k):
            dh = dh + dxs[rows[:, j]]
        # router backward through the fixed top-k selection
        _, gvjp = jax.vjp(lambda h_, wr_: _gates_given_idx(h_, wr_, idx),
                          h, wr)
        dh_g, dwr = gvjp(dgates.astype(gates.dtype))
        dh = dh + dh_g.astype(jnp.float32)
        if layers:
            # compact per-layer wgrad -> one DUS into the zeros table;
            # layer scan iterations touch disjoint slabs (XLA folds the
            # add-of-DUS-into-zeros into the accumulator in place)
            dw1f = jnp.zeros(w1.shape, w1.dtype).at[li].set(
                dw1.astype(w1.dtype))
            dw2f = jnp.zeros(w2.shape, w2.dtype).at[li].set(
                dw2.astype(w2.dtype))
            dli = np.zeros(np.shape(li), jax.dtypes.float0)
            return (dh.astype(h.dtype), dwr.astype(wr.dtype),
                    dw1f, dw2f, dli)
        return (dh.astype(h.dtype), dwr.astype(wr.dtype),
                dw1.astype(w1.dtype), dw2.astype(w2.dtype))

    if layers:
        @jax.custom_vjp
        def core(h, wr, w1, w2, li):
            return _core(h, wr, w1, w2, li)

        core.defvjp(_fwd, _bwd)
        return core

    @jax.custom_vjp
    def core(h, wr, w1, w2):
        return _core(h, wr, w1, w2, None)

    core.defvjp(lambda h, wr, w1, w2: _fwd(h, wr, w1, w2, None),
                lambda res, dout: _bwd(res, dout))
    return core


def _moe_ffn_prefill(h, blk, cfg, stacked=None):
    """Prefill-time MoE FFN dispatch: exact scan (default), the sorted
    capacity-bounded form ('sorted'), or the dropless grouped-expert
    Pallas BRGEMM form ('grouped'). `stacked` (grouped only) carries
    (w1_full, w2_full, layer_index) when the caller scans stacked
    layers with the expert tables held out of the scan xs."""
    if cfg.moe_prefill_form == "sorted":
        return _moe_ffn_sorted(h, blk, cfg.top_k, cfg.moe_capacity_factor)
    if cfg.moe_prefill_form == "grouped":
        return _moe_ffn_grouped(h, blk, cfg, stacked=stacked)
    return _moe_ffn_scan(h, blk, cfg.top_k)


def _moe_ffn_slice(h, blk, top_k: int):
    """Dynamic-slice-form MoE FFN for B == 1 (the latency-serving
    case): the k selected experts' weights reach the dot through
    `dynamic_index_in_dim` — a contiguous slice XLA can fuse into the
    operand read, with no (B, k, E, F) gather materialization (the
    gather form's copy doubles-to-triples the expert HBM traffic).
    vmap would turn these slices back into gathers, so B > 1 routes
    elsewhere (_moe_ffn_decode). h: (1, E) -> (1, E)."""
    import jax
    import jax.numpy as jnp

    gates, idx = _moe_gates(h, blk["wr"], top_k)      # (1, k)
    acc = jnp.zeros(h.shape, jnp.float32)
    for j in range(top_k):
        w1 = jax.lax.dynamic_index_in_dim(blk["w1"], idx[0, j], axis=0,
                                          keepdims=False)   # (E, F)
        w2 = jax.lax.dynamic_index_in_dim(blk["w2"], idx[0, j], axis=0,
                                          keepdims=False)   # (F, E)
        a = jax.nn.gelu(_mm(h, w1), approximate=False).astype(h.dtype)
        acc = acc + gates[:, j:j + 1] * _mm(a, w2)
    return acc.astype(h.dtype)


def _moe_ffn_decode(h, blk, cfg):
    """Decode-time MoE FFN dispatch by HBM-traffic model (the decode
    regime is bandwidth-bound, so bytes touched IS the cost):

      B == 1          -> slice form: k fused expert-slice reads, no copy;
      3*B*k >= n_e    -> scan form: all n_e experts stream exactly ONCE.
                         The gather form's jnp.take MATERIALIZES its
                         selection (copy + re-read ≈ 3x the touched
                         expert bytes, measured), so streaming the whole
                         table wins unless the touched share is < ~1/3;
      else            -> gather form: B*k expert reads (large expert
                         counts at small batch).

    Measured on v5e (exp_moe_decode.py, moe_decode_forms_r4.json,
    GPT-2-small MoE-8 geometry): gather-everywhere ran b1 518 / b8 627
    tok/s; the policy forms run b1 1,339 (slice, 2.6x) and b8 4,271
    (scan, 6.8x).
    """
    form = cfg.moe_decode_form
    if form == "auto":
        if h.shape[0] == 1:
            form = "slice"
        elif 3 * h.shape[0] * cfg.top_k >= cfg.n_experts:
            form = "scan"
        else:
            form = "gather"
    if form == "slice":
        # the slice form is a B == 1 construction (vmap would re-gather);
        # a forced 'slice' at B > 1 is an experiment-knob misuse, not a
        # silent fallback (ADVICE r3 #3)
        assert h.shape[0] == 1, \
            f"moe_decode_form='slice' requires batch 1, got {h.shape[0]}"
        return _moe_ffn_slice(h, blk, cfg.top_k)
    if form == "scan":
        return _moe_ffn_scan(h, blk, cfg.top_k)
    return _moe_ffn_gather(h, blk, cfg.top_k)


def _gather(w, idx):
    """Embedding-row gather that understands quantized (per-row scale)
    tables; returns f32 rows."""
    import jax.numpy as jnp

    from .quant import QTensor

    if isinstance(w, QTensor):
        return (jnp.take(w.q, idx, axis=0).astype(jnp.float32)
                * jnp.take(w.scale, idx, axis=0))
    return jnp.take(w, idx, axis=0).astype(jnp.float32)


def composed_causal_attention(q, k, v, scale, causal: bool = True):
    """Composed (XLA-fused) attention over (B, S, H, D) heads-split
    operands, f32 math, GQA KV broadcast if k/v carry fewer heads.
    Returns (B, S, H, D) f32. The ONE shared definition of the
    einsum→mask→softmax→einsum sequence — serving prefill, the tp MHA
    forward and the GPT train step all call it, so their numerics stay
    in lock-step (the train-vs-prefill parity test depends on that)."""
    import jax
    import jax.numpy as jnp

    B, S, H, D = q.shape
    if k.shape[2] != H:
        g = H // k.shape[2]
        k = jnp.repeat(k, g, axis=2)
        v = jnp.repeat(v, g, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if causal:
        s = jnp.where(jnp.tril(jnp.ones((S, S), bool))[None, None],
                      s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def _attention_full(q, k, v, cfg: GptConfig, use_pallas: bool):
    """Causal attention over token-layout (B, S, E) projections: the flash
    kernel family under the measured delegation policy, else composed."""
    import jax
    import jax.numpy as jnp

    B, S, E = q.shape
    H, D = cfg.heads, cfg.head_dim
    scale = D ** -0.5
    # Delegation policy (measured): D>=128 -> token-layout flash kernel
    # (1.4x XLA, r3); D<128 short-seq -> composed XLA (per-head lane
    # slices are vreg-relayout poison, r3). D<128 LONG-seq used to take
    # the token-layout kernel as the lesser evil vs XLA's (B,H,S,S) f32
    # materialization — the flash-train FORWARD (whole-slab programs, no
    # per-head lane slices, no S^2 HBM traffic) beats it 1.28x at
    # s1024 d64 (flash_infer_r7.json: 20.0% vs 15.6% of the triangle
    # roof) and scales with batch where composed cannot, so that case
    # routes here too.
    want_flash = cfg.flash_attn or (use_pallas and S >= 1024 and D < 128)
    if want_flash and cfg.dtype in ("f32", "bf16"):
        from ..utils.target import current_target
        from ..xsmm.flash_train import (FlashTrainKey,
                                        flash_attention_train,
                                        flash_train_fits)

        key = FlashTrainKey(batch=B, heads=H, seq=S, head_dim=D,
                            dtype=cfg.dtype)
        if flash_train_fits(key, current_target().vmem_bytes):
            out = flash_attention_train(
                q.reshape(B, S, H, D),
                k.reshape(B, S, cfg.kv_h, D),
                v.reshape(B, S, cfg.kv_h, D), scale,
                interpret=not use_pallas)
            return out.reshape(B, S, E).astype(q.dtype)
    if cfg.kv_h != H:
        # GQA prefill: broadcast KV to full heads and reuse the MHA
        # kernels — prefill is compute-bound, the repeat is S*kv_dim*(G-1)
        # extra bytes against O(S^2) flops; decode (where bytes dominate)
        # attends GROUPED over the un-repeated cache (_decode_body)
        g = H // cfg.kv_h
        k = jnp.repeat(k.reshape(B, S, cfg.kv_h, D), g, axis=2
                       ).reshape(B, S, E)
        v = jnp.repeat(v.reshape(B, S, cfg.kv_h, D), g, axis=2
                       ).reshape(B, S, E)
    if use_pallas and (D >= 128 or S >= 1024):
        from ..xsmm import build_kernel
        from ..xsmm.flags import FlashMhaKey

        key = FlashMhaKey(batch=B, seq=S, seq_kv=S, head_dim=D,
                          dtype=cfg.dtype, scale=scale, causal=True,
                          heads=H)
        return build_kernel(key)(q, k, v)

    def sp(t):
        return t.reshape(B, S, H, D)

    return composed_causal_attention(sp(q), sp(k), sp(v), scale).reshape(
        B, S, E).astype(q.dtype)


def _prefill_layer(x, blk, cfg: GptConfig, use_pallas: bool,
                   moe_stacked=None):
    """One pre-LN causal block over (B, S0, E); returns (x, k4, v4) with
    k4/v4 = this layer's (B, S0, kv_h, D) cache entries (un-repeated for
    GQA — the cache stores KV heads only)."""
    import jax
    import jax.numpy as jnp

    B, S0, _ = x.shape
    H, D = cfg.kv_h, cfg.head_dim
    i8 = cfg.int8_compute
    h = _block_norm(x, blk, "ln1", cfg)
    q = _dot(h, blk["wq"], blk["bq"], int8=i8)
    k = _dot(h, blk["wk"], blk["bk"], int8=i8)
    v = _dot(h, blk["wv"], blk["bv"], int8=i8)
    if cfg.rope:
        import jax.numpy as _jnp
        pos = _jnp.arange(S0)
        q = _rope(q.reshape(B, S0, cfg.heads, D), pos,
                  cfg.rope_theta).reshape(B, S0, -1)
        k = _rope(k.reshape(B, S0, H, D), pos,
                  cfg.rope_theta).reshape(B, S0, -1)
    a = _attention_full(q, k, v, cfg, use_pallas)
    x = x + _dot(a, blk["wo"], blk["bo"], int8=i8)
    h = _block_norm(x, blk, "ln2", cfg)
    if cfg.swiglu:
        act = (jax.nn.silu(_mm(h, blk["w1"], int8=i8))
               * _mm(h, blk["w3"], int8=i8)).astype(x.dtype)
        x = x + _mm(act, blk["w2"], int8=i8).astype(x.dtype)
    elif cfg.n_experts:
        E_ = x.shape[-1]
        x = x + _moe_ffn_prefill(h.reshape(B * S0, E_), blk, cfg,
                                 stacked=moe_stacked).reshape(B, S0, E_)
    else:
        # gelu rides _dot's fused epilogue on the int8 route; the
        # fallback applies the byte-identical legacy sequence
        h = _dot(h, blk["w1"], blk["b1"], int8=i8, unary="gelu")
        x = x + _dot(h, blk["w2"], blk["b2"], int8=i8)
    return x, k.reshape(B, S0, H, D), v.reshape(B, S0, H, D)


def make_prefill(cfg: GptConfig, use_pallas: bool | None = None):
    """Return jitted `prefill(params, ids) -> (logits, cache)`.

    ids: (B, S0) int32 prompt. logits: (B, S0, V) for every prompt
    position. cache: {"k","v"} (L, B, H, max_seq, D) with [0:S0) filled,
    plus "pos" = S0. With `stack_params` params the L blocks run under
    one `lax.scan` (L× smaller compile).

    Cache layout is per-head-contiguous (B, H, S, D): the decode-time
    KV read is the serving bandwidth bottleneck, and the (B, S, H, D)
    form made each head's matvec read D*2 = 128 contiguous bytes out of
    every H*D*2 (measured at ~26%% of HBM bandwidth inside the b8 decode
    loop, exp_decode_b8 r5); per-head-contiguous rows stream whole."""
    import jax
    import jax.numpy as jnp

    from ..utils.target import on_tpu

    if use_pallas is None:
        use_pallas = on_tpu()

    def prefill(params, ids):
        B, S0 = ids.shape
        x = _gather(params["wte"], ids)
        if not cfg.rope:
            x = x + _gather(params["wpe"], jnp.arange(S0))
        x = x.astype(_np_dtype(cfg.dtype))
        blocks = params["blocks"]
        if isinstance(blocks, dict):
            from .quant import QTensor

            hold_out = (bool(cfg.n_experts)
                        and cfg.moe_prefill_form == "grouped"
                        and cfg.moe_group_stacked
                        and not isinstance(blocks["w1"], QTensor))
            if hold_out:
                # grouped MoE: the stacked (L, n_e, ., .) expert tables
                # stay OUT of the scan xs — the grouped kernel indexes
                # the layer in its BlockSpec (no per-layer slab copy)
                w1f, w2f = blocks["w1"], blocks["w2"]
                rest = {kk: v for kk, v in blocks.items()
                        if kk not in ("w1", "w2")}

                def layer(x, inp):
                    blk, li = inp
                    x, k4, v4 = _prefill_layer(
                        x, blk, cfg, use_pallas,
                        moe_stacked=(w1f, w2f, li))
                    return x, (k4, v4)

                if cfg.remat:
                    # prevent_cse=False: lax.scan already isolates
                    # iterations, the guard only costs compile time
                    layer = jax.checkpoint(layer, prevent_cse=False)
                x, (ks, vs) = jax.lax.scan(
                    layer, x, (rest, jnp.arange(w1f.shape[0])))
            else:
                def layer(x, blk):
                    x, k4, v4 = _prefill_layer(x, blk, cfg, use_pallas)
                    return x, (k4, v4)

                if cfg.remat:
                    layer = jax.checkpoint(layer, prevent_cse=False)
                x, (ks, vs) = jax.lax.scan(layer, x, blocks)
        else:
            ks, vs = [], []
            for blk in blocks:
                x, k4, v4 = _prefill_layer(x, blk, cfg, use_pallas)
                ks.append(k4)
                vs.append(v4)
            ks, vs = jnp.stack(ks), jnp.stack(vs)

        if cfg.rms_norm:
            x = _rmsnorm(x, params["lnf_g"])
        else:
            x = _ln(x, params["lnf_g"], params["lnf_b"])
        logits = _dot(x, params["lm_head"], int8=cfg.int8_compute)

        # (L, B, S0, H, D) -> per-head-contiguous (L, B, H, S0, D)
        ks = jnp.transpose(ks, (0, 1, 3, 2, 4))
        vs = jnp.transpose(vs, (0, 1, 3, 2, 4))
        if cfg.kv_packed:
            # head-PAIR-contiguous (L, B, H/2, S0, 2D): adjacent heads
            # share a 128-lane group (see GptConfig.kv_packed)
            def pack(a):
                Lc, Bc, Hc, Sc, Dc = a.shape
                return a.reshape(Lc, Bc, Hc // 2, 2, Sc, Dc) \
                        .swapaxes(3, 4).reshape(Lc, Bc, Hc // 2, Sc,
                                                2 * Dc)
            ks, vs = pack(ks), pack(vs)
        pad = ((0, 0), (0, 0), (0, 0), (0, cfg.max_seq - S0), (0, 0))
        cache = {"pos": jnp.asarray(S0, jnp.int32)}
        if cfg.kv_quant == "int8":
            # int8 KV cache: per-(head, token) scales over D ride as two
            # extra (L, B, H, S) f32 arrays — 4 bytes next to D int8
            # payload bytes. The decode attention reads int8 from HBM
            # and folds the scales into the logits / softmax weights
            # (see _decode_body), never materializing a dequant slab.
            from .quant import quantize_tokens

            kq, ksc = quantize_tokens(ks)
            vq, vsc = quantize_tokens(vs)
            cache["k"] = jnp.pad(kq, pad)
            cache["v"] = jnp.pad(vq, pad)
            cache["k_s"] = jnp.pad(ksc, pad[:4])
            cache["v_s"] = jnp.pad(vsc, pad[:4])
        else:
            cache["k"] = jnp.pad(ks, pad)
            cache["v"] = jnp.pad(vs, pad)
        return logits, cache

    return jax.jit(prefill)


def _decode_body(params, cache, token, cfg: GptConfig, h_local: int,
                 tp_axis: str | None, kv_local: int | None = None):
    """One decode step over (possibly tp-local) params and cache. With
    tp_axis set, this runs INSIDE shard_map: q/k/v/fc1 are column-sharded
    (h_local heads, local fc1 columns), out-proj and fc2 are row-sharded
    with ONE psum each (the Megatron decode recipe); embeddings, LNs and
    the LM head are replicated."""
    import jax
    import jax.numpy as jnp

    D = cfg.head_dim
    scale = D ** -0.5
    B = token.shape[0]
    if kv_local is None:
        kv_local = h_local
    G = h_local // kv_local        # query heads per KV head (1 = MHA)
    pos = cache["pos"]
    # slotted = per-slot positions (continuous batching, serving/batching.py):
    # pos is (B,), each batch row sits at its own sequence position. The
    # scalar-pos trace below is byte-identical to the measured-fastest T=1
    # decode (PERF.md serving) — the slotted branches are additive only.
    slotted = getattr(pos, "ndim", 0) == 1
    x = _gather(params["wte"], token)
    if not cfg.rope:
        x = x + _gather(params["wpe"], pos)
    x = x.astype(_np_dtype(cfg.dtype))    # (B, E)
    # the cache is updated with dynamic_update_slice on the FULL stacked
    # (L, B, H, S, D) arrays — the canonical in-place KV pattern: XLA
    # aliases the buffer (donation / scan carry) instead of rebuilding the
    # whole cache from per-layer slices each token
    kv = {key: val for key, val in cache.items() if key != "pos"}
    quant_kv = cfg.kv_quant == "int8"
    if quant_kv:
        from .quant import quantize_tokens

    def row_parallel(a, w, b):
        """Row-sharded GEMM: local contraction (QTensor-aware — each
        shard dequant-scales its local partial, valid because the
        per-out-column scale distributes over the psum), psum over tp,
        bias once."""
        y = _mm(a, w)
        if tp_axis is not None:
            y = jax.lax.psum(y, tp_axis)
        return (y + b.astype(jnp.float32)).astype(a.dtype)

    def layer(x, blk, kv, li):
        """One decode block: write (k, v) at (li, pos) into the FULL
        stacked cache, attend over layer li's slab, MLP. Returns
        (x, kv). Operating on the full carried arrays is what
        keeps the update in place: a DUS on a scan xs-slice whose result
        feeds both the attention dot and the scan ys was measured at
        4.06 ms/tok (b8, GPT-2 small) — XLA materializes and copies the
        slab — vs 1.17 ms/tok for this carry form (exp_decode_carry.py,
        bit-identical logits)."""
        h = _block_norm(x, blk, "ln1", cfg)
        q = _dot(h, blk["wq"], blk["bq"]).reshape(B, h_local, D)
        k = _dot(h, blk["wk"], blk["bk"]).reshape(B, kv_local, D)
        v = _dot(h, blk["wv"], blk["bv"]).reshape(B, kv_local, D)
        if cfg.rope:
            # rotate at the CURRENT position; the cache holds
            # post-rotation keys, so no re-rotation on read
            q = _rope(q, pos, cfg.rope_theta)
            k = _rope(k, pos, cfg.rope_theta)
        if cfg.kv_packed:
            # head-pair packing: adjacent heads are contiguous in the
            # projection output, so the (B, H, D) -> (B, H/2, 2D)
            # reshape is free and matches the packed cache layout
            k = k.reshape(B, kv_local // 2, 2 * D)
            v = v.reshape(B, kv_local // 2, 2 * D)
        kv = dict(kv)
        if quant_kv:
            # int8 KV: quantize the written token per (batch, head) and
            # DUS payload + scale; dequant folds into the attention
            # below (scales multiply the logits / softmax weights), so
            # the slab reads from HBM at 1 byte per element.
            k, ksc = quantize_tokens(k)
            v, vsc = quantize_tokens(v)
        if slotted:
            # per-slot write positions, spelled as B chained per-slot
            # DUSes — NOT one batched scatter: a scatter RESULT feeding
            # the Pallas decode kernel cannot alias into the opaque
            # custom call, so XLA materialized a copy of the FULL
            # stacked cache per layer (measured 16.8 vs 1.1 ms/step at
            # the b8 serving geometry, slotted_r7.json); DUS outputs
            # alias fine (the scalar-pos path's spelling). Drop-mode
            # semantics for the free-slot sentinel (pos == max_seq) are
            # preserved by re-writing the OLD value at a clamped
            # position — bit-identical cache state.
            def write_slot(arr, new, b):
                pb = jnp.minimum(pos[b], cfg.max_seq - 1)
                start = (li, b, 0, pb) + (0,) * (arr.ndim - 4)
                sizes = (1, 1) + arr.shape[2:3] + (1,) + arr.shape[4:]
                old = jax.lax.dynamic_slice(arr, start, sizes)
                val = jnp.where(pos[b] >= cfg.max_seq, old,
                                new.reshape(sizes).astype(arr.dtype))
                return jax.lax.dynamic_update_slice(arr, val, start)

            for b in range(B):
                if quant_kv:
                    kv["k_s"] = write_slot(kv["k_s"], ksc[b], b)
                    kv["v_s"] = write_slot(kv["v_s"], vsc[b], b)
                kv["k"] = write_slot(kv["k"], k[b], b)
                kv["v"] = write_slot(kv["v"], v[b], b)
        else:
            if quant_kv:
                kv["k_s"] = jax.lax.dynamic_update_slice(
                    kv["k_s"], ksc[None, :, :, None], (li, 0, 0, pos))
                kv["v_s"] = jax.lax.dynamic_update_slice(
                    kv["v_s"], vsc[None, :, :, None], (li, 0, 0, pos))
            kv["k"] = jax.lax.dynamic_update_slice(
                kv["k"], k[None, :, :, None].astype(kv["k"].dtype),
                (li, 0, 0, pos, 0))
            kv["v"] = jax.lax.dynamic_update_slice(
                kv["v"], v[None, :, :, None].astype(kv["v"].dtype),
                (li, 0, 0, pos, 0))
        slab = (1,) + kv["k"].shape[1:]
        kc = jax.lax.dynamic_slice(
            kv["k"], (li, 0, 0, 0, 0), slab)[0]
        vc = jax.lax.dynamic_slice(
            kv["v"], (li, 0, 0, 0, 0), slab)[0]
        if quant_kv:
            sslab = (1,) + kv["k_s"].shape[1:]
            ksc_l = jax.lax.dynamic_slice(
                kv["k_s"], (li, 0, 0, 0), sslab)[0]   # (B, kv_local, S)
            vsc_l = jax.lax.dynamic_slice(
                kv["v_s"], (li, 0, 0, 0), sslab)[0]
        # composed decode attention: M=1 matvec over the cache —
        # HBM-bandwidth-bound, XLA's job (module docstring). Cache
        # operands stay in their storage dtype with f32 ACCUMULATION
        # (preferred_element_type) so no full-slab f32 casts materialize;
        # an int8 cache contracts cast to the activation dtype (the
        # convert fuses into the matvec's tiled operand read).
        ct = x.dtype if quant_kv else kc.dtype
        if slotted:
            live = jnp.arange(cfg.max_seq)[None] <= pos[:, None]  # (B, S)
            lv1, lvg = live[:, None], live[:, None, None]
        else:
            live = jnp.arange(cfg.max_seq) <= pos
            lv1, lvg = live[None, None], live[None, None, None]
        use_dk = False
        if cfg.decode_attn != "xla":
            from ..utils.target import current_target, on_tpu
            from ..xsmm.decode_attn import (DecodeAttnKey,
                                            build_decode_attn,
                                            decode_attn_fits)
            dk = DecodeAttnKey(batch=B, heads=kv_local, seq=cfg.max_seq,
                               head_dim=D, dtype=cfg.dtype,
                               slotted=slotted, groups=G,
                               stacked=kv["k"].shape[0],
                               kv_quant=quant_kv, pack2=cfg.kv_packed)
            fits = decode_attn_fits(dk, current_target().vmem_bytes)
            if cfg.kv_packed:
                # the packed layout exists only for the Pallas kernel
                assert fits, "kv_packed cache blocks exceed VMEM"
                use_dk = True
            elif cfg.decode_attn == "pallas":
                use_dk = True
            elif fits and on_tpu() and G == 1 and not quant_kv:
                # auto: the MHA bf16/f32 form is the measured win; two
                # variants stay OPT-IN after losing in-loop:
                # - GQA (groups > 1): llama kv4 b1 0.47 vs 0.42 ms/tok,
                #   b8 1.28 vs 0.62 (decode_form_gqa_r5.json) — the
                #   grouped q block shrinks the kernel's matvec to G
                #   rows per KV head while XLA batches the (B, G) panel;
                # - int8 KV: b1 1.63 vs 0.39, b8 15.2 vs 0.93
                #   (decode_form_int8kv_r5c.json) — the per-head grid
                #   the (S, 1) scale columns force (lane-padding VMEM
                #   OOM otherwise) serializes 96 small programs, and
                #   XLA's dequant-einsum already banks the int8 byte
                #   win (0.93 ms/tok ~ the unquantized kernel's 0.915).
                use_dk = True
        if use_dk:
            # the kernel reads the FULL stacked cache and indexes the
            # layer in its BlockSpec (scalar-prefetched li): feeding it
            # the kc/vc dynamic_slice instead makes XLA materialize the
            # slab copy (measured net-slower in-loop, decode_form_r5)
            if cfg.kv_packed:
                qk = q.reshape(B, kv_local // 2, 2 * D)
            else:
                qk = q if G == 1 else q.reshape(B, kv_local, G, D)
            a = build_decode_attn(dk, interpret=not on_tpu())(
                qk, kv["k"], kv["v"], pos, li,
                k_s=kv.get("k_s"), v_s=kv.get("v_s"))
            # (B, KVH[, G], D) f32
        elif G == 1:
            s = jnp.einsum("bhd,bhsd->bhs", q.astype(ct), kc.astype(ct),
                           preferred_element_type=jnp.float32) * scale
            if quant_kv:
                s = s * ksc_l
            s = jnp.where(lv1, s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            if quant_kv:
                # fold V's per-token scales into the softmax weights:
                # sum_s p_s (v_q[s] * vs_s) == sum_s (p_s * vs_s) v_q[s]
                p = p * vsc_l
            a = jnp.einsum("bhs,bhsd->bhd", p.astype(ct), vc.astype(ct),
                           preferred_element_type=jnp.float32)
        else:
            # GQA: query heads grouped per KV head (q head h -> kv head
            # h // G), attending over the UN-repeated cache — the KV
            # read, decode's dominant traffic, shrinks by G
            qg = q.reshape(B, kv_local, G, D)
            s = jnp.einsum("bkgd,bksd->bkgs", qg.astype(ct),
                           kc.astype(ct),
                           preferred_element_type=jnp.float32) * scale
            if quant_kv:
                s = s * ksc_l[:, :, None]
            s = jnp.where(lvg, s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            if quant_kv:
                p = p * vsc_l[:, :, None]
            a = jnp.einsum("bkgs,bksd->bkgd", p.astype(ct), vc.astype(ct),
                           preferred_element_type=jnp.float32)
        a = a.reshape(B, h_local * D).astype(x.dtype)
        x = x + row_parallel(a, blk["wo"], blk["bo"])
        h = _block_norm(x, blk, "ln2", cfg)
        if cfg.swiglu:
            import jax.nn as _jnn
            act = (_jnn.silu(_mm(h, blk["w1"]))
                   * _mm(h, blk["w3"])).astype(x.dtype)
            x = x + row_parallel(act, blk["w2"],
                                 jnp.zeros((), jnp.float32))
        elif cfg.n_experts:
            # bandwidth-policy dispatch: slice (b1) / stream-all (B*k
            # covers the expert table) / gather — see _moe_ffn_decode
            x = x + _moe_ffn_decode(h, blk, cfg)
        else:
            h = _dot(h, blk["w1"], blk["b1"])
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=False).astype(x.dtype)
            x = x + row_parallel(h, blk["w2"], blk["b2"])
        return x, kv

    blocks = params["blocks"]
    if isinstance(blocks, dict):
        # stacked params: one scan'd block body (L× smaller compile).
        # The FULL caches ride the scan CARRY (the canonical while-loop
        # in-place aliasing) with the layer index as an xs — measured
        # 3.5x faster than threading per-layer slices through xs/ys
        # (exp_decode_carry.py / exp_decode_bisect.py).
        def body(carry, inp):
            x, kv = carry
            blk, li = inp
            x, kv = layer(x, blk, kv, li)
            return (x, kv), None

        L = kv["k"].shape[0]
        (x, kv), _ = jax.lax.scan(
            body, (x, kv), (blocks, jnp.arange(L)))
    else:
        for li, blk in enumerate(blocks):
            x, kv = layer(x, blk, kv, li)
    if cfg.rms_norm:
        x = _rmsnorm(x, params["lnf_g"])
    else:
        x = _ln(x, params["lnf_g"], params["lnf_b"])
    logits = _dot(x, params["lm_head"])
    cache = dict(kv)
    cache["pos"] = pos + 1
    return logits, cache


def make_decode_step(cfg: GptConfig, donate: bool = False):
    """Return jitted `step(params, cache, token) -> (logits, cache)`.

    token: (B,) int32, the token at position cache["pos"]. logits: (B, V)
    for the NEXT position. One compiled step serves every position: the
    cache has static shape (L, B, kv_h, max_seq, D) and attention masks by
    position (positions > pos read as -inf). With donate=True the cache
    argument's buffers are donated so the update is in place (use in eager
    serving loops that rebind the cache each step; inside `lax.scan` the
    carry already aliases)."""
    import jax

    def step(params, cache, token):
        return _decode_body(params, cache, token, cfg, cfg.heads, None,
                            kv_local=cfg.kv_h)

    return jax.jit(step, donate_argnums=(1,) if donate else ())


def _gather_window(w, pos, T):
    """Rows [pos, pos+T) of an embedding table (dynamic start, static
    length) — QTensor-aware; returns f32."""
    import jax
    import jax.numpy as jnp

    from .quant import QTensor

    if isinstance(w, QTensor):
        q = jax.lax.dynamic_slice(w.q, (pos, 0), (T, w.q.shape[1]))
        s = jax.lax.dynamic_slice(w.scale, (pos, 0), (T, 1))
        return q.astype(jnp.float32) * s
    return jax.lax.dynamic_slice(
        w, (pos, 0), (T, w.shape[1])).astype(jnp.float32)


def make_extend(cfg: GptConfig, donate: bool = False):
    """Return jitted `extend(params, cache, tokens) -> (logits, cache)`:
    the MULTI-token decode — append T tokens at positions
    [pos, pos+T), attend each over the cache plus its causal prefix of
    the chunk, and return logits for all T positions.

    This is the serving primitive the single-token step can't express:
    - chunked prefill (ingest a long prompt in fixed-T chunks against a
      warm cache, one compile per chunk size). Scalar-pos caches only:
      the batch shares one position, so chunked admission runs at B=1
      BEFORE a slot insert (batching.py admits whole bucketed prompts
      instead; a per-slot-pos extend would need per-row windowed
      gathers and is not implemented);
    - speculative-decoding verification (score K drafted tokens in ONE
      pass — the weights are read once per K tokens instead of once per
      token, which is the whole win in the bandwidth-bound regime; see
      serving/speculative.py).

    T is static (one compiled program per chunk size). Composes with
    GQA, weight-only int8 (QTensor params) and the int8 KV cache.
    Kept separate from `_decode_body`: the T=1 path's einsum forms and
    carry layout are the measured-fastest decode (PERF.md serving) and
    stay byte-identical; extend generalizes the same design to T>1
    (the chunk dimension joins the query side of the attention)."""
    assert not cfg.kv_packed, \
        "make_extend reads the cache through the composed einsum path; " \
        "the packed (H/2, S, 2D) layout is decode-kernel only"
    import jax
    import jax.numpy as jnp

    from .quant import quantize_tokens

    H, D = cfg.heads, cfg.head_dim
    KVH = cfg.kv_h
    G = H // KVH
    scale = D ** -0.5
    quant_kv = cfg.kv_quant == "int8"

    def extend(params, cache, tokens):
        B, T = tokens.shape
        pos = cache["pos"]
        x = _gather(params["wte"], tokens)
        if not cfg.rope:
            x = x + _gather_window(params["wpe"], pos, T)[None]
        x = x.astype(_np_dtype(cfg.dtype))        # (B, T, E)
        kv = {key: val for key, val in cache.items() if key != "pos"}

        def layer(x, blk, kv, li, moe_stacked=None):
            h = _block_norm(x, blk, "ln1", cfg)
            q = _dot(h, blk["wq"], blk["bq"]).reshape(B, T, H, D)
            k = _dot(h, blk["wk"], blk["bk"]).reshape(B, T, KVH, D)
            v = _dot(h, blk["wv"], blk["bv"]).reshape(B, T, KVH, D)
            if cfg.rope:
                tpos = pos + jnp.arange(T)
                q = _rope(q, tpos, cfg.rope_theta)
                k = _rope(k, tpos, cfg.rope_theta)
            kv = dict(kv)
            # (B, T, KVH, D) -> the cache's per-head-contiguous
            # (B, KVH, T, D) before the positional write
            kt = jnp.transpose(k, (0, 2, 1, 3))
            vt = jnp.transpose(v, (0, 2, 1, 3))
            if quant_kv:
                kt, ksc = quantize_tokens(kt)
                vt, vsc = quantize_tokens(vt)
                kv["k_s"] = jax.lax.dynamic_update_slice(
                    kv["k_s"], ksc[None], (li, 0, 0, pos))
                kv["v_s"] = jax.lax.dynamic_update_slice(
                    kv["v_s"], vsc[None], (li, 0, 0, pos))
            kv["k"] = jax.lax.dynamic_update_slice(
                kv["k"], kt[None].astype(kv["k"].dtype),
                (li, 0, 0, pos, 0))
            kv["v"] = jax.lax.dynamic_update_slice(
                kv["v"], vt[None].astype(kv["v"].dtype),
                (li, 0, 0, pos, 0))
            slab = (1,) + kv["k"].shape[1:]
            kc = jax.lax.dynamic_slice(
                kv["k"], (li, 0, 0, 0, 0), slab)[0]
            vc = jax.lax.dynamic_slice(
                kv["v"], (li, 0, 0, 0, 0), slab)[0]
            ct = x.dtype if quant_kv else kc.dtype
            # query i sits at position pos+i: keys <= pos+i are live
            allow = (jnp.arange(cfg.max_seq)[None]
                     <= pos + jnp.arange(T)[:, None])          # (T, S)
            if G == 1:
                s = jnp.einsum("bthd,bhsd->bhts", q.astype(ct),
                               kc.astype(ct),
                               preferred_element_type=jnp.float32) * scale
                if quant_kv:
                    sslab = (1,) + kv["k_s"].shape[1:]
                    ksc_l = jax.lax.dynamic_slice(
                        kv["k_s"], (li, 0, 0, 0), sslab)[0]    # (B, H, S)
                    s = s * ksc_l[:, :, None]
                s = jnp.where(allow[None, None], s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                if quant_kv:
                    vsc_l = jax.lax.dynamic_slice(
                        kv["v_s"], (li, 0, 0, 0), sslab)[0]
                    p = p * vsc_l[:, :, None]
                a = jnp.einsum("bhts,bhsd->bthd", p.astype(ct),
                               vc.astype(ct),
                               preferred_element_type=jnp.float32)
            else:
                qg = q.reshape(B, T, KVH, G, D)
                s = jnp.einsum("btkgd,bksd->bkgts", qg.astype(ct),
                               kc.astype(ct),
                               preferred_element_type=jnp.float32) * scale
                if quant_kv:
                    sslab = (1,) + kv["k_s"].shape[1:]
                    ksc_l = jax.lax.dynamic_slice(
                        kv["k_s"], (li, 0, 0, 0), sslab)[0]    # (B, KVH, S)
                    s = s * ksc_l[:, :, None, None]
                s = jnp.where(allow[None, None, None], s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                if quant_kv:
                    vsc_l = jax.lax.dynamic_slice(
                        kv["v_s"], (li, 0, 0, 0), sslab)[0]
                    p = p * vsc_l[:, :, None, None]
                a = jnp.einsum("bkgts,bksd->btkgd", p.astype(ct),
                               vc.astype(ct),
                               preferred_element_type=jnp.float32)
            a = a.reshape(B, T, H * D).astype(x.dtype)
            x = x + _dot(a, blk["wo"], blk["bo"])
            h = _block_norm(x, blk, "ln2", cfg)
            if cfg.swiglu:
                act = (jax.nn.silu(_mm(h, blk["w1"]))
                       * _mm(h, blk["w3"])).astype(x.dtype)
                x = x + _mm(act, blk["w2"]).astype(x.dtype)
            elif cfg.n_experts:
                E_ = x.shape[-1]
                x = x + _moe_ffn_prefill(
                    h.reshape(B * T, E_), blk, cfg,
                    stacked=moe_stacked).reshape(B, T, E_)
            else:
                h = _dot(h, blk["w1"], blk["b1"])
                h = jax.nn.gelu(h.astype(jnp.float32),
                                approximate=False).astype(x.dtype)
                x = x + _dot(h, blk["w2"], blk["b2"])
            return x, kv

        blocks = params["blocks"]
        if isinstance(blocks, dict):
            from .quant import QTensor

            hold_out = (bool(cfg.n_experts)
                        and cfg.moe_prefill_form == "grouped"
                        and cfg.moe_group_stacked
                        and not isinstance(blocks["w1"], QTensor))
            if hold_out:   # see make_prefill: no per-layer slab copy
                w1f, w2f = blocks["w1"], blocks["w2"]
                blocks = {kk: v for kk, v in blocks.items()
                          if kk not in ("w1", "w2")}

            def body(carry, inp):
                x, kv = carry
                blk, li = inp
                x, kv = layer(x, blk, kv, li,
                              moe_stacked=(w1f, w2f, li) if hold_out
                              else None)
                return (x, kv), None

            L = kv["k"].shape[0]
            (x, kv), _ = jax.lax.scan(
                body, (x, kv), (blocks, jnp.arange(L)))
        else:
            for li, blk in enumerate(blocks):
                x, kv = layer(x, blk, kv, li)
        if cfg.rms_norm:
            x = _rmsnorm(x, params["lnf_g"])
        else:
            x = _ln(x, params["lnf_g"], params["lnf_b"])
        logits = _dot(x, params["lm_head"], int8=cfg.int8_compute)
        cache = dict(kv)
        cache["pos"] = pos + T
        return logits, cache

    return jax.jit(extend, donate_argnums=(1,) if donate else ())


def decode_param_specs(cfg: GptConfig, tp_axis: str = "tp",
                       stacked: bool = False, quantized: bool = False):
    """PartitionSpecs for tp decode: q/k/v and fc1 column-parallel (heads
    / fc1 columns on tp), out-proj and fc2 row-parallel; everything else
    replicated (same layout family as parallel/transformer.py). With
    stacked=True the block specs gain the leading (unsharded) layer dim
    to match `stack_params` layouts. With quantized=True the matmul
    weight specs are QTensor-structured (serving/quant.py): the int8
    payload shards like the weight; the (1, out) scale shards with the
    OUT dim for column-parallel weights and is replicated for
    row-parallel ones (out unsharded there)."""
    from jax.sharding import PartitionSpec as P

    from .quant import QTensor

    def col(spec_in=None):
        """Column-parallel weight (in, out) with out on tp."""
        w = P(spec_in, tp_axis)
        return QTensor(q=w, scale=P(None, tp_axis)) if quantized else w

    def row():
        """Row-parallel weight (in, out) with in on tp."""
        w = P(tp_axis, None)
        return QTensor(q=w, scale=P(None, None)) if quantized else w

    blk = {
        "ln1_g": P(),
        "wq": col(), "bq": P(tp_axis),
        "wk": col(), "bk": P(tp_axis),
        "wv": col(), "bv": P(tp_axis),
        "wo": row(), "bo": P(),
        "ln2_g": P(),
    }
    if not cfg.rms_norm:
        blk.update({"ln1_b": P(), "ln2_b": P()})
    if cfg.swiglu:
        blk.update({"w1": col(), "w3": col(), "w2": row()})
    elif cfg.n_experts:
        # MoE: experts replicated here (tp decode guards MoE off; these
        # specs serve the dp-only GPT train step — ep sharding of the
        # experts lives in parallel/moe.py)
        blk.update({"wr": P(), "w1": P(), "w2": P()})
    else:
        blk.update({"w1": col(), "b1": P(tp_axis),
                    "w2": row(), "b2": P()})

    def _prepend_layer_dim(s):
        return P(None, *s)

    if stacked:
        import jax

        blocks = jax.tree.map(
            _prepend_layer_dim, blk,
            is_leaf=lambda x: isinstance(x, P))
    else:
        blocks = [dict(blk) for _ in range(cfg.layers)]
    lm = P()
    if quantized:
        lm = QTensor(q=P(), scale=P())
    out = {
        "wte": P(),
        "blocks": blocks,
        "lnf_g": P(),
        "lm_head": lm,
    }
    if not cfg.rope:
        out["wpe"] = P()
    if not cfg.rms_norm:
        out["lnf_b"] = P()
    return out


def make_tp_decode_step(mesh, cfg: GptConfig, tp_axis: str = "tp",
                        stacked: bool = False, quantized: bool = False):
    """Tensor-parallel decode step over `mesh`: heads and the KV cache
    shard over tp (each device holds H/tp heads' cache — the KV cache is
    the serving memory bottleneck, so tp divides it), with one psum per
    row-parallel GEMM. Returns jitted `step(params, cache, token)`;
    params/cache must be laid out per `decode_param_specs` /
    `decode_cache_specs`."""
    import jax
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape[tp_axis]
    assert cfg.heads % tp == 0, (cfg.heads, tp)
    assert cfg.kv_h % tp == 0, \
        f"GQA tp decode needs kv_heads {cfg.kv_h} divisible by tp {tp}"
    assert not cfg.n_experts, \
        "tp decode does not shard MoE experts (use the ep-sharded MoE " \
        "in parallel/moe.py; Megatron-style expert sharding is future " \
        "work)"
    h_local = cfg.heads // tp
    kv_local = cfg.kv_h // tp

    def local_step(params, cache, token):
        return _decode_body(params, cache, token, cfg, h_local, tp_axis,
                            kv_local=kv_local)

    cache_specs = decode_cache_specs(cfg, tp_axis)
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(decode_param_specs(cfg, tp_axis, stacked, quantized),
                  cache_specs, P()),
        out_specs=(P(), cache_specs),
        check_vma=False)
    return jax.jit(sharded)


def decode_cache_specs(cfg: GptConfig, tp_axis: str = "tp"):
    """KV cache (L, B, kv_h, max_seq, D) shards the KV-heads dim over
    tp; an int8-quantized cache's (L, B, kv_h, max_seq) scale arrays
    shard the same head dim."""
    from jax.sharding import PartitionSpec as P

    kv = P(None, None, tp_axis, None, None)
    specs = {"k": kv, "v": kv, "pos": P()}
    if cfg.kv_quant == "int8":
        specs["k_s"] = P(None, None, tp_axis, None)
        specs["v_s"] = P(None, None, tp_axis, None)
    return specs


def make_sampler(temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 0.0):
    """Return `sample(logits (B, V), rng) -> (B,) i32`.

    temperature == 0 is greedy (top_k/top_p ignored). Otherwise logits are
    scaled by 1/temperature, then optionally truncated to the top_k largest
    and/or the smallest nucleus whose probability mass reaches top_p, and
    sampled categorically. All knobs are STATIC (baked into the trace): one
    compiled step per sampler config, none per position — the same
    static-shape discipline as the decode cache."""
    import jax
    import jax.numpy as jnp

    def sample(logits, rng):
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        x = logits.astype(jnp.float32) / temperature
        if top_k:
            kth = jax.lax.top_k(x, top_k)[0][..., -1:]
            x = jnp.where(x < kth, -jnp.inf, x)
        if top_p:
            # nucleus: keep the smallest prefix of the sorted distribution
            # reaching mass top_p (the first token is always kept)
            srt = jnp.sort(x, axis=-1)[..., ::-1]
            probs = jax.nn.softmax(srt, axis=-1)
            keep = jnp.cumsum(probs, axis=-1) - probs < top_p
            cut = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                          keepdims=True)
            x = jnp.where(x < cut, -jnp.inf, x)
        return jax.random.categorical(rng, x, axis=-1).astype(jnp.int32)

    return sample


def make_generate(cfg: GptConfig, steps: int,
                  temperature: float = 0.0, use_pallas: bool | None = None,
                  top_k: int = 0, top_p: float = 0.0):
    """Return jitted `generate(params, ids, rng) -> tokens (B, steps)`:
    prefill the prompt, then `steps` decode iterations under `lax.scan`
    (greedy when temperature == 0, else temperature / top-k / top-p
    sampling via `make_sampler`)."""
    import jax
    import jax.numpy as jnp

    prefill = make_prefill(cfg, use_pallas)
    step = make_decode_step(cfg)
    sample = make_sampler(temperature, top_k, top_p)

    def generate(params, ids, rng):
        logits, cache = prefill(params, ids)
        rng, sub = jax.random.split(rng)
        tok = sample(logits[:, -1], sub)

        def body(carry, _):
            cache, tok, rng = carry
            logits, cache = step(params, cache, tok)
            rng, sub = jax.random.split(rng)
            nxt = sample(logits, sub)
            return (cache, nxt, rng), tok

        (_, last, _), toks = jax.lax.scan(
            body, (cache, tok, rng), None, length=steps - 1)
        toks = jnp.moveaxis(toks, 0, 1)          # (B, steps-1)
        return jnp.concatenate([toks, last[:, None]], axis=1)

    return jax.jit(generate)
