"""Weight-only int8 quantization for the serving engine.

Decode is HBM-bandwidth-bound (PERF.md "serving": every token re-reads
all matmul weights; M=1 leaves the MXU idle), so halving the weight
bytes is worth ~2x tokens/s at small batch — the classic weight-only
int8 serving recipe. TPU-native design:

- Per-output-channel SYMMETRIC int8: for a weight W (in, out) used as
  `x @ W`, each output column gets scale = max|col| / 127 and stores
  round(col / scale) as int8. Columns are the non-contracted dim, so
  the scale factors out of the contraction EXACTLY:
      x @ (q * scale) == (x @ q) * scale   (per-column scale)
  and the engine computes the right-hand form — the dequantized weight
  matrix is never materialized. XLA fuses the s8->compute-dtype convert
  into the dot's operand read (tiled, in VMEM), so HBM sees int8 bytes.
- `QTensor` is a NamedTuple, hence automatically a JAX pytree node:
  quantized params flow through `jax.jit`, `lax.scan` carries/xs,
  `shard_map` in_specs, `jnp.stack` leaf-stacking (`stack_params`) and
  checkpointing with no special cases.
- Quantization error is bounded per element by scale/2 (round-to-
  nearest): |W - dequantize(quantize(W))| <= max|col| / 254.

The reference framework has no quantized path (its integer support is
layout-testing init only, TensorInitInt.h) — this is a beyond-parity
serving feature; the bandwidth analysis matches the decode-roof
methodology in scripts/bench_serving.py.
"""

from __future__ import annotations

from typing import NamedTuple


class QTensor(NamedTuple):
    """Symmetric per-output-channel int8 weight: ``q * scale`` recovers
    the weight. ``q`` is int8 with the original shape; ``scale`` is f32
    with the contraction (second-to-last) dim collapsed to 1 so it
    broadcasts against the matmul RESULT: (in, out) -> (1, out),
    stacked (L, in, out) -> (L, 1, out)."""

    q: object       # int8 array, original weight shape
    scale: object   # f32 array, shape[..., 1, out]


def quantize(w, axis: int = -2, bits: int = 8):
    """Quantize one weight matrix per-output-channel along ``axis`` (the
    contraction/in dim; default -2 for (in, out) layouts).

    bits: 8 (int8, qmax 127) or 4 (int4, qmax 7 — XLA:TPU stores int4
    PACKED in HBM, so the weight read drops to half a byte per element;
    per-channel int4 is coarse — max abs err max|col|/14 — acceptable
    for bandwidth experiments, production int4 wants finer groups)."""
    import jax.numpy as jnp

    assert bits in (8, 4), bits
    qmax = {8: 127.0, 4: 7.0}[bits]
    dt = {8: jnp.int8, 4: jnp.int4}[bits]
    wf = jnp.asarray(w).astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / qmax, 1.0)
    # round-to-nearest in int8 precision first: jnp.round->astype(int4)
    # would wrap values outside [-8, 7] from fp rounding at the clip edge
    q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(dt)
    return QTensor(q=q, scale=scale)


def dequantize(t):
    """Materialize the f32 weight (tests / oracles only — the engine
    never does this)."""
    import jax.numpy as jnp

    if not isinstance(t, QTensor):
        return t
    return t.q.astype(jnp.float32) * t.scale


# Block weight names that are matmul operands (quantized); LNs and
# biases stay in the model dtype — they are O(E) bytes, irrelevant to
# bandwidth and precision-critical.
_BLOCK_MATMUL_KEYS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def quantize_params(params, include_embed: bool = False, bits: int = 8):
    """Quantize every block matmul weight + the LM head of a serving
    params pytree (engine.init_params / params_from_torch layouts,
    stacked or unstacked). ``include_embed`` also quantizes wte/wpe
    (gather-only traffic: saves memory footprint, not decode bandwidth;
    wte uses per-ROW scales since rows are gathered). ``bits``: 8 or 4
    (see `quantize`).

    Returns a new pytree in which quantized leaves are QTensor nodes —
    everything downstream (jit/scan/shard_map/stack_params) treats them
    as ordinary pytree structure."""
    out = dict(params)

    def qblock(blk):
        b = dict(blk)
        moe = "wr" in b
        for k in _BLOCK_MATMUL_KEYS:
            if k not in b:
                continue
            if moe and k in ("w1", "w2"):
                # MoE expert stacks (n_e, E, F) are not quantized in v1:
                # the expert einsum paths read raw arrays (attention
                # weights + the lm_head still quantize; the router is
                # O(E*n_e), irrelevant to bandwidth)
                continue
            b[k] = quantize(b[k], bits=bits)
        return b

    blocks = params["blocks"]
    if isinstance(blocks, dict):     # stacked (L, in, out): axis=-2 = in
        out["blocks"] = qblock(blocks)
    else:
        out["blocks"] = [qblock(blk) for blk in blocks]
    out["lm_head"] = quantize(params["lm_head"], bits=bits)
    if include_embed:
        # embeddings are GATHERED by row -> per-row scales (axis=-1)
        out["wte"] = quantize(params["wte"], axis=-1, bits=bits)
        if "wpe" in params:     # absent under RoPE
            out["wpe"] = quantize(params["wpe"], axis=-1, bits=bits)
    return out


def dequantize_params(params):
    """Undo quantize_params (f32 leaves where QTensors were) — for
    differential tests: the full-precision engine on dequantized params
    must match the quantized engine bit-for-tolerance."""
    import jax

    return jax.tree.map(dequantize, params,
                        is_leaf=lambda x: isinstance(x, QTensor))


def quantize_tokens(x, axis: int = -1):
    """Per-token symmetric int8 over ``axis`` (default: the trailing
    head_dim) — the KV-cache form: each written (token, head) vector gets
    its own scale, so cache error tracks the token's own magnitude.
    Returns (q int8 with x's shape, scale f32 with ``axis`` dropped)."""
    import jax.numpy as jnp

    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(xf / jnp.expand_dims(scale, axis)).astype(jnp.int8)
    return q, scale


def quantized_bytes(params):
    """Total parameter bytes as stored — the decode bandwidth
    denominator. int8 leaves count 1 byte; int4 counts HALF a byte
    (XLA:TPU packs two int4 per byte in HBM; host-side emulation may
    report itemsize 1, which would overstate the read)."""
    import jax
    import jax.numpy as jnp

    def nbytes(x):
        if x.dtype == jnp.int4:
            return x.size * 0.5
        return x.size * x.dtype.itemsize

    return int(sum(nbytes(x) for x in jax.tree.leaves(params)))
