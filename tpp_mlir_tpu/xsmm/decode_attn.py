"""Streaming decode-attention kernel: the single-token KV read at HBM
speed.

Decode attention is a batch of per-head matvecs over the KV cache — at
B=8 GPT-2-small geometry the slab is ~15.7 MB/layer and the op is pure
HBM bandwidth. Measured (r5, exp_decode_attn.py / exp_decode_b8.py):
XLA's batched-matvec emission over the (B, S, H, D) cache read at ~26%
of HBM bandwidth inside the decode loop (0.875 ms of a 1.22 ms b8
step); this kernel over the per-head-contiguous (B, H, S, D) layout
streams the whole slab once per batch row — grid (B,), K/V head-blocks
VMEM-resident, VPU mul + lane-reduce scores, masked softmax, sublane-
reduce AV — and measured 1.49x the pure-byte model (~67% of HBM bw),
a ~2.5x cut of the in-loop attention time.

No MXU: M=1 contractions cannot fill a systolic pass; the VPU IS the
right unit for a matvec, and the win is coalescing the read. Reference
analogue: none (the reference has no serving runtime, SURVEY.md §2);
this plays the role its BRGEMM plays for GEMMs — the hot-loop primitive
behind a dispatch key.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass(frozen=True)
class DecodeAttnKey:
    """Key for the single-token (T=1) decode-attention kernel.

    batch/heads/seq/head_dim: the (B, H, S, D) cache geometry (MHA:
    query heads == KV heads; GQA routes to the XLA einsum path).
    dtype: cache/query storage dtype. slotted: pos is (B,) per-row
    (continuous batching) instead of one scalar."""

    batch: int
    heads: int          # KV heads (== query heads when groups == 1)
    seq: int
    head_dim: int
    dtype: str = "bf16"
    slotted: bool = False
    # GQA: query heads per KV head. groups > 1 takes q as
    # (B, heads, groups, D) and attends each group over the shared
    # un-repeated KV head — the slab read (the cost) is identical to
    # MHA over `heads` heads.
    groups: int = 1
    # stacked > 0: K/V arrive as the FULL (L, B, H, S, D) cache and the
    # layer index rides scalar prefetch into the BlockSpec index_map.
    # Feeding a pallas call a dynamic_slice of the cache makes XLA
    # MATERIALIZE the (B, H, S, D) slab (a pallas call is an opaque
    # custom call — the slice cannot fuse in, unlike the einsum path);
    # measured in-loop r5 (decode_form_r5.json) that copy cost more
    # than the kernel's streaming win. In-kernel layer indexing reads
    # the cache buffer directly.
    stacked: int = 0
    # int8 KV cache: K/V payloads are int8 with per-(head, token) f32
    # scales over D (engine layout (L, B, H, S); the wrapper appends a
    # trailing unit dim so the scale column lands sublane-aligned next
    # to its (S, ·) score column). The kernel folds the K scale into
    # the logits and the V scale into the softmax weights — the slab
    # streams at 1 byte/element, halving decode attention's dominant
    # byte component (exp_decode_b8: the KV read IS the b8 bound).
    kv_quant: bool = False
    # pack2 (r5 verdict #4 A/B): at D = 64 each K/V row is 128 BYTES
    # (bf16) and lane-pads to half-empty vregs in VMEM; pack TWO
    # adjacent heads per 128-lane group — cache (B, H/2, S, 2D), q
    # (B, H/2, 2D) — so rows stream 256 bytes contiguous and VMEM holds
    # half the padded blocks. The per-pair scores are two masked lane
    # reductions (full-lane VPU ops only: lane-slice reshapes do not
    # lower, CLAUDE.md r3); softmax runs on the (S, 2) column pair and
    # the AV pass rebuilds a (S, 2D) weight panel from the two columns.
    # MHA, unquantized KV only.
    pack2: bool = False


def decode_attn_fits(key: DecodeAttnKey, vmem_bytes: int) -> bool:
    """VMEM gate: K + V blocks are double-buffered by Pallas (CLAUDE.md
    r3: budget 2x the naive block sum). Lane padding is REAL — a (S, 1)
    f32 scale column occupies S x 128 lanes in VMEM (measured OOM r5b:
    12 whole-H scale columns padded to 15.7 MB), so the int8 variant
    runs a per-head (B, H) grid and this gate models padded sizes."""
    pad = lambda d: -(-d // 128) * 128
    if key.kv_quant:
        # per-head blocks: K + V (S, D-padded) int8 + two (S, 128) f32
        # scale columns
        blocks = (2 * key.seq * pad(key.head_dim)
                  + 2 * key.seq * 128 * 4)
    else:
        dsz = 2 if key.dtype in ("bf16", "f16") else 4
        heads = key.heads // 2 if key.pack2 else key.heads
        dim = 2 * key.head_dim if key.pack2 else key.head_dim
        blocks = 2 * heads * key.seq * pad(dim) * dsz
    return 2 * blocks + (1 << 20) < int(vmem_bytes * 0.9)


def build_decode_attn(key: DecodeAttnKey, interpret: bool):
    """Return `fn(q, k (B,H,S,D), v (B,H,S,D), pos) -> f32 out` with
    the live mask `s <= pos` (pos scalar, or (B,) when key.slotted).

    groups == 1 (MHA): q (B, H, D) -> out (B, H, D).
    groups == G (GQA): q (B, H, G, D) -> out (B, H, G, D); the KV slab
    is read once per (b, kv-head) — same bytes as MHA, G cheap extra
    VPU columns."""
    B, H, S, D = key.batch, key.heads, key.seq, key.head_dim
    G = key.groups
    L = key.stacked
    scale = D ** -0.5
    if key.pack2:
        assert G == 1 and not key.kv_quant, "pack2 is MHA, bf16/f32 KV only"
        assert H % 2 == 0 and 2 * D <= 128, (H, D)
        Hs, Ds = H // 2, 2 * D      # packed slots: head pairs, 2D lanes
    else:
        Hs, Ds = H, D

    def _attend(qh, khb, vhb, live, ks=None, vs=None):
        """One head's matvec attention: qh (G, D), khb/vhb (S, D) f32,
        optional (S, 1) per-token dequant scale columns."""
        if G == 1:
            s = jnp.sum(khb * qh, axis=1, keepdims=True) * scale
        else:
            # (S, 1, D) * (1, G, D) -> reduce D -> (S, G)
            s = jnp.sum(khb[:, None, :] * qh[None], axis=2) * scale
        if ks is not None:
            # per-token K scale folds into the logits: the (S, 1)
            # scale column broadcasts over the G score columns
            s = s * ks
        s = jnp.where(live, s, -1e30)                      # (S, G)
        m = jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=0, keepdims=True)
        if vs is not None:
            # V's scale folds into the softmax weights:
            # sum_s p_s (v_q[s] vs_s) == sum_s (p_s vs_s) v_q[s]
            p = p * vs
        if G == 1:
            return jnp.sum(p * vhb, axis=0, keepdims=True)
        # (S, G, 1) * (S, 1, D) -> reduce S -> (G, D)
        return jnp.sum(p[:, :, None] * vhb[:, None, :], axis=0)

    def _attend_pair(qh, khb, vhb, live, ma, mb):
        """One packed head PAIR: qh (1, 2D), khb/vhb (S, 2D) f32 with
        head a on lanes [0, D) and head b on [D, 2D). Scores are two
        masked full-lane reductions (a lane-slice reshape does not
        lower); the AV pass rebuilds the (S, 2D) weight panel from the
        two softmax columns via the same masks."""
        prod = khb * qh
        sa = jnp.sum(prod * ma, axis=1, keepdims=True)
        sb = jnp.sum(prod * mb, axis=1, keepdims=True)
        s = jnp.concatenate([sa, sb], axis=1) * scale      # (S, 2)
        s = jnp.where(live, s, -1e30)
        m = jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=0, keepdims=True)
        w = p[:, 0:1] * ma + p[:, 1:2] * mb                # (S, 2D)
        return jnp.sum(w * vhb, axis=0, keepdims=True)     # (1, 2D)

    if key.kv_quant:
        # per-head (B, H) grid: the (S, 1) f32 scale columns pad their
        # lane dim to 128 in VMEM, so whole-H scale blocks cost
        # H*S*128*4 bytes double-buffered (measured scoped-vmem OOM at
        # GPT-2-small geometry, r5b) — per-head blocks keep the padding
        # to one column pair
        def kernel(pos_ref, *refs):
            if L:
                refs = refs[1:]   # li_ref: BlockSpec maps only
                lead = (0, 0, 0)  # (1,1,1,S,·) blocks
            else:
                lead = (0, 0)     # (1,1,S,·) blocks
            q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref = refs
            b = pl.program_id(0)
            p_live = pos_ref[b] if key.slotted else pos_ref[0]
            live = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
                    <= p_live)
            o_ref[0, 0] = _attend(
                q_ref[0, 0].astype(jnp.float32),
                k_ref[lead].astype(jnp.float32),
                v_ref[lead].astype(jnp.float32),
                live, ks_ref[lead], vs_ref[lead])
    else:
        def kernel(pos_ref, *refs):
            if L:
                refs = refs[1:]   # li_ref: BlockSpec maps only
                lead = (0, 0)     # (1,1,H,...) blocks
            else:
                lead = (0,)       # (1,H,...) blocks
            q_ref, k_ref, v_ref, o_ref = refs
            b = pl.program_id(0)
            p_live = pos_ref[b] if key.slotted else pos_ref[0]
            live = (jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
                    <= p_live)
            if key.pack2:
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, Ds), 1)
                ma = (lane < D).astype(jnp.float32)
                mb = 1.0 - ma
            for h in range(Hs):
                qh = q_ref[0, h].astype(jnp.float32)
                kb = k_ref[lead + (h,)].astype(jnp.float32)
                vb = v_ref[lead + (h,)].astype(jnp.float32)
                if key.pack2:
                    o_ref[0, h] = _attend_pair(qh, kb, vb, live, ma, mb)
                else:
                    o_ref[0, h] = _attend(qh, kb, vb, live)

    if key.kv_quant:
        if L:
            head = lambda b, h, pos, li: (b, h, 0, 0)
            slab = lambda b, h, pos, li: (li[0], b, h, 0, 0)
            in_specs = [
                pl.BlockSpec((1, 1, G, D), head),
                pl.BlockSpec((1, 1, 1, S, D), slab),
                pl.BlockSpec((1, 1, 1, S, D), slab),
                pl.BlockSpec((1, 1, 1, S, 1), slab),
                pl.BlockSpec((1, 1, 1, S, 1), slab),
            ]
            n_pref = 2
        else:
            head = lambda b, h, pos: (b, h, 0, 0)
            slab = lambda b, h, pos: (b, h, 0, 0)
            in_specs = [
                pl.BlockSpec((1, 1, G, D), head),
                pl.BlockSpec((1, 1, S, D), slab),
                pl.BlockSpec((1, 1, S, D), slab),
                pl.BlockSpec((1, 1, S, 1), slab),
                pl.BlockSpec((1, 1, S, 1), slab),
            ]
            n_pref = 1
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_pref,
            grid=(B, H),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, G, D), head),
        )
    elif L:
        slab = lambda b, pos, li: (li[0], b, 0, 0, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # (pos, layer index)
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Hs, G, Ds),
                             lambda b, pos, li: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, Hs, S, Ds), slab),
                pl.BlockSpec((1, 1, Hs, S, Ds), slab),
            ],
            out_specs=pl.BlockSpec((1, Hs, G, Ds),
                                   lambda b, pos, li: (b, 0, 0, 0)),
        )
    else:
        row = lambda b, pos: (b, 0, 0, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Hs, G, Ds), row),
                pl.BlockSpec((1, Hs, S, Ds), row),
                pl.BlockSpec((1, Hs, S, Ds), row),
            ],
            out_specs=pl.BlockSpec((1, Hs, G, Ds), row),
        )
    dsz = 1 if key.kv_quant else 2 if key.dtype in ("bf16", "f16") else 4
    scale_bytes = 2 * B * H * S * 4 if key.kv_quant else 0
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((B, Hs, G, Ds), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * G * S * D,
            bytes_accessed=2 * B * H * S * D * dsz + scale_bytes,
            transcendentals=B * H * G * S),
    )

    def fn(q, k, v, pos, li=None, k_s=None, v_s=None):
        pos = jnp.asarray(pos, jnp.int32).reshape(-1)   # (1,) or (B,)
        qq = q[:, :, None] if G == 1 else q
        extra = ()
        if key.kv_quant:
            assert k_s is not None and v_s is not None
            # trailing unit dim: the (S,) scale row becomes a sublane-
            # aligned (S, 1) column next to its (S, G) scores
            extra = (k_s[..., None].astype(jnp.float32),
                     v_s[..., None].astype(jnp.float32))
        if L:
            assert li is not None, "stacked form needs the layer index"
            li = jnp.asarray(li, jnp.int32).reshape(1)
            out = call(pos, li, qq, k, v, *extra)
        else:
            out = call(pos, qq, k, v, *extra)
        return out[:, :, 0] if G == 1 else out

    return fn
