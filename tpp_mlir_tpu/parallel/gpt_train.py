"""GPT training step: dp x tp Megatron sharding over the serving model
family (serving/engine.py), next-token cross-entropy, any optax
optimizer, optional ZeRO-1 — the training counterpart of the tp decode
path, sharing its parameter layout (`decode_param_specs`) so a model
trains and serves under the SAME pytree and PartitionSpecs.

Sharding (the Megatron transformer recipe, one psum per row GEMM):
  - batch over dp; grads pmean'd over dp after a dp-LOCAL loss;
  - q/k/v and fc1 column-parallel (heads / fc1 columns on tp),
    attention entirely local to each shard's heads, out-proj and fc2
    row-parallel with `row_parallel_psum`;
  - embeddings and LayerNorms replicated; the LM head replicated by
    default (logits tp-identical, plain CE) or — with
    `vocab_parallel=True` — column-sharded over the VOCAB with the
    Megatron vocab-parallel cross-entropy (`_vocab_parallel_loss`):
    the V×E head is the largest single tensor, and the loss assembles
    from per-shard partials without ever materializing full logits;
  - the layer stack runs under one `lax.scan` over stacked params
    (stack_params layout — the compile-size discipline of the serving
    engine, PERF.md).

Differentiation correctness under check_vma=False comes from the
custom-VJP collective duals in collectives.py (see that module: the
unchecked transposes over-count by the tp degree); every mode is pinned
to a single-device oracle in tests/parallel/test_gpt_train.py.

The reference framework has no training at all (SURVEY.md §2.12); this
is the beyond-parity "train the flagship family" piece, matching the
role torch+DDP plays around the reference's kernels in its
torch-dynamo benchmarks (/root/reference/benchmarks/config/pytorch/).
"""

from __future__ import annotations

from ..serving.engine import (GptConfig, _dot, _gather, _ln, _mm,
                              _moe_ffn_scan, _np_dtype,
                              composed_causal_attention)
from .collectives import mark_replicated, row_parallel_psum
from .optim import make_sharded_optim_step


def _gpt_forward_local(params, ids, cfg: GptConfig, tp_axis: str,
                       h_local: int, kv_local: int,
                       with_head: bool = True,
                       flash_attn: bool | None = None):
    """Per-tp-shard causal LM forward -> (B, S, V) logits (replicated
    over tp). Mirrors serving prefill math (_ln/_dot/f32 accumulate) so
    the step-0 loss is checkable against make_prefill logits.

    flash_attn: route attention through the Pallas flash training VJP
    (xsmm/flash_train.py — O(S·D) residuals instead of the (B,H,S,S)
    softmax the composed form's AD saves; the r7 bisect priced composed
    attention fwd+bwd at 34%% of the dense step). None = auto: on TPU
    when the whole-slab kernels fit VMEM."""
    import jax
    import jax.numpy as jnp

    B, S = ids.shape
    assert S <= cfg.max_seq, \
        f"sequence {S} exceeds max_seq {cfg.max_seq} (wpe table)"
    D = cfg.head_dim
    scale = D ** -0.5
    if flash_attn is None:
        from ..utils.target import current_target, on_tpu
        from ..xsmm.flash_train import FlashTrainKey, flash_train_fits

        flash_attn = on_tpu() and flash_train_fits(
            FlashTrainKey(batch=B, heads=h_local, seq=S, head_dim=D,
                          dtype=cfg.dtype),
            current_target().vmem_bytes)
    if flash_attn:
        from ..xsmm.flash_train import flash_attention_train as _attn
    else:
        _attn = composed_causal_attention
    x = (_gather(params["wte"], ids)
         + _gather(params["wpe"], jnp.arange(S))
         ).astype(_np_dtype(cfg.dtype))

    def layer(x, blk):
        h = _ln(x, blk["ln1_g"], blk["ln1_b"])
        # tp-replicated activation meets tp-sharded weights: mark, so
        # the partial cotangents psum back into the complete one
        h = mark_replicated(h, tp_axis)
        q = _dot(h, blk["wq"], blk["bq"]).reshape(B, S, h_local, D)
        k = _dot(h, blk["wk"], blk["bk"]).reshape(B, S, kv_local, D)
        v = _dot(h, blk["wv"], blk["bv"]).reshape(B, S, kv_local, D)
        a = _attn(q, k, v, scale)
        a = a.reshape(B, S, h_local * D).astype(x.dtype)
        y = row_parallel_psum(_mm(a, blk["wo"]), tp_axis)
        x = x + (y + blk["bo"].astype(jnp.float32)).astype(x.dtype)
        h = _ln(x, blk["ln2_g"], blk["ln2_b"])
        if cfg.n_experts:
            # sparse-expert FFN, the scan-over-experts form (exact, no
            # token dropping): straight-through differentiable — the
            # gates are softmax over top_k logits, the selection indices
            # carry no gradient (standard MoE training semantics).
            # Experts are tp-replicated (ep sharding is parallel/moe.py;
            # make_gpt_train_step guards tp == 1 for MoE configs).
            E_ = x.shape[-1]
            x = x + _moe_ffn_scan(h.reshape(B * S, E_), blk,
                                  cfg.top_k).reshape(B, S, E_)
        else:
            h = mark_replicated(h, tp_axis)
            h = _dot(h, blk["w1"], blk["b1"])
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=False).astype(x.dtype)
            y = row_parallel_psum(_mm(h, blk["w2"]), tp_axis)
            x = x + (y + blk["b2"].astype(jnp.float32)).astype(x.dtype)
        return x, None

    x, _ = jax.lax.scan(layer, x, params["blocks"])
    x = _ln(x, params["lnf_g"], params["lnf_b"])
    if not with_head:
        return x                                 # (B, S, E) pre-head
    return _mm(x, params["lm_head"])            # (B, S, V) f32


def next_token_loss(logits, ids):
    """Mean next-token cross-entropy: logits[:, t] scores ids[:, t+1]."""
    import jax
    import jax.numpy as jnp

    assert ids.shape[1] >= 2, \
        "next-token loss needs at least 2 tokens per sequence"
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def _vocab_parallel_loss(x, lm_head_local, ids, tp_axis: str, ntp: int):
    """Next-token CE with the LM head column-sharded over the VOCAB (the
    Megatron embedding-parallel recipe — the LM head is the single
    largest tensor, V×E). Numerically the standard stable log-softmax,
    assembled from per-shard partials with the collectives-dual
    discipline:

      - the global max shift is stop_gradient'ed (CE is exactly
        invariant to it, so cutting its gradient path is exact and
        avoids differentiating through pmax);
      - sum-exp and the picked-target logit are per-shard PARTIALS
        combined with row_parallel_psum (complete cotangent passes
        through to each shard's partial — see collectives.py).
    """
    import jax
    import jax.numpy as jnp

    from .collectives import (mark_replicated, pmax_stopgrad,
                              row_parallel_psum)

    x = mark_replicated(x, tp_axis)          # sliced contraction below
    logits = _mm(x[:, :-1], lm_head_local)   # (B, S-1, Vl) f32
    Vl = logits.shape[-1]
    shard = jax.lax.axis_index(tp_axis)
    m = pmax_stopgrad(jnp.max(logits, axis=-1), tp_axis)    # (B, S-1)
    z = logits - m[..., None]
    se = row_parallel_psum(jnp.sum(jnp.exp(z), axis=-1), tp_axis)
    tgt = ids[:, 1:]
    local = tgt - shard * Vl
    valid = (local >= 0) & (local < Vl)
    picked_part = jnp.where(
        valid,
        jnp.take_along_axis(z, jnp.clip(local, 0, Vl - 1)[..., None],
                            axis=-1)[..., 0],
        0.0)
    picked = row_parallel_psum(picked_part, tp_axis)
    return jnp.mean(jnp.log(se) - picked)


def make_gpt_train_step(mesh, cfg: GptConfig, optimizer,
                        dp_axis: str = "dp", tp_axis: str = "tp",
                        zero1: bool = False, donate: bool = False,
                        vocab_parallel: bool = False,
                        flash_attn: bool | None = None):
    """Return `(step, init_opt_state)`: jitted
    `step(params, opt_state, ids) -> (params, opt_state, loss)` over
    `mesh` for STACKED serving params (stack_params layout —
    train-and-serve under one pytree). vocab_parallel=True additionally
    column-shards the LM head over tp with the Megatron vocab-parallel
    cross-entropy (the V×E head is the largest single tensor)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..serving.engine import decode_param_specs

    ntp = mesh.shape[tp_axis]
    assert cfg.heads % ntp == 0, (cfg.heads, ntp)
    assert not (cfg.n_experts and ntp > 1), \
        "MoE GPT training shards experts over ep (parallel/moe.py), " \
        "not tp -- use a dp-only mesh"
    assert cfg.kv_h % ntp == 0, \
        f"GQA tp training needs kv_heads {cfg.kv_h} divisible by tp {ntp}"
    h_local = cfg.heads // ntp
    kv_local = cfg.kv_h // ntp
    pspecs = decode_param_specs(cfg, tp_axis, stacked=True)
    if vocab_parallel:
        assert cfg.vocab % ntp == 0, (cfg.vocab, ntp)
        pspecs = dict(pspecs)
        pspecs["lm_head"] = P(None, tp_axis)

    def local_grads(params, ids):
        def loss_fn(p):
            if vocab_parallel:
                x = _gpt_forward_local(p, ids, cfg, tp_axis, h_local,
                                       kv_local, with_head=False,
                                       flash_attn=flash_attn)
                return _vocab_parallel_loss(x, p["lm_head"], ids,
                                            tp_axis, ntp)
            logits = _gpt_forward_local(p, ids, cfg, tp_axis, h_local,
                                        kv_local, flash_attn=flash_attn)
            return next_token_loss(logits, ids)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return (jax.lax.pmean(loss, dp_axis),
                jax.tree.map(lambda g: jax.lax.pmean(g, dp_axis), grads))

    grads_fn = jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(pspecs, P(dp_axis, None)),
        out_specs=(P(), pspecs),
        check_vma=False)

    return make_sharded_optim_step(mesh, optimizer, pspecs, grads_fn,
                                   dp_axis, zero1, donate)
