"""LoRA / QLoRA fine-tuning for the serving GPT family (engine.py).

Low-rank adaptation (Hu et al., 2021): every targeted weight W gains a
trainable delta  W' = W + (alpha/r) * A @ B  with A: (in, r), B: (r, out)
and r << min(in, out). The base model stays FROZEN (stop_gradient), so a
train step's optimizer state and gradients are O(r * (in+out)) per
weight instead of O(in * out) — the production fine-tuning path.

QLoRA (Dettmers et al., 2023) falls out of the same code: when the base
weight is a quantized ``QTensor`` (serving/quant.py, int8/int4 payload),
the forward dequantizes it in-graph and adds the float delta — grads
flow to A/B only, the quantized payload is never touched. Fine-tune a
model whose base weights cost 1/2 (int8) or 1/4 (int4) the HBM of bf16.

Design notes (TPU-first):

  * Adapters mirror the params pytree shape-generically: a weight of
    shape (..., in, out) gets A: (..., in, r) and B: (..., r, out), so
    per-expert MoE weights (n_experts, E, F) and STACKED layer params
    (L, in, out) adapt transparently — `jnp.matmul` broadcasts the
    leading dims. Training therefore runs the stacked scan-over-layers
    forward (one block body in the HLO, the engine's compile-size
    discipline).
  * The train-step forward rebuilds merged weights IN-GRAPH each step
    (`merge_lora` under jit). XLA fuses dequant+add into the consumer
    matmul's operand read; nothing is persisted. For SERVING after
    training, `merge_lora` called eagerly bakes the deltas in once and
    the result runs every engine path (decode/extend/tp) unchanged.
  * Default targets ("wq", "wv") follow the LoRA paper; "all" targets
    every 2-D+ matmul weight in the blocks.

The reference framework has no training (SURVEY.md §2.12); this extends
the beyond-parity training stack (parallel/gpt_train.py) with the
parameter-efficient path that torch+peft plays around the reference's
kernels in its torch-dynamo benchmark family
(/root/reference/benchmarks/config/pytorch/).
"""

from __future__ import annotations

ALL_TARGETS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def _weight_shape(w):
    """Shape of a base weight, seeing through QTensor (payload shape)."""
    from .quant import QTensor

    return tuple((w.q if isinstance(w, QTensor) else w).shape)


def _dense(w):
    """Base weight as a float array (dequantized if QTensor)."""
    from .quant import QTensor, dequantize

    return dequantize(w) if isinstance(w, QTensor) else w


def lora_init(params, rank: int = 8, targets=("wq", "wv"),
              seed: int = 0, dtype=None):
    """Zero-delta adapters for every targeted block weight.

    A ~ N(0, in**-1) (so A@x has unit-ish scale), B = 0 — the standard
    LoRA init: the first forward is exactly the base model. Returns
    {"blocks": [{name: {"a": A, "b": B}} per layer]} matching the
    stacked/unstacked layout of ``params``.
    """
    import jax
    import jax.numpy as jnp

    if targets == "all":
        targets = ALL_TARGETS
    dt = dtype or jnp.float32
    blocks = params["blocks"]
    stacked = isinstance(blocks, dict)
    blks = [blocks] if stacked else blocks
    key = jax.random.PRNGKey(seed)
    out = []
    for blk in blks:
        ad = {}
        for name in targets:
            if name not in blk:
                continue
            shp = _weight_shape(blk[name])
            if len(shp) < 2:
                continue
            key, ka = jax.random.split(key)
            a = (jax.random.normal(ka, shp[:-1] + (rank,), jnp.float32)
                 * (shp[-2] ** -0.5)).astype(dt)
            b = jnp.zeros(shp[:-2] + (rank, shp[-1]), dt)
            ad[name] = {"a": a, "b": b}
        assert ad, f"no LoRA targets {targets} found in block {list(blk)}"
        out.append(ad)
    return {"blocks": out[0] if stacked else out}


def merge_lora(params, adapters, alpha: float = 16.0, train: bool = False):
    """Params with every adapted weight replaced by W + (alpha/r)·A@B.

    ``train=True`` stop-gradients the BASE leaves so AD reaches only the
    adapters (the LoRA freeze); eager callers (bake-in for serving) use
    the default. QTensor bases dequantize to float in the merged tree —
    re-run quantize_params afterwards to serve the merged model low-bit.
    """
    import jax
    import jax.numpy as jnp

    freeze = jax.lax.stop_gradient if train else (lambda x: x)
    blocks = params["blocks"]
    stacked = isinstance(blocks, dict)
    blks = [blocks] if stacked else blocks
    ads = [adapters["blocks"]] if stacked else adapters["blocks"]
    assert len(blks) == len(ads), (len(blks), len(ads))
    merged = []
    for blk, ad in zip(blks, ads):
        nb = {}
        for name, w in blk.items():
            w = jax.tree.map(freeze, w)
            if name in ad:
                a = ad[name]["a"].astype(jnp.float32)
                b = ad[name]["b"].astype(jnp.float32)
                scale = alpha / a.shape[-1]
                base = _dense(w).astype(jnp.float32)
                nb[name] = (base + scale * (a @ b)).astype(
                    _dense(w).dtype if not hasattr(w, "scale") else base.dtype)
            else:
                nb[name] = w
        merged.append(nb)
    out = {k: (jax.tree.map(freeze, v) if k != "blocks" else None)
           for k, v in params.items()}
    out["blocks"] = merged[0] if stacked else merged
    return out


def make_lora_train_step(cfg, optimizer, alpha: float = 16.0,
                         use_pallas: bool | None = None):
    """(step, init) for adapter-only training.

    step(params, adapters, opt_state, ids) -> (adapters, opt_state, loss)
    with next-token CE over the engine prefill forward. ``params`` (the
    frozen base — float or QTensor) rides through as a non-differentiated
    argument; only the adapters and their O(r)-sized optimizer state
    update. jit-compiled; stacked params recommended (scan'd forward).
    """
    import functools

    import jax

    from ..parallel.gpt_train import next_token_loss
    from .engine import make_prefill

    prefill = make_prefill(cfg, use_pallas=use_pallas)

    def loss_fn(adapters, params, ids):
        merged = merge_lora(params, adapters, alpha=alpha, train=True)
        logits, _ = prefill(merged, ids)
        return next_token_loss(logits, ids)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def step(params, adapters, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(adapters, params, ids)
        updates, opt_state = optimizer.update(grads, opt_state, adapters)
        import optax
        return optax.apply_updates(adapters, updates), opt_state, loss

    def init(adapters):
        return optimizer.init(adapters)

    return step, init
