#!/usr/bin/env python
"""Bisect the DENSE GPT training step (r7).

moe_bisect2_r6 measured dense training at the production geometry
(B8 s512 L12 bf16) at 43.8 ms/step = 37.8% of the 3x-forward useful
roof, and that rate bounds every training claim in the repo (the MoE
known-gap ledger prices against it). Nothing has decomposed WHERE the
dense backward goes. Rows (all one run, slope-timed scan of
grad+SGD-update steps, params in the carry):

  full        the reference step (prefill fwd + CE + grad + SGD)
  fwd_loss    forward + CE only (no grad): the fwd cost
  grad_only   grad but no update: prices the SGD tree_map
  head_zero   loss = mean(pre-head x^2), lm_head never touched:
              full - head_zero = LM head fwd+bwd + CE cost
  ce_fused    CE via in-graph lse - picked (no (B,S,V) log_softmax
              materialization): prices the standard-CE spelling
  attn_id     attention replaced by v passthrough: full - attn_id =
              composed causal attention fwd+bwd cost
  attn_remat  jax.checkpoint around the attention einsums: backward
              recomputes scores/softmax instead of saving the
              (B,H,S,S) f32 intermediates — trades ~7.5% extra flops
              for ~200 MB/layer of saved-residual traffic
  adam        adamw update instead of SGD: optimizer-state traffic

Useful-roof accounting matches moe_bisect2: 3 x forward flops over the
calibrated peak."""

from __future__ import annotations

import argparse
import functools
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json",
                   default="benchmarks/results/train_bisect_r7.json")
    p.add_argument("--platform", default="")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--rows", default="",
                   help="comma list to restrict (default: all)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import GptConfig, init_params, stack_params
    from tpp_mlir_tpu.serving.engine import (_dot, _gather, _ln, _mm,
                                             _np_dtype,
                                             composed_causal_attention)
    from tpp_mlir_tpu.utils.target import roofline_flops

    if args.tiny:
        base = dict(vocab=128, embed=64, heads=4, mlp_ratio=2,
                    max_seq=64, dtype="f32")
        B, s0, pair, L = 2, 16, (2, 6), 2
    else:
        base = dict(vocab=50304, embed=768, heads=12, mlp_ratio=4,
                    max_seq=512, dtype="bf16")
        B, s0, pair, L = 8, 512, (2, 6), 12
    cfg = GptConfig(layers=L, **base)
    roof = roofline_flops(base["dtype"]) / 1e12
    E, D = cfg.embed, cfg.head_dim
    V, F = cfg.vocab, cfg.mlp_ratio * cfg.embed
    T = B * s0
    # forward flops (GEMMs only, the useful-flops convention)
    fwd = 2 * T * (4 * E * E + 2 * E * F) * L + 2 * T * E * V \
        + 2 * B * cfg.heads * s0 * s0 * D * 2 * L
    use = 3 * fwd / 1e12

    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab, (B, s0)), jnp.int32)
    params = stack_params(init_params(cfg, seed=0))

    def slope(run_n, *a):
        for attempt in range(3):
            try:
                float(jnp.sum(run_n(*a, pair[0])))
                float(jnp.sum(run_n(*a, pair[1])))
                break
            except Exception as e:
                if attempt == 2:
                    raise
                print(f"retry: {type(e).__name__}", flush=True)
                time.sleep(15)
        out = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(run_n(*a, pair[0])))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(run_n(*a, pair[1])))
            tl = time.perf_counter() - t0
            out.append((tl - ts) / (pair[1] - pair[0]))
        out.sort()
        return out[len(out) // 2]

    rows = {}
    results = {"B": B, "s0": s0, "layers": L, "useful_tf_per_step": use,
               "rows": rows}

    def emit(name, sec, note=""):
        pct = 100 * use / roof / sec
        rows[name] = {"ms": round(sec * 1e3, 3),
                      "pct_useful_roof": round(pct, 1)}
        if note:
            rows[name]["note"] = note
        print(f"{name:10s}: {sec * 1e3:8.3f} ms  {pct:5.1f}% {note}",
              flush=True)
        if args.json:
            json.dump(results, open(args.json, "w"), indent=1)

    dt = _np_dtype(cfg.dtype)

    def forward(p, ids, attn="full", with_head=True):
        """Serving-prefill math (stacked scan), with intercepts."""
        x = (_gather(p["wte"], ids)
             + _gather(p["wpe"], jnp.arange(ids.shape[1]))).astype(dt)
        scale = D ** -0.5

        def layer(x, blk):
            h = _ln(x, blk["ln1_g"], blk["ln1_b"])
            q = _dot(h, blk["wq"], blk["bq"])
            k = _dot(h, blk["wk"], blk["bk"])
            v = _dot(h, blk["wv"], blk["bv"])
            if attn == "id":
                a = v
            else:
                if attn == "flash":
                    from tpp_mlir_tpu.xsmm.flash_train import \
                        flash_attention_train

                    def fn(q, k, v, s, c):
                        return flash_attention_train(q, k, v, s, c)
                else:
                    fn = composed_causal_attention
                    if attn == "remat":
                        fn = jax.checkpoint(fn, static_argnums=(4,))
                a = fn(q.reshape(B, s0, cfg.heads, D),
                       k.reshape(B, s0, cfg.heads, D),
                       v.reshape(B, s0, cfg.heads, D), scale, True
                       ).reshape(B, s0, E).astype(x.dtype)
            x = x + _dot(a, blk["wo"], blk["bo"])
            h = _ln(x, blk["ln2_g"], blk["ln2_b"])
            h = _dot(h, blk["w1"], blk["b1"], unary="gelu")
            x = x + _dot(h, blk["w2"], blk["b2"])
            return x, None

        x, _ = jax.lax.scan(layer, x, p["blocks"])
        x = _ln(x, p["lnf_g"], p["lnf_b"])
        if not with_head:
            return x
        return _mm(x, p["lm_head"])

    def ce_standard(logits, ids):
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(
            lp, ids[:, 1:][..., None], -1))

    def ce_fused(logits, ids):
        # lse - picked: no (B, S, V) log-probability materialization
        z = logits[:, :-1].astype(jnp.float32)
        lse = jax.nn.logsumexp(z, axis=-1)
        picked = jnp.take_along_axis(z, ids[:, 1:][..., None], -1)[..., 0]
        return jnp.mean(lse - picked)

    def make_step(loss_fn, update="sgd", grad=True):
        gf = jax.grad(loss_fn) if grad else None

        def poison(p, val):
            # iteration i+1 must depend on iteration i's OUTPUT or XLA
            # hoists the whole body out of the scan (negative slopes);
            # tanh defeats algebraic zero-folding (runtime/perf.py)
            p = dict(p)
            p["lnf_g"] = p["lnf_g"] + (
                1e-30 * jnp.tanh(val)).astype(p["lnf_g"].dtype)
            return p

        @functools.partial(jax.jit, static_argnums=2)
        def run_n(p, ids, n):
            def body(p, _):
                if not grad:
                    loss = loss_fn(p, ids)
                    return poison(p, loss), loss
                g = gf(p, ids)
                if update == "none":
                    # the poison must keep the WHOLE backward live: a
                    # layer-0 weight grad forces backprop through every
                    # layer (lnf_g alone let XLA prune the layer bwd —
                    # r7c measured 13.7 ms "grad_only", which was
                    # fwd + head bwd only)
                    gs = (jnp.sum(g["lnf_g"].astype(jnp.float32))
                          + jnp.sum(g["blocks"]["w1"][0, 0, :8]
                                    .astype(jnp.float32))
                          + jnp.sum(g["wte"][0, :8].astype(jnp.float32)))
                    return poison(p, gs), gs
                p = jax.tree_util.tree_map(
                    lambda pi, gi: (pi - 1e-4 * gi.astype(jnp.float32))
                    .astype(pi.dtype), p, g)
                return p, jnp.sum(p["lnf_g"].astype(jnp.float32))
            _, sums = jax.lax.scan(body, p, None, length=n)
            return sums
        return run_n

    want = set(t.strip() for t in args.rows.split(",") if t.strip())

    def on(name):
        return not want or name in want

    if on("full"):
        step = make_step(lambda p, i: ce_standard(forward(p, i), i))
        emit("full", slope(step, params, ids), "(reference)")
    if on("fwd_loss"):
        step = make_step(lambda p, i: ce_standard(forward(p, i), i),
                         grad=False)
        emit("fwd_loss", slope(step, params, ids), "(no grad)")
    if on("grad_only"):
        step = make_step(lambda p, i: ce_standard(forward(p, i), i),
                         update="none")
        emit("grad_only", slope(step, params, ids), "(no SGD update)")
    if on("head_zero"):
        step = make_step(
            lambda p, i: jnp.mean(jnp.square(
                forward(p, i, with_head=False).astype(jnp.float32))))
        emit("head_zero", slope(step, params, ids),
             "(no lm_head, no CE)")
    if on("ce_fused"):
        step = make_step(lambda p, i: ce_fused(forward(p, i), i))
        emit("ce_fused", slope(step, params, ids),
             "(lse - picked spelling)")
    if on("attn_id"):
        step = make_step(
            lambda p, i: ce_standard(forward(p, i, attn="id"), i))
        emit("attn_id", slope(step, params, ids),
             "(attention = v passthrough; flops model unchanged)")
    if on("attn_remat"):
        step = make_step(
            lambda p, i: ce_standard(forward(p, i, attn="remat"), i))
        emit("attn_remat", slope(step, params, ids),
             "(checkpoint'd attention: bwd recomputes scores)")
    if on("attn_flash"):
        step = make_step(
            lambda p, i: ce_standard(forward(p, i, attn="flash"), i))
        emit("attn_flash", slope(step, params, ids),
             "(Pallas flash training VJP, xsmm/flash_train.py)")
    if on("adam"):
        import optax

        opt = optax.adamw(1e-4)
        ostate = opt.init(params)
        gf = jax.grad(lambda p, i: ce_standard(forward(p, i), i))

        @functools.partial(jax.jit, static_argnums=3)
        def run_adam(p, o, ids, n):
            def body(carry, _):
                p, o = carry
                g = gf(p, ids)
                up, o = opt.update(g, o, p)
                p = optax.apply_updates(p, up)
                return (p, o), jnp.sum(p["lnf_g"].astype(jnp.float32))
            (_, _), sums = jax.lax.scan(body, (p, o), None, length=n)
            return sums
        emit("adam", slope(run_adam, params, ostate, ids),
             "(adamw update)")

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
