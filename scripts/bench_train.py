#!/usr/bin/env python
"""Training-step benchmark: fwd+bwd+SGD of the canonical MLP chain
through the custom-VJP Pallas kernels (ops/trainable.py,
parallel/train.py) on a single-chip dp=1 mesh.

Flop accounting: per layer fwd 2MNK + dgrad 2MNK + wgrad 2MNK = 3x the
inference flops (bias/relu/update flops excluded — same convention as
bench.py). Timing: params feed back through the scan carry (the SGD
update is a real cross-iteration dependency), slope between two scan
lengths, median of --reps.

Usage:
  python scripts/bench_train.py                    # real TPU
  python scripts/bench_train.py --tiny --platform cpu
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default="")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--gpt", action="store_true",
                   help="also run the GPT-2-small-class train step "
                        "(parallel/gpt_train.py: fwd+bwd+adamw through "
                        "the scan'd transformer stack)")
    p.add_argument("--json", default="")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.parallel import make_mesh
    from tpp_mlir_tpu.parallel.train import make_train_step, mlp_init
    from tpp_mlir_tpu.utils.target import current_target, roofline_flops

    if args.tiny:
        rows = [("f32", 32, (64, 64, 64, 64))]
        n1, n2 = 4, 12
    else:
        rows = [("f32", 256, (1024,) * 4),
                ("bf16", 256, (1024,) * 4),
                ("bf16", 2048, (1024,) * 4)]
        n1, n2 = 200, 1000

    mesh = make_mesh({"dp": 1, "tp": 1})
    tgt = current_target()
    results = {"target": tgt.name}
    for dtype, batch, layers in rows:
        dt = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype]
        params = jax.tree.map(
            lambda a: a.astype(dt), mlp_init(layers, seed=0))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(batch, layers[0])), dt)
        y = jnp.asarray(rng.normal(size=(batch, layers[-1])), dt)
        step = make_train_step(mesh, layers)

        @functools.partial(jax.jit, static_argnums=3)
        def run_n(params, x, y, n):
            def body(params, _):
                params, loss = step(params, x, y)
                return params, loss
            params, losses = jax.lax.scan(body, params, None, length=n)
            return losses

        float(jnp.sum(run_n(params, x, y, n1)))   # compile, excluded
        float(jnp.sum(run_n(params, x, y, n2)))
        slopes = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(run_n(params, x, y, n1)))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(run_n(params, x, y, n2)))
            tl = time.perf_counter() - t0
            slopes.append((tl - ts) / (n2 - n1))
        slopes.sort()
        per = slopes[len(slopes) // 2]

        flops = 3 * sum(2 * batch * layers[i] * layers[i + 1]
                        for i in range(len(layers) - 1))
        tf = flops / per / 1e12
        roof = roofline_flops(dtype) / 1e12
        name = f"train_{dtype}_b{batch}"
        results[name] = {"ms_per_step": round(per * 1e3, 4),
                         "tflops": round(tf, 1),
                         "pct_compute_roof": round(100 * tf / roof, 1)}
        print(f"{name}: {per*1e3:.3f} ms/step, {tf:.1f} TF = "
              f"{100 * tf / roof:.1f}% of compute roof", flush=True)

    if args.gpt:
        import optax

        from tpp_mlir_tpu.parallel import make_gpt_train_step
        from tpp_mlir_tpu.serving import (GptConfig, init_params,
                                          stack_params)

        if args.tiny:
            cfg = GptConfig(vocab=128, embed=64, heads=4, layers=2,
                            mlp_ratio=2, max_seq=32, dtype="f32")
            B, S = 4, 16
            g1, g2 = 2, 6
        else:
            cfg = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                            mlp_ratio=4, max_seq=512, dtype="bf16")
            B, S = 8, 512
            g1, g2 = 4, 20
        params = stack_params(init_params(cfg, seed=0))
        step, init_state = make_gpt_train_step(
            mesh, cfg, optax.adamw(1e-3), donate=False)
        state = init_state(params)
        ids = jnp.asarray(np.random.default_rng(1).integers(
            0, cfg.vocab, (B, S)), jnp.int32)

        @functools.partial(jax.jit, static_argnums=3)
        def run_gpt(params, state, ids, n):
            def body(carry, _):
                params, state = carry
                params, state, loss = step(params, state, ids)
                return (params, state), loss
            (_, _), losses = jax.lax.scan(
                body, (params, state), None, length=n)
            return losses

        float(jnp.sum(run_gpt(params, state, ids, g1)))
        float(jnp.sum(run_gpt(params, state, ids, g2)))
        slopes = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(run_gpt(params, state, ids, g1)))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(run_gpt(params, state, ids, g2)))
            tl = time.perf_counter() - t0
            slopes.append((tl - ts) / (g2 - g1))
        slopes.sort()
        per = slopes[len(slopes) // 2]
        # matmul flops only (fwd 2MNK; bwd dgrad+wgrad = 2x fwd); the
        # attention square terms included, LN/softmax/adamw excluded
        E, L, V = cfg.embed, cfg.layers, cfg.vocab
        per_layer = (2 * B * S * E * (3 * E)      # qkv
                     + 2 * 2 * B * S * S * E      # QK^T and PV
                     + 2 * B * S * E * E          # out proj
                     + 2 * 2 * B * S * E * (cfg.mlp_ratio * E))  # fc1+fc2
        fwd = L * per_layer + 2 * B * S * E * V   # + LM head
        flops = 3 * fwd
        tf = flops / per / 1e12
        roof = roofline_flops(cfg.dtype) / 1e12
        tok_s = B * S / per
        results["train_gpt"] = {
            "ms_per_step": round(per * 1e3, 3), "tflops": round(tf, 1),
            "pct_compute_roof": round(100 * tf / roof, 1),
            "tokens_per_s": round(tok_s, 0)}
        print(f"train_gpt b{B} s{S} {cfg.dtype}: {per*1e3:.2f} ms/step, "
              f"{tf:.1f} TF = {100 * tf / roof:.1f}% of compute roof "
              f"({tok_s:,.0f} tok/s)", flush=True)

    if args.json:
        json.dump(results, open(args.json, "w"), indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
