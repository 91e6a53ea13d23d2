#!/usr/bin/env python
"""MoE decode-form experiment: tokens/s through the REAL decode step for
each _moe_ffn form (gather / scan / slice) at b1 and b8, GPT-2-small
MoE-8 shape. Decides the _moe_ffn_decode auto policy by measurement.

Hypotheses (HBM traffic; decode is bandwidth-bound):
  - gather (jnp.take + einsum) MATERIALIZES (B, k, E, F) selected
    weights — an HBM copy read back by the dot: 2-3x the expert bytes;
  - scan streams all n experts exactly once: wins when B*k >= n;
  - slice (b1 only) fuses k dynamic slices into the dots: no copy.

Run: nohup python scripts/exp_moe_decode.py > /tmp/moe_forms.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import (GptConfig, init_params,
                                      make_decode_step, make_prefill,
                                      stack_params)

    s0, n_short, n_long, reps = 256, 8, 56, 3
    results = {}
    for form in ("gather", "scan", "slice"):
        cfg = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                        mlp_ratio=4, max_seq=384, dtype="bf16",
                        n_experts=8, top_k=2, moe_decode_form=form)
        params = init_params(cfg, seed=0)
        sparams = stack_params(params)
        prefill = make_prefill(cfg)
        step = make_decode_step(cfg)

        @functools.partial(jax.jit, static_argnums=3)
        def step_n(params, cache, tok, n, step=step):
            def body(carry, _):
                cache, tok = carry
                logits, cache = step(params, cache, tok)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (cache, nxt), jnp.sum(logits.astype(jnp.float32))
            (_, _), sums = jax.lax.scan(body, (cache, tok), None, length=n)
            return sums, None

        for B in (1, 8):
            if form == "slice" and B != 1:
                continue  # slice degenerates to gather under batching
            ids = jnp.asarray(np.random.default_rng(0).integers(
                0, cfg.vocab, (B, s0)), jnp.int32)
            _, cache = prefill(sparams, ids)
            tok = jnp.full((B,), 7, jnp.int32)
            # compile both lengths, then slope
            float(jnp.sum(step_n(params, cache, tok, n_short)[0]))
            float(jnp.sum(step_n(params, cache, tok, n_long)[0]))
            slopes = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(jnp.sum(step_n(params, cache, tok, n_short)[0]))
                ts = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(jnp.sum(step_n(params, cache, tok, n_long)[0]))
                tl = time.perf_counter() - t0
                slopes.append((tl - ts) / (n_long - n_short))
            slopes.sort()
            per_tok = slopes[len(slopes) // 2]
            results[f"{form}_b{B}"] = {
                "tokens_per_s": round(B / per_tok, 1),
                "ms_per_token": round(per_tok * 1e3, 3)}
            print(f"{form} b={B}: {B / per_tok:,.0f} tok/s "
                  f"({per_tok * 1e3:.2f} ms/tok)", flush=True)
    with open("benchmarks/results/moe_decode_forms_r4.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote benchmarks/results/moe_decode_forms_r4.json")


if __name__ == "__main__":
    main()
