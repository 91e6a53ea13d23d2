#!/usr/bin/env python
"""r5 experiment: account for the plain-GPT b8 decode gap (r4 verdict #3).

serving_r4: b1 decode ran 85.9% of its HBM roof, b8 only 53.0% — batch
should IMPROVE byte amortization (weights read once per step regardless
of B). This run produces the missing byte-level ledger: each component
is ablated from a mini decode step (the exp_decode_bisect bodies), the
measured time DELTA is compared against that component's analytic bytes
at the HBM rate, and the slowest-vs-model component is the answer.

Components & bytes/step (GPT-2-small bf16, B=8, prompt 512, max 640):
  weights-nonhead  : block matmul weights read once      (~245 MB)
  lm_head          : (E,V) read + (B,V) f32 logits+argmax (~77 MB)
  kv_read          : attention reads the FULL max_seq cache window
                     (static shapes): 2*L*B*max_seq*E bytes (~188 MB!)
  kv_update        : dynamic_update_slice writes 2*L*B*E   (~0.3 MB)

Note the kv_read term at b8 is ~43%% of all bytes and reads max_seq
(640), not the live window (~576) — the masked dead slots still stream.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpp_mlir_tpu.serving import GptConfig, init_params, make_prefill, \
    stack_params
import tpp_mlir_tpu.serving.engine as eng

CFG = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                mlp_ratio=4, max_seq=640, dtype="bf16")
B, S0 = 8, 512


def mini_step(kind):
    """Mini decode body with component ablations. 'full' mirrors the
    engine's carry-form decode EXACTLY (engine._decode_body stacked
    branch): the FULL (L, B, S, H, D) caches ride the scan CARRY (the
    in-place while-loop aliasing), the layer index is an xs, the write
    is one DUS at (li, 0, pos), the read one dynamic_slice of layer
    li's slab. The first version of this script threaded per-layer
    cache slices through scan xs/ys instead and measured 4.04 ms/step
    — the 3.5x DUS-copy pathology exp_decode_carry.py already
    documented, NOT the engine's cost structure."""

    def mini(params, cache, token):
        D = CFG.head_dim
        pos = cache["pos"]
        x = jnp.take(params["wte"], token, axis=0) \
            + jnp.take(params["wpe"], pos, axis=0).astype(
                params["wte"].dtype)
        kv = {"k": cache["k"], "v": cache["v"]}

        def dot(a, w, b=None):
            y = jnp.dot(a, w, preferred_element_type=jnp.float32)
            if b is not None:
                y = y + b.astype(jnp.float32)
            return y.astype(a.dtype)

        def layer(carry, inp):
            x, kv = carry
            blk, li = inp
            h = eng._ln(x, blk["ln1_g"], blk["ln1_b"])
            q = dot(h, blk["wq"], blk["bq"]).reshape(B, CFG.heads, D)
            k = dot(h, blk["wk"], blk["bk"]).reshape(B, CFG.heads, D)
            v = dot(h, blk["wv"], blk["bv"]).reshape(B, CFG.heads, D)
            if kind != "nokvupdate":
                kv = dict(kv)
                kv["k"] = jax.lax.dynamic_update_slice(
                    kv["k"], k[None, :, None].astype(kv["k"].dtype),
                    (li, 0, pos, 0, 0))
                kv["v"] = jax.lax.dynamic_update_slice(
                    kv["v"], v[None, :, None].astype(kv["v"].dtype),
                    (li, 0, pos, 0, 0))
            if kind == "nokvread":
                a = h    # q/k/v computed, cache written but never read
            else:
                slab = (1,) + kv["k"].shape[1:]
                kc = jax.lax.dynamic_slice(
                    kv["k"], (li, 0, 0, 0, 0), slab)[0]
                vc = jax.lax.dynamic_slice(
                    kv["v"], (li, 0, 0, 0, 0), slab)[0]
                if kind == "livewindow":
                    # read an S0-slot window instead of max_seq: the
                    # time delta / byte delta = the MARGINAL per-byte
                    # cost of the kv read (numerics intentionally
                    # truncated — this is an ablation, not a model)
                    w = min(S0, CFG.max_seq)
                    kc = jax.lax.slice_in_dim(kc, 0, w, axis=1)
                    vc = jax.lax.slice_in_dim(vc, 0, w, axis=1)
                s = jnp.einsum("bhd,bshd->bhs", q.astype(kc.dtype), kc,
                               preferred_element_type=jnp.float32) \
                    * (D ** -0.5)
                live = jnp.arange(kc.shape[1]) <= pos
                s = jnp.where(live[None, None], s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                a = jnp.einsum("bhs,bshd->bhd", p.astype(vc.dtype), vc,
                               preferred_element_type=jnp.float32
                               ).reshape(B, CFG.embed).astype(x.dtype)
            x = x + dot(a, blk["wo"], blk["bo"])
            h2 = eng._ln(x, blk["ln2_g"], blk["ln2_b"])
            if kind != "noffn":
                h2 = dot(h2, blk["w1"], blk["b1"])
                h2 = jax.nn.gelu(h2.astype(jnp.float32),
                                 approximate=False).astype(x.dtype)
                x = x + dot(h2, blk["w2"], blk["b2"])
            return (x, kv), None

        (x, kv), _ = jax.lax.scan(
            layer, (x, kv),
            (params["blocks"], jnp.arange(CFG.layers)))
        x = eng._ln(x, params["lnf_g"], params["lnf_b"])
        if kind == "nolmhead":
            logits = dot(x, params["blocks"]["wo"][0])
        else:
            logits = dot(x, params["lm_head"])
        return logits, {"k": kv["k"], "v": kv["v"], "pos": pos + 1}

    return jax.jit(mini)


def slope(step, params, cache, tok, n1=16, n2=112, reps=3):
    @functools.partial(jax.jit, static_argnums=3)
    def rep(params, cache, tok, n):
        def body(carry, _):
            cache, tok = carry
            logits, cache = step(params, cache, tok)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = nxt % CFG.vocab
            return (cache, nxt), jnp.sum(logits.astype(jnp.float32))
        _, sums = jax.lax.scan(body, (cache, tok), None, length=n)
        return sums

    for attempt in range(3):
        try:
            float(jnp.sum(rep(params, cache, tok, n1)))
            float(jnp.sum(rep(params, cache, tok, n2)))
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"retry compile: {type(e).__name__}", flush=True)
            time.sleep(15)
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(rep(params, cache, tok, n1)))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(rep(params, cache, tok, n2)))
        tl = time.perf_counter() - t0
        out.append((tl - ts) / (n2 - n1))
    out.sort()
    return out[1]


def main():
    from tpp_mlir_tpu.utils.target import current_target
    tgt = current_target()
    params = stack_params(init_params(CFG, seed=0))
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, CFG.vocab, (B, S0)), jnp.int32)
    _, cache = make_prefill(CFG)(params, ids)
    tok = jnp.full((B,), 7, jnp.int32)

    E, V, L, F = CFG.embed, CFG.vocab, CFG.layers, 4 * CFG.embed
    bytes_ledger = {
        "weights_nonhead": L * (4 * E * E + 2 * E * F) * 2 + V * E * 2,
        "lm_head": E * V * 2 + B * V * 4,
        "kv_read": 2 * L * B * CFG.max_seq * E * 2,
        "kv_read_live": 2 * L * B * min(S0, CFG.max_seq) * E * 2,
        "kv_update": 2 * L * B * E * 2,
    }
    # wte gather is tiny; logits argmax rides lm_head
    results = {"ledger_bytes": bytes_ledger, "hbm_gbps": tgt.hbm_gbps,
               "rows": {}}
    print(json.dumps({k: round(v / 1e6, 1)
                      for k, v in bytes_ledger.items()}), flush=True)

    times = {}
    # calibration row: the REAL engine step — 'full' must land within
    # noise of this for the ablation deltas to mean anything
    from tpp_mlir_tpu.serving import make_decode_step
    eng_step = make_decode_step(CFG)
    per = slope(eng_step, params, cache, tok)
    times["engine"] = per
    results["rows"]["engine"] = {"ms_per_step": round(per * 1e3, 4)}
    print(f"{'engine':11s}: {per*1e3:.3f} ms/step", flush=True)
    for kind in ("full", "nokvread", "livewindow", "noffn", "nolmhead",
                 "nokvupdate"):
        per = slope(mini_step(kind), params, cache, tok)
        times[kind] = per
        results["rows"][kind] = {"ms_per_step": round(per * 1e3, 4)}
        print(f"{kind:11s}: {per*1e3:.3f} ms/step", flush=True)

    full = times["full"]
    hbm = tgt.hbm_gbps * 1e9
    for kind, comp in (("nokvread", "kv_read"), ("nolmhead", "lm_head")):
        delta = full - times[kind]
        pred = bytes_ledger[comp] / hbm
        results["rows"][kind]["component_ms"] = round(delta * 1e3, 4)
        results["rows"][kind]["hbm_model_ms"] = round(pred * 1e3, 4)
        print(f"  {comp}: measured {delta*1e3:.3f} ms vs HBM-model "
              f"{pred*1e3:.3f} ms ({delta/pred:.2f}x)", flush=True)
    lw = full - times["livewindow"]
    print(f"  max_seq-vs-live window: {lw*1e3:.3f} ms recoverable",
          flush=True)

    json.dump(results, open("benchmarks/results/decode_b8_r5.json", "w"),
              indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
