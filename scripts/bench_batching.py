#!/usr/bin/env python
"""Continuous-batching benchmark: end-to-end serving throughput of
BatchingEngine (slot scheduler) vs the static-batch baseline on the same
request trace.

The trace: N requests with mixed prompt lengths and a mixed number of
output tokens (both seeded). Static batching must run every batch to the
LONGEST generation in it (that is the point of continuous batching — a
finished row idles until the batch drains); the slot scheduler refills
finished slots from the queue.

Metric: emitted tokens / wall second over the whole trace, measured on a
SECOND pass (the first pass warms every compile: per-bucket prefill,
insert, decode loop). Wall time includes host scheduling + the per-sync
device round trip — under the axon tunnel (~25 ms RTT) larger
--sync-steps amortize it; report both.
"""

from __future__ import annotations

import argparse
import json
import time


def _trace(rng, n, buckets, max_new_lo, max_new_hi, vocab):
    import numpy as np

    prompts = [rng.integers(0, vocab, int(ln)).astype(np.int32)
               for ln in rng.integers(buckets[0], buckets[-1] + 1, n)]
    max_new = rng.integers(max_new_lo, max_new_hi + 1, n).tolist()
    return prompts, max_new


def _run_continuous(eng, prompts, max_new):
    """One full trace through a (possibly pre-warmed) engine: reset
    scheduling state, submit, run. The engine's compiled programs are
    reused across calls — call once to warm, again to measure."""
    eng.reset()
    for p, m in zip(prompts, max_new):
        eng.submit(p, max_new=m)
    t0 = time.perf_counter()
    done = eng.run()
    dt = time.perf_counter() - t0
    return sum(len(v) for v in done.values()), dt


def _make_static_runner(params, cfg, slots, buckets, sync):
    """Build the static-batching baseline ONCE (jitted prefill/insert/
    loop persist across calls, so a first call warms the compiles and a
    second measures): fill a batch of `slots`, decode until EVERY row
    hit its max_new (rows that finish early idle), then the next batch.
    Same slotted step (padded batch, bucketed prompts) and the same
    compiled scan chunk as the scheduler, so the comparison isolates
    SCHEDULING, not kernels or sync granularity."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import (init_slot_cache, make_decode_loop,
                                      make_insert, make_prefill,
                                      stack_params)

    sparams = (params if isinstance(params.get("blocks"), dict)
               else stack_params(params))
    prefill = make_prefill(cfg)
    insert = make_insert(cfg)
    loop = make_decode_loop(cfg, sync)

    def run(prompts, max_new):
        rng = jax.random.PRNGKey(0)
        total, t0 = 0, time.perf_counter()
        for i in range(0, len(prompts), slots):
            batch = list(zip(prompts[i:i + slots], max_new[i:i + slots]))
            cache = init_slot_cache(cfg, slots)
            tok = jnp.zeros((slots,), jnp.int32)
            for b, (p, _) in enumerate(batch):
                n = len(p)
                bucket = next(bk for bk in buckets if bk >= n)
                ids = np.zeros((1, bucket), np.int32)
                ids[0, :n] = p
                logits, pcache = prefill(sparams, jnp.asarray(ids))
                cache = insert(cache, pcache, b, n)
                tok = tok.at[b].set(jnp.argmax(logits[0, n - 1]))
            # every row runs to the batch's longest generation
            steps = max(m for _, m in batch) - 1
            for _ in range((steps + sync - 1) // sync):
                _, cache, tok, rng = loop(params, cache, tok, rng)
            float(jnp.sum(tok))  # force completion (tunnel-safe)
            total += sum(m for _, m in batch)
        return total, time.perf_counter() - t0

    return run


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--platform", default="")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--sync-steps", type=int, default=0,
                   help="0 = sweep (host 16/64, device 64/256)")
    p.add_argument("--wave", type=int, default=16,
                   help="device-engine staging rows (KV memory knob)")
    p.add_argument("--modes", default="host,device",
                   help="comma list of host,device (static always runs)")
    p.add_argument("--json", default="")
    args = p.parse_args()
    args.modes = {t.strip() for t in args.modes.split(",") if t.strip()}
    unknown = args.modes - {"host", "device"}
    if unknown:
        p.error(f"unknown --modes tokens: {sorted(unknown)}")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from tpp_mlir_tpu.serving import GptConfig, init_params

    if args.tiny:
        cfg = GptConfig(vocab=128, embed=64, heads=4, layers=2,
                        mlp_ratio=2, max_seq=64, dtype="f32")
        buckets, new_lo, new_hi = (8, 16), 4, 10
        sweeps = (args.sync_steps,) if args.sync_steps else (2, 4)
    else:
        cfg = GptConfig(vocab=50304, embed=768, heads=12, layers=12,
                        mlp_ratio=4, max_seq=640, dtype="bf16")
        buckets, new_lo, new_hi = (128, 256, 512), 16, 96
        sweeps = (args.sync_steps,) if args.sync_steps else (16, 64)

    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    prompts, max_new = _trace(rng, args.requests, buckets, new_lo,
                              new_hi, cfg.vocab)
    results = {"config": {"slots": args.slots, "requests": args.requests,
                          "buckets": buckets, "embed": cfg.embed,
                          "layers": cfg.layers, "dtype": cfg.dtype,
                          "max_new": [new_lo, new_hi]}}

    from tpp_mlir_tpu.serving import BatchingEngine, DeviceBatchingEngine

    if "host" in args.modes:
        for sync in sweeps:
            eng = BatchingEngine(params, cfg, slots=args.slots,
                                 sync_steps=sync, buckets=buckets)
            _run_continuous(eng, prompts, max_new)    # warm compiles
            toks, dt = _run_continuous(eng, prompts, max_new)
            results[f"continuous_sync{sync}"] = {
                "tokens": toks, "seconds": round(dt, 3),
                "tok_per_s": round(toks / dt, 1)}
            print(f"continuous sync={sync}: {toks} tok in {dt:.2f}s "
                  f"= {toks / dt:,.0f} tok/s")

    if "device" in args.modes:
        # device-side admission: sync_steps no longer trades against
        # admission latency (in-graph admit every step), so larger syncs
        # only amortize the macro RTT — sweep well past the host values
        dev_sweeps = ((args.sync_steps,) if args.sync_steps
                      else ((4, 8) if args.tiny else (64, 256)))
        for sync in dev_sweeps:
            eng = DeviceBatchingEngine(params, cfg, slots=args.slots,
                                       sync_steps=sync, wave=args.wave,
                                       buckets=buckets)
            _run_continuous(eng, prompts, max_new)    # warm compiles
            toks, dt = _run_continuous(eng, prompts, max_new)
            results[f"device_sync{sync}"] = {
                "tokens": toks, "seconds": round(dt, 3),
                "tok_per_s": round(toks / dt, 1)}
            print(f"device sync={sync}:  {toks} tok in {dt:.2f}s "
                  f"= {toks / dt:,.0f} tok/s")

    static = _make_static_runner(params, cfg, args.slots, buckets,
                                 sweeps[0])
    static(prompts, max_new)                          # warm compiles
    toks, dt = static(prompts, max_new)
    results["static"] = {"tokens": toks, "seconds": round(dt, 3),
                         "tok_per_s": round(toks / dt, 1)}
    print(f"static batch:  {toks} tok in {dt:.2f}s = {toks / dt:,.0f} tok/s")
    for kind in ("continuous", "device"):
        rows = [v["tok_per_s"] for k, v in results.items()
                if k.startswith(kind)]
        if rows:
            print(f"{kind} vs static: "
                  f"{max(rows) / results['static']['tok_per_s']:.2f}x")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
