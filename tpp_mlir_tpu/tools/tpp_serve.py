#!/usr/bin/env python
"""tpp-serve — autoregressive generation CLI over the serving engine.

Runs prefill + KV-cache decode for a GPT-family model (random-initialized
at the requested size, the serving analogue of `tpp-gen`'s synthetic
models) and prints the generated token ids plus decode timing. `--tp N`
runs the Megatron tensor-parallel decode step over an N-way mesh.

Examples:
  tpp-serve --steps 32                          # GPT-2 small, greedy
  tpp-serve --embed 256 --layers 4 --steps 8 --temperature 0.8
  tpp-serve --tp 4 --platform cpu --devices 8   # sharded decode, CPU mesh
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vocab", type=int, default=50304)
    p.add_argument("--embed", type=int, default=768)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--kv-heads", type=int, default=0,
                   help="GQA: KV heads < query heads (0 = MHA)")
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--mlp-ratio", type=int, default=4)
    p.add_argument("--max-seq", type=int, default=256)
    p.add_argument("--dtype", default="bf16", choices=("f32", "bf16"))
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--prompt-len", type=int, default=32)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-k", type=int, default=0,
                   help="truncate sampling to the k most-likely tokens")
    p.add_argument("--top-p", type=float, default=0.0,
                   help="nucleus sampling: smallest mass >= p")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quant", choices=["int8", "int4"], default="",
                   help="weight-only quantization (matmul weights + LM head, "
                        "per-out-channel scales; int4 packs 2/byte on TPU)")
    p.add_argument("--kv-quant", choices=["int8"], default="",
                   help="int8 KV cache with per-(token, head) scales")
    p.add_argument("--llama", action="store_true",
                   help="LLaMA-class architecture: RoPE + RMSNorm + "
                        "SwiGLU (combine with --kv-heads for GQA)")
    p.add_argument("--experts", type=int, default=0,
                   help="Mixtral-class MoE: expert count per block "
                        "(0 = dense); decode reads only each token's "
                        "top-k experts' weights")
    p.add_argument("--top-k-experts", type=int, default=2,
                   help="experts per token (with --experts)")
    p.add_argument("--moe-prefill", choices=["scan", "sorted"],
                   default="scan",
                   help="MoE prefill FFN form: exact scan-over-experts "
                        "or GShard sorted dispatch (~top_k x dense "
                        "compute, capacity-bounded)")
    p.add_argument("--beams", type=int, default=1,
                   help="beam-search width (>1 enables beam decoding; "
                        "deterministic, ignores sampling flags)")
    p.add_argument("--length-penalty", type=float, default=0.0,
                   help="GNMT length norm exponent for beam search")
    p.add_argument("--eos", type=int, default=-1,
                   help="EOS token id for beam search (-1 = none)")
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="speculative decoding: draft K tokens per round "
                        "with a small draft model, verify in one target "
                        "pass (greedy; exact vs target greedy)")
    p.add_argument("--draft-layers", type=int, default=2,
                   help="layer count of the synthetic draft model "
                        "(with --speculative)")
    p.add_argument("--trunk-draft", type=int, default=0, metavar="N",
                   help="with --speculative: self-speculative tied-trunk "
                        "draft — the target's first N blocks + shared "
                        "head propose (zero extra params, no draft "
                        "prefill); overrides --draft-layers")
    p.add_argument("--draft-vocab", type=int, default=0,
                   help="truncate the draft lm_head to this vocab prefix "
                        "(0 = full; output stays exactly target-greedy — "
                        "PERF.md: 2.9x cheaper draft rounds, ~5%% in-loop)")
    p.add_argument("--continuous", type=int, default=0, metavar="N",
                   help="continuous batching: serve N queued requests "
                        "(random prompt lengths <= --prompt-len) through "
                        "--batch slots, admitting into freed slots as "
                        "requests finish (serving/batching.py)")
    p.add_argument("--sync-steps", type=int, default=8,
                   help="decode steps per host sync in --continuous mode")
    p.add_argument("--device-scheduler", action="store_true",
                   help="with --continuous: device-side admission "
                        "(staged batched prefill + in-graph retire/admit "
                        "inside the decode scan; serving/batching.py "
                        "DeviceBatchingEngine). Single-device only")
    p.add_argument("--wave", type=int, default=16,
                   help="device-scheduler staging rows (KV memory knob)")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel decode over a tp-way mesh")
    p.add_argument("--platform", default="",
                   help="force a JAX platform (cpu for smoke; the env var "
                        "alone cannot override the axon plugin)")
    p.add_argument("--devices", type=int, default=0,
                   help="virtual CPU device count (with --platform cpu)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.devices:
            jax.config.update("jax_num_cpu_devices", args.devices)

    import jax.numpy as jnp
    import numpy as np

    from tpp_mlir_tpu.serving import (GptConfig, init_params,
                                      make_decode_step, make_generate,
                                      make_prefill, make_tp_decode_step,
                                      stack_params)

    mk = GptConfig.llama if args.llama else GptConfig
    cfg = mk(vocab=args.vocab, embed=args.embed, heads=args.heads,
             layers=args.layers, mlp_ratio=args.mlp_ratio,
             max_seq=args.max_seq, dtype=args.dtype,
             kv_heads=args.kv_heads or None,
             kv_quant=args.kv_quant or None,
             n_experts=args.experts,
             top_k=args.top_k_experts,
             moe_prefill_form=args.moe_prefill)
    spec_slack = (args.speculative + 1) if args.speculative else 0
    if args.prompt_len + args.steps + spec_slack > cfg.max_seq:
        print(f"prompt+steps ({args.prompt_len}+{args.steps}"
              f"{f'+{spec_slack} speculative slack' if spec_slack else ''})"
              f" exceeds --max-seq {cfg.max_seq}", file=sys.stderr)
        return 2
    # stacked layers run under one lax.scan: ~L x smaller HLO, which keeps
    # deep models inside the remote-compile tunnel's request size limit
    params = stack_params(init_params(cfg, seed=args.seed))
    if args.quant:
        from tpp_mlir_tpu.serving import quantize_params

        params = quantize_params(params, bits=int(args.quant[3:]))
    ids = jnp.asarray(np.random.default_rng(args.seed).integers(
        0, cfg.vocab, (args.batch, args.prompt_len)), jnp.int32)

    if args.speculative:
        from tpp_mlir_tpu.serving import make_speculative_generate

        if args.batch != 1:
            print("--speculative serves the B=1 latency path",
                  file=sys.stderr)
            return 2
        if args.trunk_draft:
            gen = make_speculative_generate(cfg, None, args.steps,
                                            k=args.speculative,
                                            draft_vocab=args.draft_vocab,
                                            trunk_layers=args.trunk_draft)
            t0 = time.perf_counter()
            out, stats = gen(params, ids)
        else:
            dcfg = GptConfig(vocab=cfg.vocab, embed=cfg.embed,
                             heads=cfg.heads, layers=args.draft_layers,
                             mlp_ratio=cfg.mlp_ratio, max_seq=cfg.max_seq,
                             dtype=cfg.dtype, kv_heads=cfg.kv_heads,
                             kv_quant=cfg.kv_quant)
            draft = stack_params(init_params(dcfg, seed=args.seed + 1))
            gen = make_speculative_generate(cfg, dcfg, args.steps,
                                            k=args.speculative,
                                            draft_vocab=args.draft_vocab)
            t0 = time.perf_counter()
            out, stats = gen(params, draft, ids)
        out = np.asarray(out)
        dt = time.perf_counter() - t0
        acc = int(stats["accepted"])
        drafted = int(stats["drafted"])
        print(f"# speculative K={args.speculative}: {args.steps} tokens in "
              f"{dt:.2f}s incl. compile; {int(stats['macro_steps'])} "
              f"rounds, acceptance {acc}/{drafted} "
              f"({100 * acc / max(drafted, 1):.0f}%)")
    elif args.continuous:
        from tpp_mlir_tpu.serving import BatchingEngine, init_params as _ip

        # the scheduler wants the hybrid layout: UNSTACKED params for the
        # slotted decode (static layer indices), stacking for prefill
        # happens inside the engine
        uparams = _ip(cfg, seed=args.seed)
        if args.quant:
            from tpp_mlir_tpu.serving import quantize_params

            uparams = quantize_params(uparams, bits=int(args.quant[3:]))
        rng = np.random.default_rng(args.seed)
        prompts = [rng.integers(0, cfg.vocab, int(n)).astype(np.int32)
                   for n in rng.integers(1, args.prompt_len + 1,
                                         args.continuous)]
        tp_mesh = None
        if args.tp:
            from tpp_mlir_tpu.parallel import make_mesh

            tp_mesh = make_mesh({"tp": args.tp})
        if args.device_scheduler:
            from tpp_mlir_tpu.serving import DeviceBatchingEngine

            if tp_mesh is not None:
                print("--device-scheduler is single-device (no --tp)",
                      file=sys.stderr)
                return 2
            eng = DeviceBatchingEngine(
                uparams, cfg, slots=args.batch,
                sync_steps=args.sync_steps, wave=args.wave,
                temperature=args.temperature, top_k=args.top_k,
                top_p=args.top_p, seed=args.seed)
        else:
            eng = BatchingEngine(uparams, cfg, slots=args.batch,
                                 sync_steps=args.sync_steps,
                                 temperature=args.temperature,
                                 top_k=args.top_k, top_p=args.top_p,
                                 seed=args.seed, tp_mesh=tp_mesh)
        rids = [eng.submit(pr, max_new=args.steps) for pr in prompts]
        t0 = time.perf_counter()
        done = eng.run()
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in done.values())
        sched = "device" if args.device_scheduler else "host"
        print(f"# continuous: {args.continuous} requests through "
              f"{args.batch} slots, sync every {args.sync_steps} steps "
              f"({sched} scheduler): "
              f"{total} tokens in {dt:.2f}s incl. compile "
              f"({total / dt:,.0f} tok/s)")
        out = np.asarray([])
        for rid in rids:
            print(f"req {rid} ({len(prompts[rid])}-token prompt): "
                  + " ".join(str(t) for t in done[rid]))
    elif args.tp:
        from tpp_mlir_tpu.parallel import make_mesh

        mesh = make_mesh({"tp": args.tp})
        step = make_tp_decode_step(mesh, cfg, stacked=True,
                                   quantized=bool(args.quant))
        logits, cache = make_prefill(cfg, use_pallas=False)(params, ids)
        # start from the model's own continuation so the tp stream is
        # comparable token-for-token against the single-device modes
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        toks = [np.asarray(tok)]
        t0 = time.perf_counter()
        for _ in range(args.steps - 1):
            logits, cache = step(params, cache, tok)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            toks.append(np.asarray(tok))
        dt = time.perf_counter() - t0
        out = np.stack(toks, axis=1)
        print(f"# tp={args.tp} decode: {args.steps - 1} steps in {dt:.2f}s")
    elif args.beams > 1:
        from tpp_mlir_tpu.serving import make_beam_generate

        gen = make_beam_generate(cfg, args.steps, beams=args.beams,
                                 length_penalty=args.length_penalty,
                                 eos_id=args.eos if args.eos >= 0 else None)
        t0 = time.perf_counter()
        out, scores = gen(params, ids)
        out = np.asarray(out)
        dt = time.perf_counter() - t0
        print(f"# beam search: width {args.beams}, {args.steps} steps x "
              f"batch {args.batch} in {dt:.2f}s; best scores "
              + " ".join(f"{float(s):.3f}" for s in np.asarray(scores)))
    else:
        gen = make_generate(cfg, args.steps, temperature=args.temperature,
                            top_k=args.top_k, top_p=args.top_p)
        t0 = time.perf_counter()
        out = np.asarray(gen(params, ids, jax.random.PRNGKey(args.seed)))
        dt = time.perf_counter() - t0
        tok_s = args.batch * args.steps / dt
        print(f"# generate: {args.steps} steps x batch {args.batch} in "
              f"{dt:.2f}s ({tok_s:,.0f} tok/s incl. compile)")
    for b in range(out.shape[0]):
        print(" ".join(str(t) for t in out[b]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
