#!/usr/bin/env python
"""tpp-tune — measured kernel-config autotuner.

Sweeps legal block/schedule candidates for the GEMM-class kernels of a
generated or configured benchmark program ON HARDWARE and records winners
in tuning.json, which the kernel builders consult at dispatch (xsmm/tune.py).
The reference's analogue is manual --registerBlocking exploration backed by
the BrgemmLinalgTiling heuristics (reference
lib/TPP/Transforms/BrgemmLinalgTiling.cpp); libxsmm itself performs
dispatch-time kernel selection inside its JIT — here the selection is
measurement-driven and persistent.

Each candidate costs a remote compile through the tunnel (minutes for a new
shape) — candidate sets are deliberately small, and re-runs are cheap because
the compile server caches shapes. Compare candidates only within one run
(tunnel noise across runs is ±20-40%); this tool always re-measures the
heuristic baseline in the same process.

Usage:
  tpp-tune --gen "--batch=256 --layers=1024,1024 --bias --relu"
  tpp-tune -c benchmarks/configs/mha.json --filter transformer_block_d128_bf16
  tpp-tune ... --dry          # list candidates without measuring
"""

from __future__ import annotations

import argparse
import dataclasses
import fnmatch
import json
import sys


def _gemm_keys(module):
    """Deduped BrgemmKeys of every GEMM-class invoke in the program."""
    from tpp_mlir_tpu.runtime.executor import _dispatch_key
    from tpp_mlir_tpu.xsmm import tune
    from tpp_mlir_tpu.xsmm.flags import BrgemmKey

    keys, seen = [], set()
    for op in module["entry"].ops:
        if op.opname not in ("xsmm.gemm", "xsmm.brgemm",
                             "xsmm.fused_brgemm"):
            continue
        key = _dispatch_key(op.operands[0].owner, op)
        if not isinstance(key, BrgemmKey):
            continue
        tag = tune.key_tag(key)
        if tag not in seen:
            seen.add(tag)
            keys.append(key)
    return keys


def _brgemm_operands(key):
    """Synthesize operands for timing a BrgemmKey kernel in isolation
    (shape/flag-faithful, magnitude-scaled so gelu/exp epilogues stay in
    range — the same discipline as scripts/exp_wres_sched.py)."""
    import jax.numpy as jnp

    from tpp_mlir_tpu.runtime.tensor_init import tensor_init

    B, m, n, k = key.batch, key.m, key.n, key.k
    a = jnp.asarray(tensor_init("normal", (B, m, k), key.dtype, seed=0))
    b = jnp.asarray(
        tensor_init("normal", (B, k, n), key.dtype, seed=1)) * 0.03
    args = [a, b]
    # the batch dim is REDUCED: kernels take a 2-D (m, n) accumulator
    # for every batch (a (B, m, n) C crashed pallas_call on batch > 1)
    args.append(None if key.beta0 else jnp.zeros((m, n), a.dtype))
    if key.binary_kind is not None:
        shape = {"bcast_col": (n,), "bcast_row": (m,),
                 "bcast_scalar": ()}.get(key.binary_bcast, (m, n))
        args.append(jnp.asarray(
            tensor_init("normal", shape, key.dtype, seed=2)) * 0.1)
    else:
        args.append(None)
    if key.prologue == "layer_norm" and key.prologue_affine:
        g = jnp.asarray(tensor_init("normal", (k,), "f32", seed=3))
        be = jnp.asarray(tensor_init("normal", (k,), "f32", seed=4))
        args += [g * 0.1 + 1.0, be * 0.1]
    return tuple(args)


def _bench_brgemm(key, cfg, operands, iters):
    """Scan-slope time of one candidate config (flops/s). Returns None when
    the builder ignores the candidate (illegal for this shape)."""
    from tpp_mlir_tpu.runtime.perf import bench
    from tpp_mlir_tpu.xsmm import tune
    from tpp_mlir_tpu.xsmm.kernels import build_kernel

    with tune.trial(key, cfg):
        fn = build_kernel(key)
        info = getattr(fn, "_tune_info", {})
        if cfg.get("wres_bm") and info.get("wres_bm") != cfg["wres_bm"]:
            return None, info
        if cfg.get("wres") is False and info.get("kind") == "wres":
            return None, info
        for f in ("bm", "bn", "bk"):
            if cfg.get(f) and info.get(f) != cfg[f]:
                return None, info
        args = tuple(x for x in operands if x is not None)
        sig = [x is not None for x in operands]

        def run(*live):
            it = iter(live)
            full = [next(it) if s else None for s in sig]
            return fn(*full)

        flops = 2 * key.batch * key.m * key.n * key.k
        r = bench(run, args, iters=iters, flops=flops)
        return r.gflops, info


def _candidates_for(key, heur_info):
    """Small legal candidate set around the heuristic choice."""
    out = []
    if heur_info.get("kind") == "wres":
        h = heur_info["wres_bm"]
        for v in (64, 128, 256, 512):
            if v != h and key.m % v == 0:
                out.append({"wres_bm": v})
        out.append({"wres": False})
    else:
        h = (heur_info.get("bm", 0), heur_info.get("bn", 0),
             heur_info.get("bk", 0))
        for i, f in enumerate(("bm", "bn", "bk")):
            for v in (h[i] // 2, h[i] * 2):
                if v >= 8:
                    out.append({f: v})
    return out


def tune_warm_chain(key, operands):
    """Sweep ChainKey.bm with the in-kernel perf.bench timing (the same
    regime the warm benchmark rows use). Returns (sweep_rows, heuristic
    gflops); rows[0] is the heuristic."""
    from tpp_mlir_tpu.runtime.perf import bench_warm

    m = key.m
    heur_bm = key.bm or min(m, 512)
    cands = [v for v in (128, 256, 512) if v != heur_bm and m % v == 0]
    flops = sum(2 * m * key.dims[i] * key.dims[i + 1]
                for i in range(len(key.dims) - 1))
    rows = []
    for bm in [heur_bm] + cands:
        per = bench_warm(dataclasses.replace(key, bm=bm), operands)
        gf = flops / per / 1e9
        rows.append({"cfg": {"bm": bm}, "gflops": round(gf, 1)})
        print(f"  chain bm={bm}: {gf:.1f} gflops", file=sys.stderr)
    return rows, rows[0]["gflops"]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", action="append", default=[])
    p.add_argument("--filter", default="*")
    p.add_argument("--gen", help="mlir-gen args for a one-off program")
    p.add_argument("--iters", type=int, default=4000)
    p.add_argument("--dry", action="store_true",
                   help="list kernels and candidates, do not measure")
    p.add_argument("--min-gain", type=float, default=3.0,
                   help="record a winner only if it beats the heuristic "
                        "by this many percent (same-run comparison)")
    p.add_argument("--key", default="",
                   help="only tune kernel keys whose tag contains this "
                        "substring (bounds remote-compile cost)")
    p.add_argument("--platform", default="",
                   help="force a JAX platform (cpu for smoke tests; the "
                        "env var alone cannot override the axon plugin)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tpp_mlir_tpu.passes import run_pipeline
    from tpp_mlir_tpu.tools.bench_driver import build_module
    from tpp_mlir_tpu.xsmm import tune

    entries = []
    if args.gen:
        entries.append({"name": "cli", "gen": args.gen})
    for cfg_path in args.config:
        import os
        cfg = json.load(open(cfg_path))
        for e in cfg.get("benchmarks", []):
            if fnmatch.fnmatch(e["name"], args.filter):
                e.setdefault("_dir",
                             os.path.dirname(os.path.abspath(cfg_path)))
                entries.append(e)
    if not entries:
        print("nothing matched", file=sys.stderr)
        return 2

    kind = getattr(jax.devices()[0], "device_kind", "unknown")
    tuned_any = 0
    for entry in entries:
        print(f"== {entry['name']}", file=sys.stderr)
        module = build_module(entry)
        if entry.get("precision"):
            module.attrs["precision"] = entry["precision"]
        run_pipeline(module, entry.get("pipeline", "default-tpp-passes"))

        # warm-benchable single-kernel programs: sweep the chain M block
        # with the same in-kernel perf.bench regime the harness times with
        from tpp_mlir_tpu.runtime.executor import extract_bench_kernel
        from tpp_mlir_tpu.xsmm.flags import ChainKey

        hit = extract_bench_kernel(module)
        if hit is not None and isinstance(hit[0], ChainKey):
            import jax.numpy as jnp

            from tpp_mlir_tpu.runtime.tensor_init import tensor_init

            key, get_operands = hit
            margs = tuple(
                jnp.asarray(tensor_init(entry.get("init", "normal"),
                                        a.type.shape, a.type.dtype, seed=i))
                for i, a in enumerate(module["entry"].args))
            tag = tune.key_tag(key)
            print(f" {tag}", file=sys.stderr)
            if args.dry:
                print("  candidates: chain bm in {128, 256, 512}",
                      file=sys.stderr)
            else:
                rows, base = tune_warm_chain(key, get_operands(margs))
                best = max(rows, key=lambda r: r["gflops"])
                if best is not rows[0] and \
                        best["gflops"] > base * (1 + args.min_gain / 100):
                    tune.record(key, best["cfg"], best["gflops"], base,
                                kind, rows)
                    tuned_any += 1
                    print(f"  RECORDED {best['cfg']} "
                          f"(+{(best['gflops']/base-1)*100:.1f}%)",
                          file=sys.stderr)
                else:
                    print("  heuristic stands", file=sys.stderr)
            continue

        for key in _gemm_keys(module):
            from tpp_mlir_tpu.xsmm.kernels import build_kernel
            tag = tune.key_tag(key)
            if args.key and args.key not in tag:
                continue
            heur = getattr(build_kernel(key), "_tune_info", {})
            cands = _candidates_for(key, heur)
            print(f" {tag}\n  heuristic: {heur}", file=sys.stderr)
            if args.dry:
                for c in cands:
                    print(f"  candidate: {c}", file=sys.stderr)
                continue
            operands = _brgemm_operands(key)
            base, _ = _bench_brgemm(key, {}, operands, args.iters)
            print(f"  heuristic: {base:.1f} gflops", file=sys.stderr)
            rows = [{"cfg": {}, "gflops": round(base, 1)}]
            best_cfg, best = {}, base
            for c in cands:
                gf, info = _bench_brgemm(key, c, operands, args.iters)
                if gf is None:
                    print(f"  {c}: illegal/ignored", file=sys.stderr)
                    continue
                print(f"  {c}: {gf:.1f} gflops", file=sys.stderr)
                rows.append({"cfg": c, "gflops": round(gf, 1)})
                if gf > best:
                    best_cfg, best = c, gf
            if best_cfg and best > base * (1 + args.min_gain / 100):
                tune.record(key, best_cfg, best, base, kind, rows)
                tuned_any += 1
                print(f"  RECORDED {best_cfg} "
                      f"(+{(best/base-1)*100:.1f}%)", file=sys.stderr)
            else:
                print("  heuristic stands", file=sys.stderr)
    print(json.dumps({"tuned": tuned_any,
                      "table": tune.tuning_path()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
