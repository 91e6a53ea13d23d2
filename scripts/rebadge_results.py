#!/usr/bin/env python
"""Recompute the roofline columns of an archived benchmark-results JSON
offline (no TPU time): the regime-aware binding roof (warm / VMEM-resident
scan rows report the compute roof; see utils/target.binding_roof) landed
after some r4 archives were recorded, and every field it needs —
mean_seconds, gflops, bytes, mode — is already stored per row.

Usage: python scripts/rebadge_results.py RESULTS.json CONFIG.json [...]
Rewrites RESULTS.json in place; prints a diff line per changed row.
"""

from __future__ import annotations

import json
import sys


def main(argv) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    results_path, cfg_paths = argv[1], argv[2:]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpp_mlir_tpu.utils import target as tgt
    from tpp_mlir_tpu.utils.target import TargetInfo, binding_roof

    data = json.load(open(results_path))
    # build the descriptor the TPU run used: nominal table for the recorded
    # target name + the calibration overlay (same path current_target takes)
    key = data.get("target", "tpu-v5lite").replace("tpu-", "")
    for known, (gen, vmem, hbm, peak) in tgt._KNOWN.items():
        if known.replace(" ", "") == key:
            # _load_calibration matches entry device_kind as a SUBSTRING of
            # the live jax device_kind ("tpu v5 lite" etc.); reconstruct one
            peak = {**peak, **tgt._load_calibration(f"tpu {known}")}
            t = TargetInfo(name=data["target"], generation=gen,
                           vmem_bytes=vmem, hbm_gbps=hbm, peak_flops=peak)
            break
    else:
        raise SystemExit(f"unknown target {data.get('target')!r}")

    dtypes = {}
    for p in cfg_paths:
        for entry in json.load(open(p)).get("benchmarks", []):
            name = entry["name"]
            d = entry.get("dtype", "bf16" if "bf16" in name else "f32")
            if entry.get("precision") == "highest" and d == "f32":
                d = "f32_highest"
            dtypes[name] = d

    changed = 0
    for row in data["results"]:
        if "gflops" not in row or "bytes" not in row:
            continue
        nbytes, mean = row["bytes"], row["mean_seconds"]
        flops = row["gflops"] * 1e9 * mean
        dtype = dtypes.get(row["name"],
                           "bf16" if "bf16" in row["name"] else "f32")
        on_chip = (row.get("mode") == "warm"
                   or nbytes <= t.vmem_resident_bytes)
        roof, bound = binding_roof(dtype, flops, nbytes, target=t,
                                   on_chip=on_chip)
        pct = row["gflops"] * 1e9 / roof * 100
        regime = "on-chip" if on_chip else "streaming"
        if (row.get("roof"), row.get("regime")) != (bound, regime) or \
                abs(row.get("roofline_pct", 0) - pct) > 0.05:
            print(f"{row['name']}: {row.get('roofline_pct', 0):.1f}% "
                  f"{row.get('roof')} -> {pct:.1f}% {bound} ({regime})")
            changed += 1
        row.update(roofline_pct=pct, roof=bound, roof_gflops=roof / 1e9,
                   regime=regime)
        if mean and mean == mean:
            row["eff_gbps"] = nbytes / mean / 1e9

    json.dump(data, open(results_path, "w"), indent=1)
    print(f"{results_path}: {changed} rows rebadged")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
