"""Measured kernel-config autotuner — the dispatch-time selection cache.

The reference exposes manual tile control (`--registerBlocking`,
BrgemmLinalgTiling — reference lib/TPP/Transforms/BrgemmLinalgTiling.cpp)
and libxsmm itself selects a kernel variant inside its JIT at dispatch
time. On TPU the analogous lever is each Pallas kernel's block/schedule
choice, and the honest way to pick it is to MEASURE: `tpp-tune` sweeps
legal candidates on hardware with the same in-kernel perf.bench timing
the benchmark harness uses and records winners here.

Lookup order inside the kernel builders:
  1. explicit user override on the key (--register-blocking) — always wins
  2. the in-memory trial overlay (set by the tuner while sweeping)
  3. tuning.json (written by `tpp-tune`, keyed by `key_tag`)
  4. the built-in heuristic (pick_blocks / per-builder defaults)

The table is loaded once per process (like calibration.json); re-run
`tpp-tune` and restart to pick up new entries.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
from functools import lru_cache

#: key fields that never affect which config is optimal: the timed-region
#: repeat count and the tunable overrides themselves
_NON_IDENTITY_FIELDS = ("repeats", "bm", "bn", "bk", "pingpong")

#: in-memory overlay used by tune trials (tag -> cfg dict)
_OVERLAY: dict = {}


def key_tag(key) -> str:
    """Stable identity of a kernel key for the tuning table: class name +
    every dataclass field except repeat counts and tunable overrides."""
    d = dataclasses.asdict(key)
    items = sorted((k, v) for k, v in d.items()
                   if k not in _NON_IDENTITY_FIELDS)
    body = ",".join(f"{k}={v}" for k, v in items)
    return f"{type(key).__name__}({body})"


def tuning_path() -> str:
    return os.environ.get(
        "TPP_TUNING_PATH",
        os.path.join(os.path.dirname(__file__), "..", "utils",
                     "tuning.json"))


@lru_cache(maxsize=1)
def _load_file() -> dict:
    try:
        data = json.load(open(tuning_path()))
    except (OSError, ValueError):
        return {}
    return data.get("entries", {})


def tuned(key) -> dict:
    """Measured config override for this key: trial overlay first, then the
    tuning file. Returns {} when untuned (heuristics apply)."""
    tag = key_tag(key)
    if tag in _OVERLAY:
        return _OVERLAY[tag]
    entry = _load_file().get(tag)
    return dict(entry.get("cfg", {})) if entry else {}


@contextlib.contextmanager
def trial(key, cfg: dict):
    """Run with `cfg` forced for `key` (the tuner's sweep mechanism).
    Kernels built inside the context honor cfg as if it were in the file;
    build_kernel is unmemoized, so each trial builds fresh code."""
    tag = key_tag(key)
    prev = _OVERLAY.get(tag)
    _OVERLAY[tag] = dict(cfg)
    try:
        yield
    finally:
        if prev is None:
            _OVERLAY.pop(tag, None)
        else:
            _OVERLAY[tag] = prev


def record(key, cfg: dict, gflops: float, baseline_gflops: float,
           device_kind: str, sweep: list | None = None) -> str:
    """Persist a measured winner for `key` (and refresh the process cache).
    Keeps the losing sweep rows for provenance, like the reference's
    benchmark JSON archives."""
    path = os.path.abspath(tuning_path())
    try:
        data = json.load(open(path))
    except (OSError, ValueError):
        data = {"entries": {}}
    tag = key_tag(key)
    data.setdefault("entries", {})[tag] = {
        "cfg": cfg,
        "gflops": round(gflops, 1),
        "heuristic_gflops": round(baseline_gflops, 1),
        "device_kind": device_kind,
        "sweep": sweep or [],
    }
    json.dump(data, open(path, "w"), indent=1)
    _load_file.cache_clear()
    return tag
