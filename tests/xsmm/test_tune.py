"""Autotuner (xsmm/tune.py + tpp-tune): tag identity, lookup order,
builder wiring, and numerics-under-override. The measurement itself is
hardware-only; everything testable on CPU interpret mode is here."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _brgemm_key(**kw):
    from tpp_mlir_tpu.xsmm.flags import BrgemmKey
    base = dict(batch=1, m=1024, n=128, k=128, dtype="f32", beta0=True)
    base.update(kw)
    return BrgemmKey(**base)


def test_key_tag_ignores_tunables_and_repeats():
    import dataclasses

    from tpp_mlir_tpu.xsmm import tune
    from tpp_mlir_tpu.xsmm.flags import ChainKey

    k1 = _brgemm_key()
    assert tune.key_tag(k1) == tune.key_tag(
        dataclasses.replace(k1, bm=256, bn=64, bk=64))
    assert tune.key_tag(k1) != tune.key_tag(
        dataclasses.replace(k1, n=256))
    c = ChainKey(m=256, dims=(64, 64), dtype="f32")
    assert tune.key_tag(c) == tune.key_tag(
        dataclasses.replace(c, repeats=100, bm=128))


def test_lookup_order_overlay_then_file(tmp_path, monkeypatch):
    from tpp_mlir_tpu.xsmm import tune

    path = tmp_path / "tuning.json"
    key = _brgemm_key()
    tag = tune.key_tag(key)
    path.write_text(json.dumps(
        {"entries": {tag: {"cfg": {"bm": 64}, "gflops": 1.0}}}))
    monkeypatch.setenv("TPP_TUNING_PATH", str(path))
    tune._load_file.cache_clear()
    try:
        assert tune.tuned(key) == {"bm": 64}
        with tune.trial(key, {"bm": 32}):
            assert tune.tuned(key) == {"bm": 32}
            with tune.trial(key, {"bm": 16}):
                assert tune.tuned(key) == {"bm": 16}
            assert tune.tuned(key) == {"bm": 32}
        assert tune.tuned(key) == {"bm": 64}
    finally:
        tune._load_file.cache_clear()


def test_record_roundtrip(tmp_path, monkeypatch):
    from tpp_mlir_tpu.xsmm import tune

    monkeypatch.setenv("TPP_TUNING_PATH", str(tmp_path / "t.json"))
    tune._load_file.cache_clear()
    try:
        key = _brgemm_key()
        tag = tune.record(key, {"bm": 128}, 150.0, 140.0, "TPU v5 lite",
                          [{"cfg": {}, "gflops": 140.0}])
        assert tune.tuned(key) == {"bm": 128}
        data = json.load(open(tmp_path / "t.json"))
        assert data["entries"][tag]["heuristic_gflops"] == 140.0
    finally:
        tune._load_file.cache_clear()


def test_builders_honor_tuned_blocks():
    from tpp_mlir_tpu.xsmm import tune
    from tpp_mlir_tpu.xsmm.kernels import build_kernel

    # blocked path: pick_blocks defaults overridden by the tuned cfg
    key = _brgemm_key(m=128)
    fn = build_kernel(key, interpret=True)
    assert fn._tune_info["kind"] == "blocked"
    with tune.trial(key, {"bm": 32}):
        fn2 = build_kernel(key, interpret=True)
    assert fn2._tune_info["bm"] == 32
    # explicit user register-blocking beats the tuned entry
    import dataclasses
    with tune.trial(key, {"bm": 32}):
        fn3 = build_kernel(dataclasses.replace(key, bm=64),
                           interpret=True)
    assert fn3._tune_info["bm"] == 64


def test_wres_honors_tuned_bm_and_opt_out():
    from tpp_mlir_tpu.xsmm import tune
    from tpp_mlir_tpu.xsmm.kernels import build_kernel

    key = _brgemm_key()  # m=1024 k=n=128: wres-eligible
    fn = build_kernel(key, interpret=True)
    assert fn._tune_info["kind"] == "wres"
    with tune.trial(key, {"wres_bm": 128}):
        fn2 = build_kernel(key, interpret=True)
    assert fn2._tune_info == {"kind": "wres", "wres_bm": 128,
                              "sched": "interleave"}
    # illegal tuned bm (does not divide m): heuristic silently applies
    with tune.trial(key, {"wres_bm": 384}):
        fn3 = build_kernel(key, interpret=True)
    assert fn3._tune_info["wres_bm"] == fn._tune_info["wres_bm"]
    # measured opt-out: wres=False forces the blocked path
    with tune.trial(key, {"wres": False}):
        fn4 = build_kernel(key, interpret=True)
    assert fn4._tune_info["kind"] == "blocked"


def test_tuned_bm_numerics_match_reference():
    import jax.numpy as jnp

    from tpp_mlir_tpu.runtime.tensor_init import tensor_init
    from tpp_mlir_tpu.xsmm import tune
    from tpp_mlir_tpu.xsmm.kernels import build_kernel
    from tpp_mlir_tpu.xsmm.reference import reference_kernel

    key = _brgemm_key(m=64, binary_kind="add", binary_bcast="bcast_col",
                      unary_kind="relu")
    a = jnp.asarray(tensor_init("normal", (1, 64, 128), "f32", seed=0))
    b = jnp.asarray(tensor_init("normal", (1, 128, 128), "f32", seed=1))
    d = jnp.asarray(tensor_init("normal", (128,), "f32", seed=2))
    want = np.asarray(reference_kernel(key)(a, b, None, d))
    with tune.trial(key, {"bm": 16, "bn": 64, "bk": 64}):
        got = np.asarray(build_kernel(key, interpret=True)(a, b, None, d))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cli_dry_lists_candidates():
    r = subprocess.run(
        [sys.executable, "-m", "tpp_mlir_tpu.tools.tpp_tune",
         "--gen", "--batch=64 --layers=128,128 --bias --relu", "--dry",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=300, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "candidate" in r.stderr or "chain bm" in r.stderr, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["tuned"] == 0
