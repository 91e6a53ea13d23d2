"""Continuous batching (serving/batching.py): the slotted decode step,
prefill-to-slot insertion, and the host scheduler, checked differentially
against independent single-request generation — staggered admission, slot
reuse, bucket padding and garbage slots must not change any request's
tokens."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.serving import (BatchingEngine, GptConfig, init_params,
                                  init_slot_cache, make_decode_step,
                                  make_insert, make_prefill,
                                  quantize_params, stack_params)

CFG = GptConfig(vocab=97, embed=32, heads=4, layers=2, mlp_ratio=2,
                max_seq=48, dtype="f32")


def _reference_generate(params, cfg, prompt, max_new, eos_id=None):
    """Single-request greedy generation: unpadded B=1 prefill + scalar-pos
    decode steps — the path batching must reproduce token for token."""
    sparams = (params if isinstance(params.get("blocks"), dict)
               else stack_params(params))
    logits, cache = make_prefill(cfg, use_pallas=False)(
        sparams, jnp.asarray(prompt, jnp.int32)[None])
    step = make_decode_step(cfg)
    tok = int(jnp.argmax(logits[0, len(prompt) - 1]))
    out = [tok]
    cap = min(max_new, cfg.max_seq - len(prompt))
    while len(out) < cap and (eos_id is None or out[-1] != eos_id):
        logits, cache = step(params, cache,
                             jnp.asarray([out[-1]], jnp.int32))
        out.append(int(jnp.argmax(logits[0])))
    return out


def test_slotted_decode_matches_scalar_pos():
    """A (B,) position vector with equal entries must reproduce the
    scalar-pos decode step bit-for-bit (same math, scatter vs DUS)."""
    params = init_params(CFG, seed=0)
    prompt = np.arange(1, 9) % CFG.vocab
    _, cache = make_prefill(CFG, use_pallas=False)(
        stack_params(params), jnp.asarray(np.stack([prompt, prompt])))
    step = make_decode_step(CFG)
    tok = jnp.asarray([5, 5], jnp.int32)
    ref_logits, ref_cache = step(params, cache, tok)

    slot_cache = dict(cache)
    slot_cache["pos"] = jnp.full((2,), int(cache["pos"]), jnp.int32)
    got_logits, got_cache = step(params, slot_cache, tok)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(ref_logits), atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_cache["k"]),
                                  np.asarray(ref_cache["k"]))
    np.testing.assert_array_equal(np.asarray(got_cache["pos"]),
                                  np.asarray([int(ref_cache["pos"])] * 2))


def test_sentinel_slot_writes_drop():
    """A slot parked at pos == max_seq must not write KV anywhere."""
    params = init_params(CFG, seed=1)
    cache = init_slot_cache(CFG, slots=2)
    before = np.asarray(cache["k"]).copy()
    step = make_decode_step(CFG)
    _, cache = step(params, cache, jnp.asarray([1, 2], jnp.int32))
    np.testing.assert_array_equal(np.asarray(cache["k"]), before)


def test_insert_sets_slot_rows_and_pos():
    params = init_params(CFG, seed=2)
    prompt = (np.arange(7) * 3 + 1) % CFG.vocab
    _, pcache = make_prefill(CFG, use_pallas=False)(
        stack_params(params), jnp.asarray(prompt, jnp.int32)[None])
    cache = init_slot_cache(CFG, slots=3)
    cache = make_insert(CFG)(cache, pcache, 1, len(prompt))
    assert np.asarray(cache["pos"]).tolist() == [CFG.max_seq, 7,
                                                 CFG.max_seq]
    np.testing.assert_array_equal(np.asarray(cache["k"][:, 1]),
                                  np.asarray(pcache["k"][:, 0]))
    assert not np.asarray(cache["k"][:, 0]).any()


@pytest.mark.parametrize("slots,sync_steps", [(2, 3), (3, 1)])
def test_continuous_batching_matches_sequential(slots, sync_steps):
    """Five staggered requests through few slots (forced reuse) must each
    get exactly the tokens independent generation produces."""
    params = init_params(CFG, seed=3)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, CFG.vocab, n).astype(np.int32)
               for n in (3, 9, 5, 14, 8)]
    max_new = 11

    eng = BatchingEngine(params, CFG, slots=slots, sync_steps=sync_steps,
                         buckets=(4, 8, 16), use_pallas=False)
    rids = [eng.submit(p, max_new=max_new) for p in prompts]
    got = eng.run()
    assert sorted(got) == sorted(rids)
    for rid, prompt in zip(rids, prompts):
        ref = _reference_generate(params, CFG, prompt, max_new)
        assert got[rid] == ref, f"request {rid}"


def test_batching_eos_frees_slot_early():
    """EOS mid-stream finishes the request; the slot serves the queue."""
    params = init_params(CFG, seed=4)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, CFG.vocab, 6).astype(np.int32)
               for _ in range(4)]
    # pick an eos id that actually occurs early in one reference stream
    streams = [_reference_generate(params, CFG, p, 12) for p in prompts]
    eos = streams[0][2]
    eng = BatchingEngine(params, CFG, slots=2, sync_steps=2, eos_id=eos,
                         buckets=(8,), use_pallas=False)
    rids = [eng.submit(p, max_new=12) for p in prompts]
    got = eng.run()
    for rid, prompt in zip(rids, prompts):
        ref = _reference_generate(params, CFG, prompt, 12, eos_id=eos)
        assert got[rid] == ref


def test_batching_quantized_gqa():
    """int8 weights + int8 KV + GQA through the same scheduler."""
    cfg = GptConfig(vocab=97, embed=32, heads=4, layers=2, mlp_ratio=2,
                    max_seq=32, dtype="f32", kv_heads=2, kv_quant="int8")
    params = quantize_params(init_params(cfg, seed=5))
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab, n).astype(np.int32)
               for n in (4, 7, 11)]
    eng = BatchingEngine(params, cfg, slots=2, sync_steps=2,
                         buckets=(4, 8, 16), use_pallas=False)
    rids = [eng.submit(p, max_new=6) for p in prompts]
    got = eng.run()
    for rid, prompt in zip(rids, prompts):
        ref = _reference_generate(params, cfg, prompt, 6)
        assert got[rid] == ref


def test_batching_cache_capacity_cap():
    """A request whose prompt nearly fills max_seq is capped, not OOB."""
    params = init_params(CFG, seed=6)
    prompt = np.arange(CFG.max_seq - 3).astype(np.int32) % CFG.vocab
    eng = BatchingEngine(params, CFG, slots=1, sync_steps=4,
                         buckets=(CFG.max_seq,), use_pallas=False)
    rid = eng.submit(prompt, max_new=50)
    got = eng.run()
    assert len(got[rid]) == 3  # max_seq - len(prompt)
    ref = _reference_generate(params, CFG, prompt, 50)
    assert got[rid] == ref


def test_tpp_serve_continuous_cli(capsys):
    from tpp_mlir_tpu.tools import tpp_serve

    rc = tpp_serve.main(["--platform", "cpu", "--embed", "32", "--heads",
                         "4", "--layers", "2", "--mlp-ratio", "2",
                         "--vocab", "97", "--max-seq", "32",
                         "--prompt-len", "6", "--steps", "4", "--batch",
                         "2", "--continuous", "3", "--sync-steps", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "# continuous: 3 requests through 2 slots" in out
    lines = [ln for ln in out.splitlines() if ln.startswith("req ")]
    assert len(lines) == 3 and all(len(ln.split(": ")[1].split()) == 4
                                   for ln in lines)


@pytest.mark.parametrize("slots,sync_steps,wave", [(2, 3, 3), (3, 5, 2)])
def test_device_batching_matches_sequential(slots, sync_steps, wave):
    """The device-side scheduler (in-graph retire/admit/decode,
    staged batched prefill) must emit exactly the tokens independent
    generation produces — slot reuse, wave refills, bucket-sorted
    staging and the one-admission-per-step cadence included."""
    from tpp_mlir_tpu.serving import DeviceBatchingEngine

    params = init_params(CFG, seed=3)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, CFG.vocab, n).astype(np.int32)
               for n in (3, 9, 5, 14, 8)]
    max_new = 11

    eng = DeviceBatchingEngine(params, CFG, slots=slots,
                               sync_steps=sync_steps, wave=wave,
                               buckets=(4, 8, 16), use_pallas=False)
    rids = [eng.submit(p, max_new=max_new) for p in prompts]
    got = eng.run()
    assert sorted(got) == sorted(rids)
    for rid, prompt in zip(rids, prompts):
        ref = _reference_generate(params, CFG, prompt, max_new)
        assert got[rid] == ref, f"request {rid}"


def test_device_batching_eos_frees_slot_early():
    """EOS mid-stream ends the request in-graph (budget zeroed inside
    the scan); tokens must match reference generation with the same
    eos, including the recorded EOS token itself."""
    from tpp_mlir_tpu.serving import DeviceBatchingEngine

    params = init_params(CFG, seed=4)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, CFG.vocab, 6).astype(np.int32)
               for _ in range(4)]
    streams = [_reference_generate(params, CFG, p, 12) for p in prompts]
    eos = streams[0][2]
    eng = DeviceBatchingEngine(params, CFG, slots=2, sync_steps=2,
                               wave=4, eos_id=eos, buckets=(8,),
                               use_pallas=False)
    rids = [eng.submit(p, max_new=12) for p in prompts]
    got = eng.run()
    for rid, prompt in zip(rids, prompts):
        ref = _reference_generate(params, CFG, prompt, 12, eos_id=eos)
        assert got[rid] == ref


def test_device_batching_quantized_gqa():
    """int8 weights + int8 KV cache + GQA through the device scheduler:
    the staged-slab copy and in-graph admission are layout-generic."""
    from tpp_mlir_tpu.serving import DeviceBatchingEngine

    cfg = GptConfig(vocab=97, embed=32, heads=4, layers=2, mlp_ratio=2,
                    max_seq=32, dtype="f32", kv_heads=2, kv_quant="int8")
    params = quantize_params(init_params(cfg, seed=5))
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab, n).astype(np.int32)
               for n in (4, 7, 11)]
    eng = DeviceBatchingEngine(params, cfg, slots=2, sync_steps=2,
                               wave=2, buckets=(4, 8, 16),
                               use_pallas=False)
    rids = [eng.submit(p, max_new=6) for p in prompts]
    got = eng.run()
    for rid, prompt in zip(rids, prompts):
        ref = _reference_generate(params, cfg, prompt, 6)
        assert got[rid] == ref


def test_device_batching_capacity_cap():
    """max_new is capped at max_seq - len(prompt), like the host
    engine (no out-of-bounds KV writes near a full cache)."""
    from tpp_mlir_tpu.serving import DeviceBatchingEngine

    params = init_params(CFG, seed=6)
    prompt = np.arange(CFG.max_seq - 3).astype(np.int32) % CFG.vocab
    eng = DeviceBatchingEngine(params, CFG, slots=1, sync_steps=4,
                               wave=1, buckets=(CFG.max_seq,),
                               use_pallas=False)
    rid = eng.submit(prompt, max_new=50)
    got = eng.run()
    assert len(got[rid]) == 3
    ref = _reference_generate(params, CFG, prompt, 50)
    assert got[rid] == ref


def test_batching_tp_decode_matches_single_device():
    """Continuous batching over a tensor-parallel decode mesh (heads +
    KV cache sharded over tp) must emit exactly the single-device
    engine's tokens on the same trace."""
    from tpp_mlir_tpu.parallel import make_mesh

    params = init_params(CFG, seed=7)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, CFG.vocab, n).astype(np.int32)
               for n in (4, 11, 7)]

    single = BatchingEngine(params, CFG, slots=2, sync_steps=2,
                            buckets=(4, 8, 16), use_pallas=False)
    want = {}
    for p in prompts:
        want[single.submit(p, max_new=7)] = None
    want = single.run()

    mesh = make_mesh({"tp": 4})
    tp = BatchingEngine(params, CFG, slots=2, sync_steps=2,
                        buckets=(4, 8, 16), tp_mesh=mesh,
                        use_pallas=False)
    rids = [tp.submit(p, max_new=7) for p in prompts]
    got = tp.run()
    for rid in rids:
        assert got[rid] == want[rid], rid
