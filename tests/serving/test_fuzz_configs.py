"""Serving config-space fuzzer (r5 verdict #5).

The engine's config space (kv_heads x llama x n_experts x moe forms x
quant x kv_quant x kv_packed x extend-chunking x slotted batching x
trunk drafts) is combinatorial and was only pairwise-tested. This fuzzer
pins every serving PATH against the single-request greedy oracle on the
SAME params, token-exact, across N seeds:

  oracle    make_generate greedy (unbatched, whole-prompt prefill)
  chunked   chunked prefill via make_extend (4-token chunks) + decode
  slotted   BatchingEngine with a decoy request sharing the batch
  device    DeviceBatchingEngine (in-graph retire/admit/decode; wave=1
            forces a staging refill per admission) with the same decoy
  spec      tied-trunk speculative decoding (greedy-exact by contract)

Architectures are a FIXED set covering the axes — jit programs cache
across seeds (only weights/prompts vary), so 100 seeds cost ~7 compile
sets. Quantized arches compare quantized-path vs quantized-oracle (the
exactness axis is path equivalence; quantization changes the model by
design and is drift-tested elsewhere).

The meta-test at the bottom proves the fuzzer CATCHES a seeded
form-routing bug (grouped silently rerouted to the token-dropping
capacity form), the FoldResidualAcc-style existence check the pipeline
fuzzer set the pattern for.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpp_mlir_tpu.serving import (BatchingEngine, DeviceBatchingEngine,
                                  GptConfig, init_params,
                                  make_decode_step, make_extend,
                                  make_generate, make_prefill,
                                  quantize_params, stack_params)
from tpp_mlir_tpu.serving.speculative import make_speculative_generate

N_SEEDS = 100
S0, STEPS, K = 8, 6, 3

_BASE = dict(vocab=97, embed=32, heads=4, layers=2, mlp_ratio=2,
             max_seq=32, dtype="f32")

# (name, cfg, quant_bits, paths) — paths is the subset of serving paths
# the arch supports (kv_packed has no extend; spec needs stacked trunk)
ARCHES = [
    ("dense", GptConfig(**_BASE), 0,
     ("chunked", "slotted", "device", "spec")),
    ("llama_gqa", GptConfig.llama(kv_heads=2, **_BASE), 0,
     ("chunked", "slotted", "device", "spec")),
    ("moe_scan", GptConfig(n_experts=4, top_k=2, **_BASE), 0,
     ("chunked", "slotted", "device", "forms")),
    ("moe_grouped", GptConfig(n_experts=4, top_k=2,
                              moe_prefill_form="grouped", moe_group_bm=8,
                              **_BASE), 0,
     ("chunked", "slotted", "device", "forms")),
    ("quant_int8", GptConfig(**_BASE), 8,
     ("chunked", "slotted", "device", "spec")),
    ("kv_int8", GptConfig(kv_quant="int8", **_BASE), 0,
     ("chunked", "slotted", "device")),
    ("kv_packed", GptConfig(kv_packed=True, decode_attn="pallas",
                            **_BASE), 0,
     ("slotted", "device")),
    ("kv_packed_rope", GptConfig.llama(kv_packed=True,
                                       decode_attn="pallas", **_BASE), 0,
     ("slotted", "device")),
    # r7: flash prefill route (GptConfig.flash_attn) — the training-VJP
    # forward serving prefill; decode/extend stay on their own paths, so
    # this checks cross-path token agreement when prefill reductions run
    # in the flash (online-softmax, exp2) order
    ("flash_prefill", GptConfig(flash_attn=True, **_BASE), 0,
     ("chunked", "slotted", "device")),
    ("flash_gqa", GptConfig.llama(kv_heads=2, flash_attn=True, **_BASE),
     0, ("chunked", "slotted", "device")),
]


class _Harness:
    """Per-arch jitted programs, built once and reused across seeds."""

    def __init__(self, cfg, quant_bits, paths):
        self.cfg, self.paths = cfg, paths
        self.quant_bits = quant_bits
        self.prefill = make_prefill(cfg, use_pallas=False)
        self.step = make_decode_step(cfg)
        self.generate = make_generate(cfg, STEPS, use_pallas=False)
        self.extend = (make_extend(cfg)
                       if "chunked" in paths else None)
        self.spec = (make_speculative_generate(cfg, None, steps=STEPS,
                                               k=K, use_pallas=False,
                                               trunk_layers=1)
                     if "spec" in paths else None)
        self.engine = None   # built on first use (needs real params);
        self.dev_engine = None
        # later seeds swap params and reset() — programs stay compiled
        if "forms" in paths:
            other = ("scan" if cfg.moe_prefill_form == "grouped"
                     else "grouped")
            ocfg = dataclasses.replace(cfg, moe_prefill_form=other,
                                       moe_group_bm=8)
            self.alt_generate = make_generate(ocfg, STEPS,
                                              use_pallas=False)

    def params(self, seed):
        p = stack_params(init_params(self.cfg, seed=seed))
        if self.quant_bits:
            p = quantize_params(p, bits=self.quant_bits)
        return p


@functools.lru_cache(maxsize=None)
def _harness(idx):
    name, cfg, bits, paths = ARCHES[idx]
    return _Harness(cfg, bits, paths)


def _check_seed(seed, h):
    rng = np.random.default_rng(seed)
    params = h.params(seed)
    prompt = rng.integers(0, h.cfg.vocab, (1, S0)).astype(np.int32)
    key = jax.random.PRNGKey(0)
    base = np.asarray(h.generate(params, jnp.asarray(prompt), key))[0]
    assert np.all((base >= 0) & (base < h.cfg.vocab))

    if "chunked" in h.paths:
        # chunked prefill: 4-token extend chunks reproduce the greedy
        # continuation token for token
        logits, cache = h.prefill(params, jnp.asarray(prompt[:, :4]))
        logits, cache = h.extend(params, cache,
                                 jnp.asarray(prompt[:, 4:]))
        tok = int(jnp.argmax(logits[0, -1]))
        got = [tok]
        for _ in range(STEPS - 1):
            logits, cache = h.step(params, cache,
                                   jnp.asarray([got[-1]], jnp.int32))
            got.append(int(jnp.argmax(logits[0])))
        assert got == base.tolist(), f"chunked diverged (seed {seed})"

    if "slotted" in h.paths:
        if h.engine is None:
            h.engine = BatchingEngine(params, h.cfg, slots=2,
                                      sync_steps=2, buckets=(S0, 2 * S0),
                                      use_pallas=False)
        h.engine.params = params
        h.engine._sparams = params
        h.engine.reset()
        rid = h.engine.submit(prompt[0], max_new=STEPS)
        decoy = rng.integers(0, h.cfg.vocab, (S0,)).astype(np.int32)
        h.engine.submit(decoy, max_new=STEPS)
        out = h.engine.run()[rid]
        assert out == base.tolist(), f"slotted diverged (seed {seed})"

    if "device" in h.paths:
        if h.dev_engine is None:
            h.dev_engine = DeviceBatchingEngine(
                params, h.cfg, slots=2, sync_steps=3, wave=1,
                buckets=(S0, 2 * S0), use_pallas=False)
        h.dev_engine.params = params
        h.dev_engine._sparams = params
        h.dev_engine.reset()
        rid = h.dev_engine.submit(prompt[0], max_new=STEPS)
        decoy = rng.integers(0, h.cfg.vocab, (S0 + 2,)).astype(np.int32)
        h.dev_engine.submit(decoy, max_new=STEPS)
        out = h.dev_engine.run()[rid]
        assert out == base.tolist(), \
            f"device scheduler diverged (seed {seed})"

    if "spec" in h.paths:
        toks, stats = h.spec(params, jnp.asarray(prompt))
        assert np.asarray(toks)[0].tolist() == base.tolist(), \
            f"speculative diverged (seed {seed})"
        assert int(stats["drafted"]) >= 0

    if "forms" in h.paths:
        alt = np.asarray(h.alt_generate(params, jnp.asarray(prompt),
                                        key))[0]
        assert alt.tolist() == base.tolist(), \
            f"moe form routing diverged (seed {seed})"


@pytest.mark.parametrize("arch_idx", range(len(ARCHES)),
                         ids=[a[0] for a in ARCHES])
def test_fuzz_serving_paths(arch_idx):
    h = _harness(arch_idx)
    for seed in range(arch_idx, N_SEEDS, len(ARCHES)):
        _check_seed(seed, h)


def test_fuzzer_catches_seeded_form_routing_bug(monkeypatch):
    """Existence proof: seed a silent top-1-instead-of-top-k combine bug
    into the grouped form (the classic routing-bug class — the second
    expert's contribution is dropped, no crash, plausible outputs) and
    assert the fuzzer FAILS on the scan-vs-grouped form comparison."""
    import tpp_mlir_tpu.serving.engine as eng

    real = eng._grouped_combine

    def buggy(gates, ys, rows, top_k):
        return real(gates, ys, rows, 1)   # silently top-1

    monkeypatch.setattr(eng, "_grouped_combine", buggy)
    _harness.cache_clear()   # rebuild programs under the bug
    idx = next(i for i, a in enumerate(ARCHES) if a[0] == "moe_grouped")
    try:
        with pytest.raises(AssertionError):
            for seed in range(idx, N_SEEDS, len(ARCHES)):
                _check_seed(seed, _harness(idx))
    finally:
        _harness.cache_clear()   # no bugged programs leak to other tests
