"""Test configuration.

All unit/integration tests run on CPU with 8 virtual devices so that
(a) Pallas kernels run in interpret mode (fast, no TPU round trips), and
(b) sharding tests exercise a real multi-device mesh without TPU hardware
(mirrors the reference's capability-gated lit suites, test/lit.cfg.py).
Benchmarks (bench.py, benchmarks/driver.py) run on the real TPU chip.

NOTE: under the axon tunnel, JAX_PLATFORMS is preset to 'axon' and the env
var alone does not switch platforms — jax.config.update is required.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Suite wall time is dominated by XLA:CPU compiles of interpret-mode
# kernels (first exec ~4 s, repeat ~25 ms); numerics are differential
# (vs jnp oracles), so compile-time optimizations buy nothing here.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0"
             " --xla_llvm_disable_expensive_passes=true").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Test tiers (reference: check-tpp vs the full benchmark targets,
# /root/reference/CMakeLists.txt:79-140). Default `pytest -q` runs the FAST
# tier (< ~5 min on the 1-CPU box: pyproject addopts deselect `slow`);
# `make test-all` / CI / pre-commit run everything. The slow set is the
# measured long tail of the r4 full run (criterion: >~3 s/test, with at
# least one fast representative kept per feature area).
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SLOW_MODULES = {
    "tests/parallel/test_gpt_train.py",       # 77 s: full train steps
    "tests/parallel/test_optim.py",           # 34 s: zero1/accum oracles
    "tests/parallel/test_pipeline_train.py",  # 11 s
    "tests/parallel/test_sharded_grads.py",   # 16 s
    "tests/serving/test_batching.py",         # 65 s: continuous batching
    "tests/benchmarks/test_driver.py",        # 20 s: driver subprocesses
}

_SLOW_TESTS = {
    # serving: keep the cheapest exactness representative per feature fast
    "tests/serving/test_quant.py::test_kv_quant_decode_close_to_full_precision",
    "tests/serving/test_quant.py::test_kv_quant_stacked_matches_unstacked",
    "tests/serving/test_quant.py::test_kv_quant_tp_decode_matches_single_device",
    "tests/serving/test_quant.py::test_kv_quant_composes_with_weight_quant_and_gqa",
    "tests/serving/test_quant.py::test_quantized_tp_decode_matches_single_device",
    "tests/serving/test_quant.py::test_quantized_gqa_decode",
    "tests/serving/test_quant.py::test_quantized_generate_smoke",
    "tests/serving/test_quant.py::test_quantized_decode_teacher_forcing",
    "tests/serving/test_quant.py::test_int4_prefill_matches_dequantized_reference",
    "tests/serving/test_quant.py::test_int4_generate_and_batching_smoke",
    "tests/serving/test_moe_forms.py::test_sorted_prefill_form",
    "tests/serving/test_moe_forms.py::test_decode_step_forced_form_matches_auto",
    "tests/serving/test_moe_forms.py::test_ffn_forms_agree",
    "tests/serving/test_llama.py::test_llama_continuous_batching_matches_sequential",
    "tests/serving/test_llama.py::test_llama_quant_and_speculative",
    "tests/serving/test_llama.py::test_llama_decode_teacher_forcing_matches_prefill",
    "tests/serving/test_lora.py::test_train_step_moves_only_adapters_and_loss_drops",
    "tests/serving/test_lora.py::test_lora_llama_and_moe_families",
    "tests/serving/test_lora.py::test_merge_matches_trained_adapter_forward",
    "tests/serving/test_speculative.py::test_speculative_with_quantized_draft",
    "tests/serving/test_speculative.py::test_speculative_self_draft_accepts_everything",
    "tests/serving/test_speculative.py::test_speculative_self_draft_long_horizon",
    # r5b: keep one exactness representative per new speculative knob
    # fast (trunk: test_speculative_trunk_draft_exact; vocab:
    # test_speculative_truncated_draft_vocab_exact stays fast too)
    "tests/serving/test_speculative.py::test_speculative_truncated_self_draft_only_loses_rare_tokens",
    "tests/serving/test_speculative.py::test_speculative_full_trunk_accepts_everything",
    "tests/serving/test_speculative.py::test_speculative_trunk_composes_with_draft_vocab",
    "tests/serving/test_serving.py::test_decode_attn_pallas_int8_kv_slotted",
    "tests/serving/test_extend.py::test_extend_quantized_weights_stacked",
    "tests/serving/test_extend.py::test_extend_then_decode_chain",
    "tests/serving/test_moe.py::test_tpp_serve_moe_cli",
    "tests/serving/test_moe.py::test_moe_generate_and_batching",
    "tests/serving/test_beam.py::test_length_penalty_changes_norm_not_tokens_without_eos",
    "tests/tools/test_tools.py::test_cli_pipe_end_to_end",
    "tests/tools/test_tools.py::test_gen_run_roundtrip",
    "tests/parallel/test_parallel_modes.py::test_moe_matches_reference",
    "tests/serving/test_moe.py::test_moe_speculative_exact",
    "tests/serving/test_moe.py::test_moe_forms_match_oracle_and_each_other",
    "tests/serving/test_serving.py::test_sampler_top_p_nucleus",
    "tests/serving/test_serving.py::test_gqa_tp_decode_matches_single_device",
    "tests/frontend/test_torch_import.py::test_torch_transformer_bf16_import",
    "tests/serving/test_beam.py::test_beam_width_vocab_steps2_is_exhaustive",
    "tests/ir/test_perf_bench.py::test_tpp_run_n_falls_back_when_unchainable",
    "tests/passes/test_transformer_fusion.py::test_multilayer_encoder_fuses_per_layer",
    "tests/xsmm/test_kernels.py::test_wres_epilogue_schedules_agree",
    # r7: the flash-prefill fuzzer arches are breadth coverage; the fast
    # representative is test_prefill_flash_attn_matches_default
    "tests/serving/test_fuzz_configs.py::test_fuzz_serving_paths[flash_prefill]",
    "tests/serving/test_fuzz_configs.py::test_fuzz_serving_paths[flash_gqa]",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-tail tests deselected by default; run the "
        "full tier with `pytest -m 'slow or not slow'` (make test-all)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid.replace("\\", "/")
        mod = nid.split("::", 1)[0]
        base = nid.split("[", 1)[0]
        if mod in _SLOW_MODULES or base in _SLOW_TESTS \
                or nid in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
