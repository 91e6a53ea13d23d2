"""Serving subsystem: prefill + KV-cache autoregressive decode for the
GPT model family. See engine.py for the TPU-native design rationale;
quant.py for weight-only int8 (decode is bandwidth-bound — int8 weights
halve the dominant HBM read)."""

from .batching import (BatchingEngine, DeviceBatchingEngine,
                       init_slot_cache, init_staging, make_decode_loop,
                       make_device_loop, make_insert, make_stage_prefill)
from .beam import make_beam_generate
from .engine import (GptConfig, decode_cache_specs, decode_param_specs,
                     init_params, make_decode_step, make_extend,
                     make_generate, make_prefill, make_sampler,
                     make_tp_decode_step, params_from_torch, stack_params)
from .lora import lora_init, make_lora_train_step, merge_lora
from .quant import (QTensor, dequantize, dequantize_params, quantize,
                    quantize_params, quantized_bytes)
from .speculative import make_speculative_generate

__all__ = ["BatchingEngine", "DeviceBatchingEngine", "init_slot_cache",
           "init_staging", "make_decode_loop", "make_device_loop",
           "make_insert", "make_stage_prefill",
           "GptConfig", "init_params", "params_from_torch",
           "make_prefill", "make_decode_step", "make_extend",
           "make_generate",
           "make_sampler", "make_tp_decode_step", "decode_param_specs",
           "decode_cache_specs", "stack_params",
           "QTensor", "quantize", "dequantize", "quantize_params",
           "dequantize_params", "quantized_bytes",
           "make_speculative_generate", "make_beam_generate",
           "lora_init", "merge_lora", "make_lora_train_step"]
