"""Runtime: executor (IR -> JAX), perf timing, tensor init, native helpers."""

from .executor import compile, interpret
from .perf import BenchResult, bench, model_flops
from .tensor_init import INIT_KINDS, apply_pack_recipe, tensor_init

__all__ = ["compile", "interpret", "BenchResult", "bench", "model_flops",
           "INIT_KINDS", "apply_pack_recipe", "tensor_init"]
