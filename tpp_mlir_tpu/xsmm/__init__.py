"""XSMM-equivalent kernel layer: Pallas kernels behind a dispatch cache."""

from .cache import (KernelCache, binary_dispatch, blocked_matmul_dispatch,
                    brgemm_dispatch, fused_brgemm_dispatch, gemm_dispatch,
                    global_cache, unary_dispatch)
from .flags import (BinaryKey, BlockedMatmulKey, BrgemmKey, ConvBrgemmKey,
                    UnaryKey)
from .kernels import build_kernel, interpret_default, pick_blocks
from .reference import reference_kernel

__all__ = [
    "KernelCache", "binary_dispatch", "blocked_matmul_dispatch",
    "brgemm_dispatch", "fused_brgemm_dispatch", "gemm_dispatch",
    "global_cache", "unary_dispatch", "BinaryKey", "BlockedMatmulKey",
    "BrgemmKey", "ConvBrgemmKey", "UnaryKey", "build_kernel", "interpret_default",
    "pick_blocks", "reference_kernel",
]
