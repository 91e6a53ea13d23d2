"""Model builders: MLP/GEMM chains, conv blocks, MHA kernels."""
from .mlp import MlpConfig, build_gemm, build_mlp, mlp_flops
