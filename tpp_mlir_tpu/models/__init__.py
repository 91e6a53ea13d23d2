"""Model builders: MLP/GEMM chains, conv blocks, MHA kernels."""
from .convnet import ConvConfig, build_convnet, conv_flops
from .mlp import MlpConfig, build_gemm, build_mlp, mlp_flops
from .resnet_block import build_resnet_block
