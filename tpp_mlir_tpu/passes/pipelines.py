"""Named pipelines — the pass-bundle skeleton.

Mirrors the reference's bundles (SURVEY.md 2.2):
  tpp-mapping         TppMapping.cpp:55-86   (pack + tile&fuse, tensor level)
  linalg-lowering     LinalgLowering.cpp:51-58 (tl->xsmm + combine + flags)
  default-tpp-passes  DefaultTppPasses.cpp:72-192
  default-pipeline    DefaultPipeline.cpp:139-222

The reference's bufferization, SCF parallelization, and LLVM lowering stages
have no TPU analogue: XLA performs buffer assignment, the Pallas grid is the
parallel loop nest, and Mosaic emits machine code. The bundle names are kept
so tools and tests read like the reference's.
"""

from __future__ import annotations

from .pass_manager import register_pipeline


@register_pipeline("tpp-mapping")
def tpp_mapping(**opts):
    return [
        "conv-init-simplify",
        "pack-conv2d",
        "pack-matmul",
        "pack-vnni",
        "propagate-pack",
        "constant-fold-pack",
        "simplify-pack",
        "cleanup",
        "tile-and-fuse",
    ]


@register_pipeline("linalg-lowering")
def linalg_lowering(**opts):
    return [
        "conv-to-brgemm",
        "convert-tl-to-xsmm",
        "xsmm-combine",
        "fold-xsmm-flags",
        "cleanup",
        "verify-xsmm",
    ]


@register_pipeline("default-tpp-passes")
def default_tpp_passes(**opts):
    return [
        "fold-add-into-dest",
        "decompose-softmax",
        "cleanup",
        "tpp-mapping",
        "linalg-lowering",
        "cleanup",
    ]


@register_pipeline("default-pipeline")
def default_pipeline(**opts):
    return ["default-tpp-passes"]
