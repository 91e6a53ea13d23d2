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

Options:
  pack=False  (TPU performance mode, DEFAULT) contractions stay flat —
              BlockSpec index maps provide the blocking with zero data
              movement — and chain-fusion merges whole MLP chains into one
              kernel with VMEM-resident weights. bf16 weights stay flat
              (the MXU's native layout; VNNI is an AVX concept). Measured on
              v5e this beats both the packed mode and straight XLA.
  pack=True   (parity mode, "default-tpp-passes-packed") physical blocked
              layouts + VNNI, like the reference. Tiles are MXU-sized;
              nb==kb keeps chains blocked end to end.
"""

from __future__ import annotations

from .pass_manager import register_pipeline


@register_pipeline("tpp-mapping")
def tpp_mapping(pack: bool = True, patchify: bool = False, **opts):
    pack_stages = [
        "pack-matmul",
        "pack-vnni",
        "propagate-pack",
        "constant-fold-pack",
        "simplify-pack",
    ] if pack else []
    # flat/TPU mode: normalize convs to NHWC (channels on lanes, zero
    # in-kernel relayout) and sink eltwise/transposes so conversions
    # survive only at graph boundaries; packed parity mode keeps the
    # reference's NCHW channel-blocked layout instead
    layout_stages = [] if pack else ["conv-to-nhwc", "sink-transpose"]
    return [
        *layout_stages,
        "fold-const-scale",
        "conv1x1-to-matmul",
        # patchify-conv-to-matmul is OFF by default: the same-run A/B
        # (patchify_ab_r5.json) measured the rewrite LOSING on both ViT
        # rows (p16 129 vs 97 us, p8 254 vs 227) — XLA's strided-conv
        # lowering fuses the non-overlapping im2col better than the
        # materialized transpose+GEMM chain, and an in-kernel patchify
        # BRGEMM is blocked by Mosaic lane constraints at C=3. Opt in
        # with patchify=True for channel counts where the flat reshape
        # is lane-aligned.
        *(["patchify-conv-to-matmul"] if patchify else []),
        "sink-reshape",
        "conv-init-simplify",
        "pack-conv2d",
        *pack_stages,
        "cleanup",
        "tile-and-fuse",
    ]


@register_pipeline("linalg-lowering")
def linalg_lowering(**opts):
    return [
        "conv-to-brgemm",
        "convert-tl-to-xsmm",
        "xsmm-combine",
        "fold-residual-acc",
        "qkv-merge",
        "fold-xsmm-flags",
        "chain-fusion",
        "cleanup",
        # after cleanup: dead A-operand reshapes from qkv-merge are gone,
        # so the LN's remaining single consumer is visible
        "fuse-ln-gemm",
        "cleanup",
        "verify-xsmm",
    ]


@register_pipeline("default-tpp-passes")
def default_tpp_passes(pack: bool = False, **opts):
    from .pass_manager import expand_pipeline

    return [
        "degeneralize",
        "fold-add-into-dest",
        "attention-fusion",
        "decompose-softmax",
        "cleanup",
        *expand_pipeline("tpp-mapping", pack=pack,
                         patchify=opts.get("patchify", False)),
        *expand_pipeline("linalg-lowering"),
        "cleanup",
    ]


@register_pipeline("default-tpp-passes-flat")
def default_tpp_passes_flat(**opts):
    """Alias: flat contractions + whole-chain fusion (the default)."""
    return default_tpp_passes(pack=False)


@register_pipeline("default-tpp-passes-packed")
def default_tpp_passes_packed(**opts):
    """Parity mode: physical blocked layouts + VNNI, like the reference."""
    return default_tpp_passes(pack=True)


@register_pipeline("default-pipeline")
def default_pipeline(**opts):
    return ["default-tpp-passes"]
