"""Conv passes: init-simplify, channel-block packing, conv->BRGEMM.

  conv-init-simplify  (reference ConvInitSimplify.cpp:121): conv into a
                      zero-fill followed by a bias add becomes a conv whose
                      accumulator is initialized with the broadcast bias.
  pack-conv2d         (reference PackConv2DNchwFchw/NhwcHwcf,
                      ToBlockLayoutAndBack.cpp:569-640): channel-blocked
                      layout O[N,Kb,P,Q,k] += I[N,Cb,H,W,c] * W[Kb,Cb,R,S,c,k]
  conv-to-brgemm      (reference RewriteConvsToMatmulOrBrgemm per
                      docs/ConvMapping.md): marks the blocked conv for the
                      conv-BRGEMM Pallas kernel, where the H/W collapse and
                      (Cb,R,S) batch-reduce happen in the kernel grid. On TPU
                      there is no separate loop-interchange step: the grid IS
                      the interchanged loop nest. Stride-1 only, like the
                      reference's mapping doc; strided convs stay on tl and
                      execute via XLA's native conv.
"""

from __future__ import annotations

from ..ir import Function, I64, Module, TppBuilder
from ..ir.matcher import is_zero_op
from ..utils.target import current_target
from .pack import _divisor, _insert_before
from .pass_manager import Pass, register


def _hoist_before(func: Function, anchor, value) -> bool:
    """Move the producer slice of `value` before `anchor` if legal."""
    from ..ir.core import walk_backward_slice

    idx = {id(o): i for i, o in enumerate(func.ops)}
    apos = idx[id(anchor)]
    chain = [o for o in walk_backward_slice(value) if idx[id(o)] > apos]
    if not chain:
        return True
    # legality: the chain must not (transitively) depend on the anchor
    chain_ids = {id(o) for o in chain}
    for o in chain:
        for v in o.operands:
            if v.owner is not None and idx[id(v.owner)] > apos \
                    and id(v.owner) not in chain_ids:
                return False
            if v.owner is anchor:
                return False
    chain.sort(key=lambda o: idx[id(o)])
    for o in chain:
        func.ops.remove(o)
    pos = func.ops.index(anchor)
    func.ops[pos:pos] = chain
    return True


@register
class ConvInitSimplifyPass(Pass):
    name = "conv-init-simplify"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        b = TppBuilder(func)
        for op in list(func.ops):
            if op.parent is None or op.opname != "tl.add":
                continue
            conv_val, other = op.operands
            conv = conv_val.owner
            if conv is None or not conv.opname.startswith("tl.conv2d"):
                conv_val, other = other, conv_val
                conv = conv_val.owner
            if conv is None or not conv.opname.startswith("tl.conv2d"):
                continue
            if len(conv_val.uses) != 1:
                continue
            dest = conv.operands[2]
            # The zero dest may be CSE-shared across convs: replacing THIS
            # conv's acc operand never mutates the zero itself, so sharing
            # is harmless — requiring a unique use here would re-create the
            # reference's DuplicateFill problem (Passes.td:334-342) instead
            # of absorbing it.
            if not is_zero_op(dest.owner):
                continue
            out_t = conv.result.type
            from ..ir import broadcast_shapes
            bias_shape = other.type.shape
            try:
                ok = broadcast_shapes(bias_shape, out_t.shape) == out_t.shape
            except ValueError:
                ok = False
            if not ok:
                # NCHW channel bias (K,) -> (K,1,1) so it broadcasts over H,W
                if conv.opname == "tl.conv2d_nchw_fchw" and \
                        len(bias_shape) == 1 and bias_shape[0] == out_t.shape[1]:
                    reshape_to = (bias_shape[0], 1, 1)
                else:
                    continue
            else:
                reshape_to = None

            if not _hoist_before(func, conv, other):
                continue

            def emit(bb):
                v = other
                if reshape_to is not None:
                    v = bb.reshape(v, reshape_to)
                return bb.broadcast(v, out_t.shape)

            init = _insert_before(func, conv, b, emit)
            conv.set_operand(2, init)
            func.replace_all_uses(op.result, conv.result)
            func.erase(op)
            changed = True
        return changed


@register
class ConvToNhwcPass(Pass):
    """NCHW convs -> NHWC form (transposes at the op boundary, cancelled /
    sunk by sink-transpose). NHWC is the TPU-native conv layout: channels
    land on the lane axis, so the NHWC conv-BRGEMM kernel needs ZERO
    relayout while NCHW pays one per call. Plays the role the reference's
    PackConv2DNchwFchw blocked relayout plays for AVX (ToBlockLayoutAndBack
    .cpp:569-640): normalize to the layout the microkernel wants, then let
    propagation push the conversions to the graph boundary. Measured on
    v5e: 2-6x over the NCHW-blocked path (PERF.md r2)."""

    name = "conv-to-nhwc"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        b = TppBuilder(func)
        for op in list(func.ops):
            if op.parent is None or op.opname != "tl.conv2d_nchw_fchw":
                continue
            I, W, O = op.operands
            strides = tuple(op.attrs.get("strides", (1, 1)))

            def emit(bb):
                ii = bb.transpose(I, (0, 2, 3, 1))   # NCHW -> NHWC
                wi = bb.transpose(W, (2, 3, 1, 0))   # FCHW -> HWCF
                oi = bb.transpose(O, (0, 2, 3, 1))
                res = bb.conv2d_nhwc_hwcf(ii, wi, oi, strides)
                return bb.transpose(res, (0, 3, 1, 2))

            res = _insert_before(func, op, b, emit)
            func.replace_all_uses(op.result, res)
            func.erase(op)
            changed = True
        return changed


@register
class Conv1x1ToMatmulPass(Pass):
    """1x1 stride-1 convs ARE GEMMs — rewrite them to matmul form so they
    ride the full matmul path (tile-and-fuse, fused epilogues, chains).
    Reference: RewriteConvToMatmulImpl.cpp (312 LoC) + the 1x1 case of
    RewriteConvsToMatmulOrBrgemm.cpp:578.

      NHWC: O[N*H*W, K] = I[N*H*W, C] @ W[C, K]      (pure reshapes)
      NCHW: O[n][K, H*W] = W[K, C] @ I[n][C, H*W]    (lhs-shared batch GEMM,
            zero relayout — the weight is a constant-index BlockSpec)
    """

    name = "conv1x1-to-matmul"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        b = TppBuilder(func)
        for op in list(func.ops):
            if op.parent is None:
                continue
            if tuple(op.attrs.get("strides", (1, 1))) != (1, 1):
                continue
            if op.opname == "tl.conv2d_nhwc_hwcf":
                I, W, O = op.operands
                N, H, Wd, C = I.type.shape
                R, S, _, K = W.type.shape
                if (R, S) != (1, 1):
                    continue
                # the flat (N*H*W, C) reshape is layout-preserving only when
                # the width is a sublane multiple; otherwise it is a real
                # HBM relayout and the NHWC-native conv kernel (fullrow, one
                # tap) runs the same GEMM with free in-kernel reshapes —
                # measured 2x faster on 14x14 (PERF.md)
                sub = 16 if I.type.dtype in ("bf16", "f16") else 8
                if Wd % sub != 0:
                    continue

                def emit(bb):
                    xi = bb.reshape(I, (N * H * Wd, C))
                    wi = bb.reshape(W, (C, K))
                    oi = bb.reshape(O, (N * H * Wd, K))
                    mm = bb.matmul(xi, wi, oi)
                    return bb.reshape(mm, O.type.shape)
            elif op.opname == "tl.conv2d_nchw_fchw":
                I, W, O = op.operands
                N, C, H, Wd = I.type.shape
                K, _, R, S = W.type.shape
                if (R, S) != (1, 1):
                    continue

                def emit(bb):
                    wi = bb.reshape(W, (K, C))
                    xi = bb.reshape(I, (N, C, H * Wd))
                    oi = bb.reshape(O, (N, K, H * Wd))
                    mm = bb.batch_matmul(wi, xi, oi, lhs_shared=True)
                    return bb.reshape(mm, O.type.shape)
            else:
                continue
            res = _insert_before(func, op, b, emit)
            func.replace_all_uses(op.result, res)
            func.erase(op)
            changed = True
        return changed


@register
class PatchifyConvToMatmulPass(Pass):
    """Patchify convs (stride == kernel: non-overlapping taps, the ViT
    patch embed) ARE GEMMs over reshaped pixel tiles: every output pixel
    reads a DISJOINT (R,S,C) block, so im2col is one reshape+transpose
    instead of a strided gather. Extends the stride-restricted conv
    rewrites of the reference (RewriteConvsToMatmulOrBrgemm.cpp:578
    keeps stride==1 only).

    MEASURED AND GATED OFF BY DEFAULT (pipeline option patchify=True):
    the same-run A/B on v5e (scripts/exp_patchify_ab.py,
    patchify_ab_r5.json) shows the rewrite LOSING on both ViT rows
    (p16 129 vs 97 us, p8 254 vs 227, reproduced to 0.1%): at C=3 the
    materialized 6-d transpose + boundary unaries cost more in-program
    than XLA's fused strided-conv lowering, and an in-kernel patchify
    BRGEMM is unlowerable (tap block lane dim S*C=24/48 violates the
    128-divisibility rule). Kept as an opt-in for lane-aligned channel
    counts where the flat reshape is free.

      NHWC: I(N,H,W,C) -> (N,ho,R,wo,S,C) --swap R,wo--> (N,ho,wo,R,S,C)
            -> (N*ho*wo, R*S*C) @ (R*S*C, K)
      NCHW: same with a (r,s,c,k) weight transpose and NCHW boundary
            transposes on the result (cancelled by sink-transpose when a
            consumer re-enters NHWC).
    """

    name = "patchify-conv-to-matmul"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        b = TppBuilder(func)
        for op in list(func.ops):
            if op.parent is None:
                continue
            strides = tuple(op.attrs.get("strides", (1, 1)))
            if strides == (1, 1):
                continue          # 1x1/unit-stride cases ride conv1x1/brgemm
            if op.opname == "tl.conv2d_nhwc_hwcf":
                I, W, O = op.operands
                N, H, Wd, C = I.type.shape
                R, S, _, K = W.type.shape
                if (R, S) != strides or H % R or Wd % S:
                    continue
                ho, wo = H // R, Wd // S
                M = N * ho * wo

                def emit(bb):
                    xi = bb.reshape(I, (N, ho, R, wo, S, C))
                    xt = bb.transpose(xi, (0, 1, 3, 2, 4, 5))
                    xf = bb.reshape(xt, (M, R * S * C))
                    wf = bb.reshape(W, (R * S * C, K))
                    of = bb.reshape(O, (M, K))
                    mm = bb.matmul(xf, wf, of)
                    return bb.reshape(mm, O.type.shape)
            elif op.opname == "tl.conv2d_nchw_fchw":
                I, W, O = op.operands
                N, C, H, Wd = I.type.shape
                K, _, R, S = W.type.shape
                if (R, S) != strides or H % R or Wd % S:
                    continue
                ho, wo = H // R, Wd // S
                M = N * ho * wo

                def emit(bb):
                    xi = bb.reshape(I, (N, C, ho, R, wo, S))
                    xt = bb.transpose(xi, (0, 2, 4, 3, 5, 1))
                    xf = bb.reshape(xt, (M, R * S * C))
                    wt = bb.transpose(W, (2, 3, 1, 0))     # -> (R,S,C,K)
                    wf = bb.reshape(wt, (R * S * C, K))
                    ot = bb.transpose(O, (0, 2, 3, 1))
                    of = bb.reshape(ot, (M, K))
                    mm = bb.matmul(xf, wf, of)
                    m4 = bb.reshape(mm, (N, ho, wo, K))
                    return bb.transpose(m4, (0, 3, 1, 2))
            else:
                continue
            res = _insert_before(func, op, b, emit)
            func.replace_all_uses(op.result, res)
            func.erase(op)
            changed = True
        return changed


@register
class PackConv2DPass(Pass):
    """NCHW channel-block packing. NHWC convs are intentionally NOT packed:
    their channel axes are already trailing/lane-aligned, so conv-to-brgemm
    lowers them directly to the NHWC-native kernel whose 'blocking' is pure
    BlockSpec index math — the packed layout the reference materializes
    (PackConv2DNhwcHwcf, ToBlockLayoutAndBack.cpp:569-640) exists only in
    the grid's index space, with zero data movement at any channel count."""

    name = "pack-conv2d"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        b = TppBuilder(func)
        block = self.options.get("block")
        for op in list(func.ops):
            if op.parent is None:
                continue
            if op.opname != "tl.conv2d_nchw_fchw":
                continue
            I, W, O = op.operands
            N, C, H, Wd = I.type.shape
            K, _, R, S = W.type.shape
            lane = current_target().min_tile(I.type.dtype)[1]
            cblk = block or _divisor(C, lane) or _divisor(C, 64) or C
            kblk = block or _divisor(K, lane) or _divisor(K, 64) or K
            if C % cblk or K % kblk:
                continue
            strides = tuple(op.attrs.get("strides", (1, 1)))

            def emit(bb):
                # I [N,C,H,W] -> [N,Cb,H,W,c]: pack dim1 then move tile last
                pi = bb.pack(I, (1,), (cblk,))            # [N,Cb,H,W,c]
                # pack() appends the tile dim: [N,Cb,H,W]+ (c) — correct.
                pw = bb.pack(W, (0, 1), (kblk, cblk),
                             outer_perm=(0, 1, 2, 3))      # [Kb,Cb,R,S,k,c]
                pw = bb.transpose(pw, (0, 1, 2, 3, 5, 4))  # [Kb,Cb,R,S,c,k]
                po = bb.pack(O, (1,), (kblk,))             # [N,Kb,P,Q,k]
                blocked = bb.blocked_conv2d(pi, pw, po, strides)
                return bb.unpack(blocked, (1,), (kblk,), O.type.shape)

            res = _insert_before(func, op, b, emit)
            func.replace_all_uses(op.result, res)
            func.erase(op)
            changed = True
        return changed


@register
class ConvToBrgemmPass(Pass):
    """Stride-1 convs -> xsmm.brgemm conv kernels:
    tl.blocked_conv2d -> layout="conv" (NCHW channel-blocked),
    tl.conv2d_nhwc_hwcf -> layout="conv_nhwc" (NHWC-native, zero relayout).
    """

    name = "conv-to-brgemm"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        b = TppBuilder(func)
        for op in list(func.ops):
            if op.parent is None:
                continue
            strides = tuple(op.attrs.get("strides", (1, 1)))
            if strides != (1, 1) and op.opname != "tl.conv2d_nhwc_hwcf":
                # strided convs only lower through the NHWC path, whose
                # default (xla) strategy handles any stride
                continue
            if op.opname == "tl.blocked_conv2d":
                I, W, O = op.operands
                N, Cb, H, Wd, c = I.type.shape
                Kb, _, R, S, _, k = W.type.shape
                attrs = {"layout": "conv", "N": N, "H": H, "W": Wd, "Cb": Cb,
                         "Kb": Kb, "R": R, "S": S, "c": c, "kblk": k,
                         "m": 0, "n": k, "k": c, "batch": Cb * R * S,
                         "strides": (1, 1), "dtype": I.type.dtype,
                         "flags": ()}
            elif op.opname == "tl.conv2d_nhwc_hwcf":
                I, W, O = op.operands
                # fuse a zero-pad producer into the conv (the xla strategy
                # pads natively; Pallas strategies pad outside the kernel) —
                # saves the pad's HBM round trip. Two shapes: a direct NHWC
                # pad, or pad-below-transpose at the NCHW graph boundary.
                hit = _match_pad(I)
                pad4, in_shape, make_input = (hit if hit is not None
                                              else (None, I.type.shape,
                                                    lambda bb: I))
                N, H, Wd, C = in_shape
                R, S, _, K = W.type.shape
                attrs = {"layout": "conv_nhwc", "N": N, "H": H, "W": Wd,
                         "C": C, "K": K, "R": R, "S": S,
                         "m": 0, "n": K, "k": C, "batch": C * R * S,
                         "strides": strides, "dtype": I.type.dtype,
                         "flags": ()}
                if pad4 is not None:
                    attrs["padding"] = pad4
            else:
                continue

            def emit(bb, _mk=None):
                i_val = _mk(bb) if _mk is not None else I
                d = bb.create("xsmm.brgemm_dispatch", [], [I64], attrs)
                inv = bb.create("xsmm.brgemm", [d.result, i_val, W, O],
                                [O.type])
                if "fusion_group" in op.attrs:
                    inv.attrs["fusion_group"] = op.attrs["fusion_group"]
                return inv.result

            if op.opname == "tl.conv2d_nhwc_hwcf":
                mk = make_input
                emit_fn = lambda bb, _mk=mk: emit(bb, _mk)  # noqa: E731
            else:
                emit_fn = emit

            res = _insert_before(func, op, b, emit_fn)
            func.replace_all_uses(op.result, res)
            func.erase(op)
            changed = True
        return changed


def _match_pad(I):
    """Match a fusable zero-pad feeding an NHWC conv input.

    Returns (pad4, unpadded_nhwc_shape, make_input(bb)) or None.
    pad4 = (h_lo, h_hi, w_lo, w_hi). Two shapes:
      * direct: conv(pad_nhwc(x))            -- spatial dims 1,2 padded;
      * boundary: conv(transpose(pad_nchw(x))) -- the pad rides below the
        NCHW->NHWC conversion transpose; the fused input is a NEW transpose
        of the unpadded x.
    """
    src = I.owner
    if src is None or len(I.uses) != 1:
        return None
    if src.opname == "tl.pad":
        lo, hi = tuple(src.attrs["lo"]), tuple(src.attrs["hi"])
        if len(lo) != 4 or lo[0] or hi[0] or lo[3] or hi[3]:
            return None
        x = src.operands[0]
        return ((lo[1], hi[1], lo[2], hi[2]), tuple(x.type.shape),
                lambda bb: x)
    if src.opname == "tl.transpose":
        pad = src.operands[0].owner
        if pad is None or pad.opname != "tl.pad" \
                or len(src.operands[0].uses) != 1:
            return None
        perm = tuple(src.attrs["perm"])
        lo, hi = tuple(pad.attrs["lo"]), tuple(pad.attrs["hi"])
        if len(lo) != 4:
            return None
        # transpose output dim d comes from pad dim perm[d]; only the
        # spatial output dims (1, 2) may be padded
        if lo[perm[0]] or hi[perm[0]] or lo[perm[3]] or hi[perm[3]]:
            return None
        x = pad.operands[0]
        shape = tuple(x.type.shape[perm[d]] for d in range(4))
        return ((lo[perm[1]], hi[perm[1]], lo[perm[2]], hi[perm[2]]),
                shape, lambda bb: bb.transpose(x, perm))
    return None
