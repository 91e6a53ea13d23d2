"""Folding / normal-form passes at the tensor level.

  * fold-add-into-dest  (reference lib/TPP/Transforms/FoldAddIntoDest.cpp):
    add(contraction(A,B,zero), other) -> contraction(A,B,other); kills the
    separate add so the accumulator carries the addend.
  * decompose-softmax   (reference DecomposeAggregatedOps, Passes.td:375-380
    and mlir-gen lowerSoftmax): tl.softmax -> max/sub/exp/sum/div chain so the
    rest of the pipeline sees only primitive eltwise + reductions.
  * fold-cmp-select-to-max equivalent is unnecessary: tl.relu is already the
    normal form (reference needs LinalgConvertCompareSelectToMaximumf only
    because torch imports arrive as cmp+select).
"""

from __future__ import annotations

from ..ir import Function, Module, TppBuilder
from ..ir.matcher import is_contraction, is_zero_op
from .pass_manager import Pass, register

_CONTRACTION_DEST_INDEX = {  # which operand is the accumulator C
    "tl.matmul": 2, "tl.batch_matmul": 2, "tl.brgemm": 2,
    "tl.vnni_brgemm": 2, "tl.blocked_matmul": 2,
    "tl.conv2d_nchw_fchw": 2, "tl.conv2d_nhwc_hwcf": 2, "tl.blocked_conv2d": 2,
}


@register
class FoldAddIntoDestPass(Pass):
    name = "fold-add-into-dest"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        for op in list(func.ops):
            if op.parent is None or op.opname != "tl.add":
                continue
            a, b = op.operands
            if a.type != b.type:
                continue  # broadcasting add is a bias, not a dest-fold
            for contraction_val, other in ((a, b), (b, a)):
                c_op = contraction_val.owner
                if not is_contraction(c_op) and (
                        c_op is None or c_op.opname not in _CONTRACTION_DEST_INDEX):
                    continue
                if c_op is None or len(contraction_val.uses) != 1:
                    continue
                dest_idx = _CONTRACTION_DEST_INDEX.get(c_op.opname)
                if dest_idx is None:
                    continue
                dest = c_op.operands[dest_idx]
                if not is_zero_op(dest.owner) or len(dest.uses) != 1:
                    continue
                # `other` must dominate the contraction it becomes the
                # accumulator of; hoist its producer slice above the
                # contraction when legal (same as conv-init-simplify), else
                # skip — rewiring without this creates use-before-def.
                if other.owner is not None:
                    from .conv import _hoist_before
                    if not _hoist_before(func, c_op, other):
                        continue
                # Rewire: contraction accumulates into `other` directly.
                c_op.set_operand(dest_idx, other)
                func.replace_all_uses(op.result, contraction_val)
                func.erase(op)
                changed = True
                break
        return changed


@register
class DecomposeSoftmaxPass(Pass):
    name = "decompose-softmax"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        b = TppBuilder(func)
        for op in list(func.ops):
            if op.parent is None or op.opname != "tl.softmax":
                continue
            x = op.operands[0]
            axis = op.attrs.get("axis", -1)
            if axis < 0:
                axis += x.type.rank
            ops_before = len(func.ops)
            mx = b.reduce(x, "max", (axis,), keepdims=True)
            sh = b.sub(x, mx)
            ex = b.exp(sh)
            sm = b.reduce(ex, "sum", (axis,), keepdims=True)
            res = b.div(ex, sm)
            # Move the freshly appended ops to just before the softmax.
            new_ops = func.ops[ops_before:]
            del func.ops[ops_before:]
            idx = func.ops.index(op)
            func.ops[idx:idx] = new_ops
            func.replace_all_uses(op.result, res)
            func.erase(op)
            changed = True
        return changed
