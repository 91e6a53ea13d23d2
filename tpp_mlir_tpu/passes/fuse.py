"""tile-and-fuse: fusion-group formation + tile-size selection.

The reference's TileConsumerAndFuseProducers (SURVEY.md 2.3,
TileConsumerAndFuseProducers.cpp) anchors on contractions, fuses eltwise
consumers/producers into the tile loops (emitting scf.forall), and picks tile
sizes via getTileForDim. On TPU the tile loops ARE the Pallas grid, so the
pass's job becomes:

  1. group a contraction with its fusable eltwise consumer chain
     (consumer-anchored, depth-limited, run to fixpoint like the reference's
     num-iters), recording `fusion_group` attrs;
  2. pick (tile_m, tile_n, tile_k) for the anchor from MXU/VMEM geometry —
     the getTileForDim equivalent — recorded on the anchor and consumed by
     the kernel builder as block-size overrides.

The later xsmm-combine pass turns a group into one fused kernel invoke; this
split mirrors the reference's TileConsumerAndFuseProducers -> CombineXsmm
staging.
"""

from __future__ import annotations

import itertools

from ..ir import Function, Module, Operation
from ..ir.matcher import (ELTWISE_BINARY, ELTWISE_UNARY, is_contraction,
                          is_zero_op)
from ..xsmm.kernels import pick_blocks
from .pass_manager import Pass, register

FUSABLE_CONSUMERS = ELTWISE_UNARY + ELTWISE_BINARY + ("tl.unpack",)


def get_tile_for_dim(dim: int, target: int, mult: int,
                     min_factor: int = 2) -> int:
    """Reference getTileForDim heuristic
    (TileConsumerAndFuseProducers.cpp:457): largest aligned divisor <= target
    that still leaves at least `min_factor` tiles, else the dim itself."""
    best = dim
    t = min(dim, target)
    t -= t % mult
    while t >= mult:
        if dim % t == 0 and dim // t >= min_factor:
            best = t
            break
        t -= mult
    return best


@register
class TileAndFusePass(Pass):
    name = "tile-and-fuse"

    def run_on_function(self, func: Function, module: Module) -> bool:
        max_depth = self.options.get("max_depth", 5)
        num_iters = self.options.get("num_iters", 3)
        changed = False
        for _ in range(num_iters):
            if not self._round(func, max_depth):
                break
            changed = True
        return changed

    def _round(self, func: Function, max_depth: int) -> bool:
        gid_counter = itertools.count(
            max((op.attrs.get("fusion_group", -1) for op in func.ops),
                default=-1) + 1)
        changed = False
        # start-from-last-consumer, like the reference (doFusion:645)
        for op in reversed(list(func.ops)):
            if not is_contraction(op) or "fusion_group" in op.attrs:
                continue
            group = [op]
            # fuse producers: zero-fill of the accumulator
            dest = op.operands[-1]
            if dest.owner is not None and is_zero_op(dest.owner) \
                    and len(dest.uses) == 1:
                group.append(dest.owner)
            # fuse consumer chain
            cur = op
            for _ in range(max_depth):
                if len(cur.results) != 1 or len(cur.result.uses) != 1:
                    break
                user, _ = cur.result.uses[0]
                if user.opname not in FUSABLE_CONSUMERS:
                    break
                if "fusion_group" in user.attrs:
                    break
                group.append(user)
                cur = user
            if len(group) == 1:
                continue
            gid = next(gid_counter)
            for g in group:
                g.attrs["fusion_group"] = gid
            self._assign_tiles(op)
            changed = True
        return changed

    def _assign_tiles(self, anchor: Operation) -> None:
        if anchor.opname == "tl.blocked_matmul":
            return  # block sizes are the packed tile sizes already
        shapes = {
            "tl.matmul": lambda a, b, c: (c.shape[0], c.shape[1], a.shape[1]),
            "tl.brgemm": lambda a, b, c: (c.shape[0], c.shape[1], a.shape[2]),
            "tl.vnni_brgemm": lambda a, b, c: (c.shape[0], c.shape[1],
                                               a.shape[2]),
        }
        get = shapes.get(anchor.opname)
        if get is None:
            return
        a, b, c = (v.type for v in anchor.operands)
        m, n, k = get(a, b, c)
        # explicit register-blocking override (the reference's
        # --registerBlocking flag, tpp-run.cpp:66-148) via pass option or
        # module attr, else the MXU/VMEM heuristic
        rb = self.options.get("blocks")
        if not rb and anchor.parent is not None \
                and anchor.parent.module is not None:
            rb = anchor.parent.module.attrs.get("register_blocking")
        if rb:
            bm, bn, bk = rb
        else:
            bm, bn, bk = pick_blocks(m, n, k, a.dtype)
        anchor.attrs.setdefault("tile_m", bm)
        anchor.attrs.setdefault("tile_n", bn)
        anchor.attrs.setdefault("tile_k", bk)
