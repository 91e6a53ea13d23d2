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
    that still leaves at least `min_factor` tiles, else the dim itself.

    Parity artifact, NOT the production path: tile selection goes through
    `pick_blocks` (the MXU/VMEM-measured heuristic) — this formula models
    cache-locality tiling on a CPU and is kept so the reference's behavior
    stays comparable (pinned by tests/passes/test_passes.py)."""
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
        # consumer-rooted producer-BFS worklist, the reference's
        # collectFusableProducers shape (TileConsumerAndFuseProducers.cpp:
        # 332-457): start from the LAST op of an eltwise chain and walk
        # operands upward; a producer joins only if ALL its users are
        # already in the worklist (hasAllUsersInWorklist — no recomputation),
        # which is exactly what admits diamonds like add(relu(y), y) and
        # residual adds whose both legs hang off the same contraction.
        for op in reversed(list(func.ops)):
            if op.parent is None or "fusion_group" in op.attrs:
                continue
            if op.opname not in FUSABLE_CONSUMERS and not is_contraction(op):
                continue
            # roots only: skip ops whose single use is an ungrouped fusable
            # eltwise (the walk will reach them from that consumer)
            if len(op.results) == 1 and len(op.result.uses) == 1:
                user, _ = op.result.uses[0]
                if user.opname in FUSABLE_CONSUMERS \
                        and "fusion_group" not in user.attrs:
                    continue
            worklist = {op}
            frontier = [op]
            anchor = op if is_contraction(op) else None
            depth = 0
            escaped = {id(v) for v in func.returns}
            while frontier and depth < max_depth:
                nxt = []
                for cur in frontier:
                    for v in cur.operands:
                        p = v.owner
                        if p is None or p in worklist \
                                or "fusion_group" in p.attrs:
                            continue
                        if len(p.results) != 1:
                            continue
                        if id(p.result) in escaped:
                            continue   # value escapes via return: external user
                        if not (p.opname in FUSABLE_CONSUMERS
                                or is_zero_op(p)
                                or (is_contraction(p) and anchor is None)):
                            continue
                        if not all(u in worklist
                                   for u, _ in p.result.uses):
                            continue   # fusing would recompute p elsewhere
                        worklist.add(p)
                        nxt.append(p)
                        if is_contraction(p):
                            anchor = p
                frontier = nxt
                depth += 1
            if anchor is None or len(worklist) < 2:
                continue
            gid = next(gid_counter)
            for g in worklist:
                g.attrs["fusion_group"] = gid
            self._assign_tiles(anchor)
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
            # user-explicit register blocking BINDS the kernel (the
            # reference's --registerBlocking contract); heuristic tiles
            # below are hints the kernel may recompute or ignore (e.g. the
            # weights-resident variant picks its own m block)
            anchor.attrs["register_blocked"] = True
        else:
            bm, bn, bk = pick_blocks(m, n, k, a.dtype)
        anchor.attrs.setdefault("tile_m", bm)
        anchor.attrs.setdefault("tile_n", bn)
        anchor.attrs.setdefault("tile_k", bk)
