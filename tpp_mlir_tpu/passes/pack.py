"""Blocked-layout passes: pack-matmul, pack-vnni, propagate/fold/simplify.

Mirrors the reference's ToBlockLayoutAndBack.cpp family (SURVEY.md 2.3):

  pack-matmul        matmul -> blocked_matmul on packed operands
                     C[Mb,Nb,mb,nb] += A[Mb,Kb,mb,kb] * B[Nb,Kb,kb,nb]
  pack-vnni          bf16 brgemm/blocked_matmul B operand -> VNNI layout
  propagate-pack     push unpack past eltwise consumers so chains stay blocked
  constant-fold-pack pack(constant) -> pre-packed constant (weights packed at
                     compile time, not in the hot loop)
  simplify-pack      pack(unpack)/unpack(pack) cancellation

TPU note on defaults: the reference defaults to 32x32x32 blocks (AVX register
geometry). On TPU the MXU is 128x128 and VMEM holds megabytes, so default
blocks are chosen from the target descriptor; tiny tiles underutilize the MXU.
The reference's block-factor options are preserved (`tiles=(mb,nb,kb)`).
"""

from __future__ import annotations

from ..ir import Function, Module, Operation, TppBuilder
from ..utils.target import current_target
from .pass_manager import Pass, register


def _divisor(dim: int, target: int, mult: int = 1) -> int:
    """Largest d <= target with d % mult == 0 and dim % d == 0, else 0."""
    d = min(dim, target)
    d -= d % mult
    while d >= mult:
        if dim % d == 0:
            return d
        d -= mult
    return 0


def default_tiles(M: int, N: int, K: int, dtype: str) -> tuple[int, int, int]:
    """TPU-native default block factors (role of the reference's 32,32,32)."""
    t = current_target()
    sub, lane = t.min_tile(dtype)
    mb = _divisor(M, 256, sub) or _divisor(M, 256) or M
    # nb == kb wherever possible: then unpack(layer_i) and pack(layer_{i+1})
    # have identical recipes and cancel (simplify-pack), so an MLP chain stays
    # blocked end-to-end with no activation relayout — the layout-propagation
    # property the reference gets from PropagatePackUnPack + canonicalize.
    nb = _divisor(N, 512, lane) or _divisor(N, 512) or N
    kb = _divisor(K, 512, lane) or _divisor(K, 512) or K
    return mb, nb, kb


def _insert_before(func: Function, anchor: Operation, b: TppBuilder, emit):
    """Run `emit(builder)` and splice the emitted ops before `anchor`."""
    start = len(func.ops)
    result = emit(b)
    new_ops = func.ops[start:]
    del func.ops[start:]
    idx = func.ops.index(anchor)
    func.ops[idx:idx] = new_ops
    return result


@register
class PackMatmulPass(Pass):
    """matmul -> pack A/B/C + blocked_matmul + unpack
    (reference PackMatmul, ToBlockLayoutAndBack.cpp:484)."""

    name = "pack-matmul"

    def run_on_function(self, func: Function, module: Module) -> bool:
        # explicit option > module attr (tpp-gen --tiles) > target default
        tiles = self.options.get("tiles") or module.attrs.get("tiles")
        min_dim = self.options.get("min_dim", 2)  # don't pack tiny matmuls
        changed = False
        b = TppBuilder(func)
        for op in list(func.ops):
            if op.parent is None or op.opname != "tl.matmul":
                continue
            if op.attrs.get("transpose_b"):
                continue
            A, B, C = op.operands
            M, K = A.type.shape
            _, N = B.type.shape
            mb, nb, kb = tiles or default_tiles(M, N, K, A.type.dtype)
            if M % mb or N % nb or K % kb:
                continue
            if M // mb < 1 or (M // mb) * (N // nb) * (K // kb) < min_dim:
                # too few tiles to pay for the relayout (min_dim is the
                # reference's tiny-matmul threshold; the old nested check
                # only ever skipped the exact (1,1,1) case)
                continue

            def emit(bb):
                pa = bb.pack(A, (0, 1), (mb, kb))
                pb = bb.pack(B, (0, 1), (kb, nb), outer_perm=(1, 0))
                pc = bb.pack(C, (0, 1), (mb, nb))
                blocked = bb.blocked_matmul(pa, pb, pc)
                return bb.unpack(blocked, (0, 1), (mb, nb), (M, N))

            res = _insert_before(func, op, b, emit)
            func.replace_all_uses(op.result, res)
            func.erase(op)
            changed = True
        return changed


@register
class PackVNNIPass(Pass):
    """Relayout the B operand of bf16 contractions to VNNI
    (reference PackVNNI, ToBlockLayoutAndBack.cpp:642-680). On TPU this is a
    layout-parity feature: the MXU consumes bf16 natively, and the kernel
    indexes the packed operand directly without unpacking."""

    name = "pack-vnni"

    def run_on_function(self, func: Function, module: Module) -> bool:
        vf = self.options.get("vnni", 2)
        changed = False
        b = TppBuilder(func)
        for op in list(func.ops):
            if op.parent is None:
                continue
            if op.opname == "tl.matmul" and not op.attrs.get("transpose_b") \
                    and op.operands[0].type.dtype in ("bf16", "f16"):
                A, B, C = op.operands
                K, N = B.type.shape
                M = A.type.shape[0]
                if K % vf:
                    continue

                def emit(bb):
                    a3 = bb.reshape(A, (1, M, K))
                    packed = bb.create(
                        "tl.vnni_pack", [B],
                        [B.type.with_shape((K // vf, N, vf))],
                        {"vnni": vf}).result
                    p3 = bb.reshape(packed, (1, K // vf, N, vf))
                    r = bb.create("tl.vnni_brgemm", [a3, p3, C],
                                  [C.type], {"vnni": vf})
                    for key in ("fusion_group", "tile_m", "tile_n", "tile_k"):
                        if key in op.attrs:
                            r.attrs[key] = op.attrs[key]
                    return r.result

                res = _insert_before(func, op, b, emit)
                func.replace_all_uses(op.result, res)
                func.erase(op)
                changed = True
            elif op.opname == "tl.brgemm" and op.operands[0].type.dtype in ("bf16", "f16"):
                A, B, C = op.operands
                Bb, K, N = B.type.shape
                if K % vf:
                    continue

                def emit(bb):
                    packed = bb.create(
                        "tl.vnni_pack", [B],
                        [B.type.with_shape((Bb, K // vf, N, vf))],
                        {"vnni": vf}).result
                    return bb.create("tl.vnni_brgemm", [A, packed, C],
                                     [C.type], {"vnni": vf}).result

                res = _insert_before(func, op, b, emit)
                func.replace_all_uses(op.result, res)
                func.erase(op)
                changed = True
            elif op.opname == "tl.blocked_matmul" and not op.attrs.get("vnni") \
                    and op.operands[0].type.dtype in ("bf16", "f16"):
                A, B, C = op.operands
                Nb, Kb, kb, nb = B.type.shape
                if kb % vf:
                    continue

                def emit(bb):
                    packed = bb.create(
                        "tl.vnni_pack", [B],
                        [B.type.with_shape((Nb, Kb, kb // vf, nb, vf))],
                        {"vnni": vf}).result
                    return bb.create("tl.blocked_matmul", [A, packed, C],
                                     [C.type], {"vnni": vf}).result

                res = _insert_before(func, op, b, emit)
                func.replace_all_uses(op.result, res)
                func.erase(op)
                changed = True
        return changed


@register
class PropagatePackPass(Pass):
    """Push unpack past eltwise users so epilogues run on the blocked layout
    (reference PropagatePackUnPack, ToBlockLayoutAndBack.cpp:682-856)."""

    name = "propagate-pack"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        while self._round(func):
            changed = True
        return changed

    def _round(self, func: Function) -> bool:
        from ..ir.matcher import ELTWISE_UNARY

        b = TppBuilder(func)
        for op in list(func.ops):
            if op.parent is None or op.opname != "tl.unpack":
                continue
            if len(op.result.uses) != 1:
                continue
            user, uidx = op.result.uses[0]
            packed = op.operands[0]
            attrs = {k: op.attrs[k] for k in
                     ("inner_dims", "inner_tiles") if k in op.attrs}
            if "outer_perm" in op.attrs:
                attrs["outer_perm"] = op.attrs["outer_perm"]

            # unary(unpack(x)) -> unpack(unary(x))
            if user.opname in ELTWISE_UNARY:
                def emit(bb):
                    inner = bb.create(user.opname, [packed], [packed.type],
                                      dict(user.attrs)).result
                    return bb.create("tl.unpack", [inner],
                                     [user.result.type], attrs).result
                res = _insert_before(func, user, b, emit)
                func.replace_all_uses(user.result, res)
                func.erase(user)
                if not op.result.uses:
                    func.erase(op)
                return True

            # add/mul/...(unpack(x), smallvec) -> blocked binary on packed x
            if user.opname in ("tl.add", "tl.sub", "tl.mul", "tl.div",
                               "tl.max") and uidx == 0:
                other = user.operands[1]
                # only handle [M,N] (+) [N] with C packed [Mb,Nb,mb,nb]
                if (packed.type.rank == 4 and other.type.rank == 1
                        and tuple(op.attrs.get("inner_dims", ())) == (0, 1)
                        and "outer_perm" not in op.attrs):
                    mb_t, nb_t = op.attrs["inner_tiles"]
                    Mb, Nb, mb, nb = packed.type.shape
                    N = other.type.shape[0]
                    if nb_t == nb and Nb * nb == N:
                        def emit(bb):
                            pbias = bb.pack(other, (0,), (nb,))
                            rbias = bb.reshape(pbias, (1, Nb, 1, nb))
                            inner = bb.create(user.opname, [packed, rbias],
                                              [packed.type]).result
                            return bb.create("tl.unpack", [inner],
                                             [user.result.type], attrs).result
                        res = _insert_before(func, user, b, emit)
                        func.replace_all_uses(user.result, res)
                        func.erase(user)
                        if not op.result.uses:
                            func.erase(op)
                        return True

            # binary(unpack(x), unpack(y)) same layout -> unpack(binary(x,y))
            if user.opname in ("tl.add", "tl.sub", "tl.mul", "tl.div",
                               "tl.max"):
                other = user.operands[1 - uidx]
                oop = other.owner
                if (oop is not None and oop.opname == "tl.unpack"
                        and oop.attrs == op.attrs
                        and oop.operands[0].type == packed.type
                        and len(other.uses) == 1):
                    lhs = packed if uidx == 0 else oop.operands[0]
                    rhs = oop.operands[0] if uidx == 0 else packed

                    def emit(bb):
                        inner = bb.create(user.opname, [lhs, rhs],
                                          [packed.type]).result
                        return bb.create("tl.unpack", [inner],
                                         [user.result.type], attrs).result
                    res = _insert_before(func, user, b, emit)
                    func.replace_all_uses(user.result, res)
                    func.erase(user)
                    for dead in (op, oop):
                        if not dead.result.uses and dead.parent is not None:
                            func.erase(dead)
                    return True
        return False


@register
class ConstantFoldPackPass(Pass):
    """pack(constant) / vnni_pack(constant) -> pre-packed constant.

    This is the pass that keeps weight relayout out of the hot loop
    (reference ConstantFoldPack.cpp; 'pre-packed weights', SURVEY.md 2.3).
    The folded constant keeps the original init recipe plus the pack recipe;
    the executor materializes and packs once at parameter-init time.
    """

    name = "constant-fold-pack"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        b = TppBuilder(func)
        for op in list(func.ops):
            if op.parent is None or op.opname not in ("tl.pack", "tl.vnni_pack"):
                continue
            src = op.operands[0].owner
            if src is None or src.opname != "tl.constant":
                continue
            attrs = dict(src.attrs)
            # on a second fold (e.g. vnni_pack of an already pack-folded
            # constant) keep the true original shape
            attrs.setdefault("orig_shape", tuple(src.result.type.shape))
            if op.opname == "tl.pack":
                attrs["pack_inner_dims"] = tuple(op.attrs["inner_dims"])
                attrs["pack_inner_tiles"] = tuple(op.attrs["inner_tiles"])
                if "outer_perm" in op.attrs:
                    attrs["pack_outer_perm"] = tuple(op.attrs["outer_perm"])
            else:
                attrs["pack_vnni"] = op.attrs.get("vnni", 2)

            def emit(bb):
                return bb.create("tl.constant", [], [op.result.type],
                                 attrs).result

            res = _insert_before(func, op, b, emit)
            func.replace_all_uses(op.result, res)
            func.erase(op)
            if not src.result.uses:
                func.erase(src)
            changed = True
        return changed


@register
class SimplifyPackPass(Pass):
    """pack(unpack(x)) -> x and unpack(pack(x)) -> x when recipes match
    (reference SimplifyAndCanonicalizePack)."""

    name = "simplify-pack"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        for op in list(func.ops):
            if op.parent is None:
                continue
            inner = op.operands[0].owner if op.operands else None
            if inner is None:
                continue
            pair = {op.opname, inner.opname}
            if pair == {"tl.pack", "tl.unpack"} \
                    and op.attrs == inner.attrs \
                    and op.result.type == inner.operands[0].type:
                func.replace_all_uses(op.result, inner.operands[0])
                func.erase(op)
                if not inner.result.uses:
                    func.erase(inner)
                changed = True
        return changed


@register
class LowerPacksPass(Pass):
    """Decompose pack/unpack into reshape+transpose primitives
    (reference LowerPacksAndUnpacks.cpp). The executor can run tl.pack
    natively; this pass exists so the lowered pipeline contains only
    primitive data movement, which XLA fuses into neighbors."""

    name = "lower-packs"

    def run_on_function(self, func: Function, module: Module) -> bool:
        changed = False
        b = TppBuilder(func)
        for op in list(func.ops):
            if op.parent is None or op.opname not in ("tl.pack", "tl.unpack"):
                continue
            src = op.operands[0]
            dims = tuple(op.attrs["inner_dims"])
            tiles = tuple(op.attrs["inner_tiles"])
            perm = tuple(op.attrs.get("outer_perm", ()))

            if op.opname == "tl.pack":
                full = src.type.shape

                def emit(bb):
                    # split each tiled dim: d -> (d/t, t)
                    split = []
                    tile_pos = {}
                    for i, d in enumerate(full):
                        if i in dims:
                            t = tiles[dims.index(i)]
                            tile_pos[i] = len(split) + 1
                            split.extend([d // t, t])
                        else:
                            split.append(d)
                    x = bb.reshape(src, tuple(split))
                    # transpose: outer dims (in perm order) then tiles
                    outer_idx = []
                    pos = 0
                    outer_positions = []
                    for i, d in enumerate(full):
                        outer_positions.append(pos)
                        pos += 2 if i in dims else 1
                    order = list(range(len(full)))
                    if perm:
                        order = [order[p] for p in perm]
                    tr = [outer_positions[i] for i in order] + \
                         [tile_pos[i] for i in dims]
                    return bb.transpose(x, tuple(tr))
                res = _insert_before(func, op, b, emit)
            else:
                out_shape = op.result.type.shape

                def emit(bb):
                    rank = len(out_shape)
                    n_out = rank
                    # inverse of pack: transpose tiles back next to outers,
                    # then merge
                    order_outer = list(range(n_out))
                    if perm:
                        inv = [0] * len(perm)
                        for i, p in enumerate(perm):
                            inv[p] = i
                        order_outer = inv
                    tr = []
                    for i in range(n_out):
                        tr.append(order_outer[i])
                        if i in dims:
                            tr.append(n_out + dims.index(i))
                    x = bb.transpose(src, tuple(tr))
                    return bb.reshape(x, out_shape)
                res = _insert_before(func, op, b, emit)
            func.replace_all_uses(op.result, res)
            func.erase(op)
            changed = True
        return changed
