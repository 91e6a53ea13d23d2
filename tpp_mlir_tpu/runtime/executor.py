"""Executor: compile/interpret IR functions as JAX programs.

Role of the reference's ExecutionEngine JIT path (tpp-run → LLVM JIT →
runtime calls, SURVEY.md 3.1). Two modes:

  * compile(module, fn):  trace every op into one JAX function and jax.jit
    it. xsmm invokes become Pallas kernel calls resolved through the
    dispatch cache at trace time (dispatches are pure and hoisted, exactly
    like the reference LICM-hoists dispatch calls out of the hot loop).
    Remaining tl ops (data movement, reductions, constants) trace to jnp —
    XLA fuses them around the kernels.
  * interpret(module, fn): eager evaluation op by op, including check.* ops
    as runtime assertions (the reference lowers check to loops+asserts via
    ConvertCheckToLoops) and perf.* timers.

Constants materialize at compile time via tensor_init (+ any constant-folded
pack recipe), so packed weights are prepared once, outside the hot loop.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import numpy as np

from ..ir import Function, Module, Operation
from ..ir.types import jnp_dtype
from ..xsmm.flags import (BinaryKey, BlockedMatmulKey, BrgemmKey,
                          ConvBrgemmKey, UnaryKey)
from ..xsmm.cache import global_cache
from .tensor_init import apply_pack_recipe, tensor_init


def _jnp():
    import jax.numpy as jnp
    return jnp


# ---------------------------------------------------------------------------
# tl-op evaluators (reference semantics; also the -linalg-to-loops analogue)
# ---------------------------------------------------------------------------

def _eval_tl(op: Operation, vals: list, interpret_kernels: bool):
    import jax
    jnp = _jnp()
    name = op.opname
    rt = op.results[0].type if op.results else None
    odt = jnp_dtype(rt) if rt is not None else None

    def acc32(x):
        return x.astype(jnp.float32)

    if name == "tl.constant":
        if op.attrs.get("init") == "literal":
            mod = op.parent.module if op.parent is not None else None
            lit = (mod.literals if mod is not None else {})[
                op.attrs["literal"]]
            arr = np.asarray(lit)
            arr = apply_pack_recipe(arr, op.attrs)
            return jnp.asarray(arr).astype(jnp_dtype(rt))
        arr = tensor_init(op.attrs.get("init", "zero"),
                          op.attrs.get("orig_shape", rt.shape),
                          rt.dtype, op.attrs.get("seed", 0),
                          op.attrs.get("value", 1.0))
        arr = apply_pack_recipe(arr, op.attrs)
        assert tuple(arr.shape) == rt.shape, \
            f"constant init shape {arr.shape} != {rt.shape}"
        return jnp.asarray(arr)
    if name == "tl.fill":
        return jnp.full(rt.shape, op.attrs["value"], odt)
    if name == "tl.zero":
        return jnp.zeros(rt.shape, odt)
    if name == "tl.matmul":
        a, b, c = vals
        if op.attrs.get("transpose_b"):
            b = b.T
        return (jnp.dot(acc32(a), acc32(b),
                        preferred_element_type=jnp.float32)
                + acc32(c)).astype(odt)
    if name == "tl.batch_matmul":
        a, b, c = vals
        af = acc32(a)
        if op.attrs.get("softmax_lhs"):
            af = jax.nn.softmax(af, axis=-1)
        if op.attrs.get("lhs_shared"):
            return (jnp.einsum("mk,bkn->bmn", af, acc32(b))
                    + acc32(c)).astype(odt)
        return (jnp.einsum("bmk,bkn->bmn", af, acc32(b))
                + acc32(c)).astype(odt)
    if name == "tl.brgemm":
        a, b, c = vals
        return (jnp.einsum("bmk,bkn->mn", acc32(a), acc32(b))
                + acc32(c)).astype(odt)
    if name == "tl.vnni_brgemm":
        a, b, c = vals
        B, kv, n, vf = b.shape
        b = b.transpose(0, 1, 3, 2).reshape(B, kv * vf, n)
        return (jnp.einsum("bmk,bkn->mn", acc32(a), acc32(b))
                + acc32(c)).astype(odt)
    if name == "tl.blocked_matmul":
        a, b, c = vals
        if op.attrs.get("vnni"):
            Nb, Kb, kv, nb, vf = b.shape
            b = b.transpose(0, 1, 2, 4, 3).reshape(Nb, Kb, kv * vf, nb)
        return (jnp.einsum("MKmk,NKkn->MNmn", acc32(a), acc32(b))
                + acc32(c)).astype(odt)
    if name in ("tl.relu",):
        return jnp.maximum(vals[0], 0)
    if name == "tl.identity":
        return vals[0]
    if name == "tl.exp":
        return jnp.exp(acc32(vals[0])).astype(odt)
    if name == "tl.negate":
        return -vals[0]
    if name == "tl.square":
        return vals[0] * vals[0]
    if name == "tl.sqrt":
        return jnp.sqrt(acc32(vals[0])).astype(odt)
    if name == "tl.rsqrt":
        return jax.lax.rsqrt(acc32(vals[0])).astype(odt)
    if name == "tl.tanh":
        return jnp.tanh(acc32(vals[0])).astype(odt)
    if name == "tl.gelu":
        return jax.nn.gelu(acc32(vals[0]), approximate=False).astype(odt)
    if name == "tl.gelu_tanh":
        return jax.nn.gelu(acc32(vals[0]), approximate=True).astype(odt)
    if name == "tl.cast":
        return vals[0].astype(odt)
    if name == "tl.pad":
        lo = op.attrs["lo"]
        hi = op.attrs["hi"]
        return jnp.pad(vals[0], tuple(zip(lo, hi)))
    if name == "tl.broadcast":
        return jnp.broadcast_to(vals[0], rt.shape)
    if name == "tl.transpose":
        return jnp.transpose(vals[0], op.attrs["perm"])
    if name == "tl.vnni_pack":
        vf = op.attrs.get("vnni", 2)
        x = vals[0]
        *lead, K, N = x.shape
        x = x.reshape(*lead, K // vf, vf, N)
        return jnp.moveaxis(x, -2, -1)
    if name in ("tl.add", "tl.sub", "tl.mul", "tl.div", "tl.max"):
        a, b = vals
        fn = {"tl.add": jnp.add, "tl.sub": jnp.subtract,
              "tl.mul": jnp.multiply, "tl.div": jnp.divide,
              "tl.max": jnp.maximum}[name]
        return fn(a, b).astype(odt)
    if name == "tl.reduce":
        fn = {"sum": jnp.sum, "max": jnp.max}[op.attrs["kind"]]
        return fn(vals[0], axis=tuple(op.attrs["axes"]),
                  keepdims=op.attrs.get("keepdims", True)).astype(odt)
    if name == "tl.attention":
        q, k, v = vals
        H = int(op.attrs.get("heads", 0) or 0)
        if H:   # token layout (B, S, H*D): split heads for the reference
            def sp(x):
                B_, s_, e_ = x.shape
                return x.reshape(B_, s_, H, e_ // H)
            q, k, v = sp(q), sp(k), sp(v)
            s = jnp.einsum("bqhd,bkhd->bhqk", acc32(q), acc32(k)) \
                * op.attrs.get("scale", 1.0)
            if op.attrs.get("causal"):
                S, Skv = s.shape[2], s.shape[3]
                s = jnp.where(jnp.tril(jnp.ones((S, Skv), bool))[None, None],
                              s, -1e30)
            p_ = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p_, acc32(v))
            return o.reshape(o.shape[0], o.shape[1], -1).astype(odt)
        s = jnp.einsum("bqd,bkd->bqk", acc32(q), acc32(k)) \
            * op.attrs.get("scale", 1.0)
        if op.attrs.get("causal"):
            S, Skv = s.shape[1], s.shape[2]
            s = jnp.where(jnp.tril(jnp.ones((S, Skv), bool))[None], s, -1e30)
        p_ = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", p_, acc32(v)).astype(odt)
    if name == "tl.generic":
        from ..ir.affine import eval_generic
        return eval_generic(op, vals)
    if name == "tl.layer_norm":
        x = acc32(vals[0])
        mean = jnp.mean(x, axis=-1, keepdims=True)
        d = x - mean
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        y = d * jax.lax.rsqrt(var + float(op.attrs.get("eps", 1e-5)))
        if len(vals) == 3:
            y = y * acc32(vals[1]) + acc32(vals[2])
        return y.astype(odt)
    if name == "tl.softmax":
        return jax.nn.softmax(acc32(vals[0]),
                              axis=op.attrs.get("axis", -1)).astype(odt)
    if name == "tl.reshape":
        return vals[0].reshape(rt.shape)
    if name == "tl.gather":
        return jnp.take(vals[0], vals[1], axis=0).astype(odt)
    if name == "tl.pack":
        return _pack_val(vals[0], op.attrs)
    if name == "tl.unpack":
        return _unpack_val(vals[0], op.attrs, rt.shape)
    if name in ("tl.max_pool2d", "tl.avg_pool2d"):
        kh, kw = op.attrs.get("window", (2, 2))
        sh, sw = op.attrs.get("strides", (kh, kw))
        x = vals[0]
        if name == "tl.max_pool2d":
            out = jax.lax.reduce_window(
                x, -jnp.inf if x.dtype != jnp.int32 else jnp.iinfo(
                    jnp.int32).min,
                jax.lax.max, (1, 1, kh, kw), (1, 1, sh, sw), "VALID")
        else:
            out = jax.lax.reduce_window(
                acc32(x), 0.0, jax.lax.add, (1, 1, kh, kw), (1, 1, sh, sw),
                "VALID") / (kh * kw)
        return out.astype(odt)
    if name == "tl.conv2d_nchw_fchw":
        i, w, o = vals
        out = jax.lax.conv_general_dilated(
            acc32(i), acc32(w), window_strides=op.attrs.get("strides", (1, 1)),
            padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return (out + acc32(o)).astype(odt)
    if name == "tl.conv2d_nhwc_hwcf":
        i, w, o = vals
        out = jax.lax.conv_general_dilated(
            acc32(i), acc32(w), window_strides=op.attrs.get("strides", (1, 1)),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (out + acc32(o)).astype(odt)
    if name == "tl.blocked_conv2d":
        i, w, o = vals
        N, Cb, H, W, c = i.shape
        Kb, _, R, S, _, k = w.shape
        nhwc = i.transpose(0, 2, 3, 1, 4).reshape(N, H, W, Cb * c)
        rsck = w.transpose(2, 3, 1, 4, 0, 5).reshape(R, S, Cb * c, Kb * k)
        out = jax.lax.conv_general_dilated(
            acc32(nhwc), acc32(rsck),
            window_strides=op.attrs.get("strides", (1, 1)),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        P, Q = out.shape[1], out.shape[2]
        out = out.reshape(N, P, Q, Kb, k).transpose(0, 3, 1, 2, 4)
        return (out + acc32(o)).astype(odt)
    raise NotImplementedError(f"no evaluator for {name}")


def _pack_val(x, attrs):
    jnp = _jnp()
    dims = tuple(attrs["inner_dims"])
    tiles = tuple(attrs["inner_tiles"])
    shape = x.shape
    split = []
    tile_axes = {}
    for i, d in enumerate(shape):
        if i in dims:
            t = tiles[dims.index(i)]
            tile_axes[i] = len(split) + 1
            split.extend([d // t, t])
        else:
            split.append(d)
    outer_positions = []
    pos = 0
    for i in range(len(shape)):
        outer_positions.append(pos)
        pos += 2 if i in dims else 1
    x = x.reshape(split)
    order = list(range(len(shape)))
    if "outer_perm" in attrs:
        order = [order[p] for p in attrs["outer_perm"]]
    perm = [outer_positions[i] for i in order] + [tile_axes[i] for i in dims]
    return jnp.transpose(x, perm)


def _unpack_val(x, attrs, out_shape):
    jnp = _jnp()
    dims = tuple(attrs["inner_dims"])
    n_out = len(out_shape)
    order_outer = list(range(n_out))
    if "outer_perm" in attrs:
        perm = attrs["outer_perm"]
        inv = [0] * len(perm)
        for i, p in enumerate(perm):
            inv[p] = i
        order_outer = inv
    tr = []
    for i in range(n_out):
        tr.append(order_outer[i])
        if i in dims:
            tr.append(n_out + dims.index(i))
    x = jnp.transpose(x, tr)
    return x.reshape(out_shape)


# ---------------------------------------------------------------------------
# xsmm-op evaluators: dispatch -> kernel key; invoke -> kernel call
# ---------------------------------------------------------------------------

def _dispatch_key(d: Operation, invoke: Operation):
    a = d.attrs
    out_dtype = invoke.results[0].type.dtype
    beta0 = "beta_0" in a.get("flags", ())
    prec = a.get("precision", "default")
    name = d.opname
    # tile_* attrs are binding only under user --register-blocking; the
    # heuristic hints from tile-and-fuse equal what pick_blocks recomputes,
    # and leaving them out of the key lets the kernel builder choose
    # variants (e.g. the weights-resident path) freely
    rb = bool(a.get("register_blocked"))

    def _tile(x):
        return a.get(f"tile_{x}", 0) if rb else 0

    if name == "xsmm.gemm_dispatch":
        return BrgemmKey(batch=1, m=a["m"], n=a["n"], k=a["k"],
                         dtype=a["dtype"], out_dtype=out_dtype, beta0=beta0,
                         transpose_b="transpose_b" in a.get("flags", ()),
                         precision=prec,
                         bm=_tile("m"), bn=_tile("n"), bk=_tile("k"))
    if name in ("xsmm.brgemm_dispatch", "xsmm.fused_brgemm_dispatch"):
        fused = name == "xsmm.fused_brgemm_dispatch"
        bk_kind = a.get("binary_kind") if fused else None
        if bk_kind == "none":
            bk_kind = None
        un_kind = a.get("unary_kind") if fused else None
        if un_kind in ("none", "identity"):
            un_kind = None
        layout = a.get("layout", "flat")
        if layout == "blocked":
            return BlockedMatmulKey(
                Mb=a["Mb"], Nb=a["Nb"], Kb=a["batch"],
                mb=a["m"], nb=a["n"], kb=a["k"], dtype=a["dtype"],
                out_dtype=out_dtype, beta0=beta0, vnni=a.get("vnni", 0),
                binary_kind=bk_kind, binary_bcast=a.get("binary_bcast",
                                                        "bcast_col"),
                unary_kind=un_kind, precision=prec)
        if layout == "conv":
            return ConvBrgemmKey(
                N=a["N"], H=a["H"], W=a["W"], Cb=a["Cb"], c=a["c"],
                Kb=a["Kb"], k=a["kblk"], R=a["R"], S=a["S"],
                stride_h=a.get("strides", (1, 1))[0],
                stride_w=a.get("strides", (1, 1))[1],
                dtype=a["dtype"], out_dtype=out_dtype, beta0=beta0,
                binary_kind=bk_kind,
                binary_bcast=a.get("binary_bcast", "bcast_col"),
                unary_kind=un_kind, precision=prec)
        if layout == "conv_nhwc":
            from ..xsmm.flags import ConvNhwcKey
            return ConvNhwcKey(
                N=a["N"], H=a["H"], W=a["W"], C=a["C"], K=a["K"],
                R=a["R"], S=a["S"],
                stride_h=a.get("strides", (1, 1))[0],
                stride_w=a.get("strides", (1, 1))[1],
                dtype=a["dtype"], out_dtype=out_dtype, beta0=beta0,
                binary_kind=bk_kind,
                binary_bcast=a.get("binary_bcast", "bcast_col"),
                unary_kind=un_kind, precision=prec,
                G=a.get("G", 0), cblk=a.get("cblk", 0),
                kblk=a.get("kblk_blk", 0),
                strategy=a.get("strategy", "auto"),
                pad=tuple(a.get("padding", (0, 0, 0, 0))))
        return BrgemmKey(batch=a["batch"], m=a["m"], n=a["n"], k=a["k"],
                         dtype=a["dtype"], out_dtype=out_dtype, beta0=beta0,
                         vnni=a.get("vnni", 0),
                         binary_kind=bk_kind,
                         binary_bcast=a.get("binary_bcast", "bcast_col"),
                         unary_kind=un_kind, precision=prec,
                         bm=_tile("m"), bn=_tile("n"), bk=_tile("k"),
                         prologue=a.get("prologue"),
                         prologue_affine=bool(a.get("prologue_affine", True)),
                         prologue_eps=float(a.get("prologue_eps", 1e-5)))
    if name == "xsmm.fused_chain_dispatch":
        from ..xsmm.flags import ChainKey

        def _kind(x):
            return None if x in (None, "none") else x
        return ChainKey(m=a["m"], dims=tuple(a["dims"]), dtype=a["dtype"],
                        out_dtype=out_dtype,
                        has_bias=bool(a.get("has_bias", True)),
                        unary_kind=_kind(a.get("unary_kind")),
                        last_unary=_kind(a.get("last_unary")),
                        precision=prec)
    if name == "xsmm.attention_dispatch":
        from ..xsmm.flags import FlashMhaKey
        return FlashMhaKey(batch=a["batch"], seq=a["seq"],
                           seq_kv=a["seq_kv"], head_dim=a["head_dim"],
                           dtype=a["dtype"], out_dtype=out_dtype,
                           scale=float(a.get("scale", 1.0)),
                           causal=bool(a.get("causal", False)),
                           precision=prec,
                           bq=int(a.get("bq", 0)), bk=int(a.get("bk", 0)),
                           strategy=a.get("strategy", "auto"),
                           heads=int(a.get("heads", 0)),
                           qkv_packed=bool(a.get("qkv_packed", False)))
    if name == "xsmm.batch_gemm_dispatch":
        from ..xsmm.flags import BatchMatmulKey
        return BatchMatmulKey(batch=a["batch"], m=a["m"], n=a["n"], k=a["k"],
                              dtype=a["dtype"], out_dtype=out_dtype,
                              beta0=beta0,
                              softmax_lhs=bool(a.get("softmax_lhs", False)),
                              lhs_shared=bool(a.get("lhs_shared", False)),
                              precision=prec)
    if name == "xsmm.layer_norm_dispatch":
        from ..xsmm.flags import LayerNormKey
        return LayerNormKey(m=a["m"], n=a["n"], dtype=a["dtype"],
                            out_dtype=out_dtype,
                            affine=bool(a.get("affine", True)),
                            eps=float(a.get("eps", 1e-5)), precision=prec)
    if name == "xsmm.unary_dispatch":
        return UnaryKey(kind=a["kind"], shape=tuple(a.get("shape", ())),
                        dtype=a["dtype"], out_dtype=out_dtype,
                        out_shape=tuple(invoke.results[0].type.shape),
                        perm=tuple(a["perm"]) if "perm" in a else None,
                        vnni=a.get("vnni", 2))
    if name == "xsmm.binary_dispatch":
        return BinaryKey(kind=a["kind"], shape_a=tuple(a.get("shape_a", ())),
                         shape_b=tuple(a.get("shape_b", ())),
                         dtype=a["dtype"], out_dtype=out_dtype,
                         bcast_a=a.get("bcast_a", "none"),
                         bcast_b=a.get("bcast_b", "none"))
    raise NotImplementedError(name)


def _normalize_bias(key, bias):
    """Reshape the fused-kernel D operand to what the kernel expects."""
    from ..xsmm.flags import ConvNhwcKey

    jnp = _jnp()
    if isinstance(key, BlockedMatmulKey):
        return bias.reshape(key.Nb, key.nb)
    if isinstance(key, ConvBrgemmKey):
        return bias.reshape(key.Kb, key.k)
    if isinstance(key, ConvNhwcKey) and key.binary_bcast != "none":
        return bias.reshape(1, key.K)
    return bias  # BrgemmKey wrapper handles 1-D/scalar forms


def _eval_xsmm(op: Operation, vals: list,
               interpret_kernels: bool | None):
    name = op.opname
    if name.endswith("_dispatch"):
        return None  # resolved by the invoke
    d = op.operands[0].owner
    key = _dispatch_key(d, op)
    # tri-state passes through unchanged: None = interpret_default()
    # heuristic, False = force compiled (Mosaic), True = force interpret
    fn = global_cache().dispatch(key, interpret_kernels)
    if name == "xsmm.gemm":
        _, a, b, c = vals
        return fn(a[None], b[None], None if key.beta0 else c)
    if name == "xsmm.brgemm":
        _, a, b, c = vals
        return fn(a, b, None if key.beta0 else c)
    if name == "xsmm.fused_brgemm":
        _, a, b, c, bias = vals[:5]
        bias = _normalize_bias(key, bias) if key.binary_kind else None
        if getattr(key, "prologue", None) and key.prologue_affine:
            gamma, beta = vals[5], vals[6]   # trailing LN operands
            return fn(a, b, None if key.beta0 else c, bias,
                      gamma=gamma, beta=beta)
        return fn(a, b, None if key.beta0 else c, bias)
    if name == "xsmm.attention":
        if len(vals) == 2:          # qkv_packed: one [Q|K|V] operand
            return fn(vals[1], vals[1], vals[1])
        return fn(vals[1], vals[2], vals[3])
    if name == "xsmm.batch_gemm":
        _, a_, b_, c_ = vals
        return fn(a_, b_, None if key.beta0 else c_)
    if name == "xsmm.fused_chain":
        return fn(vals[1], *vals[2:])
    if name == "xsmm.unary":
        return fn(vals[1])
    if name == "xsmm.binary":
        return fn(vals[1], vals[2])
    if name == "xsmm.layer_norm":
        return fn(*vals[1:])
    raise NotImplementedError(name)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

def _run_func(func: Function, args, interpret_kernels: bool | None,
              with_checks: bool, check_cb=None, preset=None,
              host_timers: bool = True):
    env: dict[int, Any] = dict(preset) if preset else {}
    for a, v in zip(func.args, args):
        env[id(a)] = v
    for op in func.ops:
        if preset and op.results and id(op.results[0]) in preset:
            continue  # hoisted constant: value arrived as an argument
        vals = [env.get(id(v)) for v in op.operands]
        if op.opname.startswith("xsmm."):
            if op.opname.endswith("_dispatch"):
                # pure; resolved by the consuming invoke at trace time (the
                # LICM-hoisted dispatch of the reference hot loop)
                env[id(op.results[0])] = None
                continue
            res = _eval_xsmm(op, vals, interpret_kernels)
        elif op.opname.startswith("perf."):
            res = _eval_perf(op, vals, interpret_kernels,
                             host_timers=host_timers)
        elif op.opname.startswith("check."):
            if with_checks and check_cb is not None:
                check_cb(op, vals)
            res = None
        else:
            res = _eval_tl(op, vals, interpret_kernels)
        if op.results:
            if res is None:
                continue
            if len(op.results) > 1:
                for r, v in zip(op.results, res):
                    env[id(r)] = v
            else:
                env[id(op.results[0])] = res
    return tuple(env[id(v)] for v in func.returns)


def _eval_perf(op: Operation, vals, interpret_kernels=None,
               host_timers: bool = True):
    if not host_timers and op.opname != "perf.sink":
        # under jit tracing, a host perf_counter difference would bake
        # into the HLO as a constant (meaningless timing) and perf.bench's
        # completion forces would crash on tracers — refuse loudly; the
        # CLI bench paths compile with jit=False (run_module/_eval_bench)
        raise NotImplementedError(
            f"{op.opname} cannot run inside a jitted program; compile "
            "with jit=False (the bench harness times whole compiled "
            "programs instead)")
    if op.opname == "perf.timer_start":
        return time.perf_counter_ns()
    if op.opname == "perf.timer_stop":
        return (time.perf_counter_ns() - vals[0]) / 1e9
    if op.opname == "perf.sink":
        return None
    if op.opname == "perf.bench":
        return _eval_bench(op, vals, interpret_kernels)
    raise NotImplementedError(op.opname)


def _eval_bench(op: Operation, vals, interpret_kernels):
    """perf.bench semantics (reference PerfOps.td:99-188 + the
    ConvertPerfToLoops lowering). Two lowerings, mirroring VERDICT r1 item 5:

      1. in-kernel timed region: when the callee qualifies as a single
         chain/fc kernel (extract_bench_kernel), the n-iteration loop runs
         INSIDE one Pallas kernel with weights VMEM-resident
         (ChainKey.repeats) — the reference's hot-cache timed loop;
      2. scan chain: a jitted lax.scan of n chained callee applications,
         timed with the two-length slope so tunnel/dispatch overhead
         cancels (the scf.for + timers the reference emits).
    """
    import jax
    import jax.numpy as jnp

    from ..xsmm.kernels import interpret_default

    module = op.parent.module
    callee = op.attrs["callee"]
    n = int(op.attrs["n"])
    nres = len(op.results) - 1
    interp = (interpret_kernels if interpret_kernels is not None
              else interpret_default())

    def _force(r):
        # jax.block_until_ready can return before execution under the axon
        # tunnel (see runtime/perf.py); a scalar host read cannot
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))

    def timed(f, reps=3):
        best, last = float("inf"), None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = f()
            _force(r)
            best = min(best, time.perf_counter() - t0)
            last = r
        return best, last

    # Lowering 1: in-kernel timed region
    if not interp and nres == 1:
        ext = extract_bench_kernel(module, callee)
        if ext is not None:
            import dataclasses

            key, get_operands = ext
            try:
                fn = global_cache().dispatch(
                    dataclasses.replace(key, repeats=n),
                    interpret_kernels)
            except ValueError:
                # warm builder rejected the shape (e.g. attention KV +
                # scores exceed the VMEM gate): fall back to the scan
                # chain instead of crashing the bench run
                ext = None
        if ext is not None:
            operands = get_operands(vals)
            _force(fn(*operands))  # compile, excluded
            best, out = timed(lambda: fn(*operands))
            # re-apply any skipped layout tail (tl.unpack/tl.reshape) so
            # the bench RESULT carries the op's declared type, not the
            # kernel's packed layout
            post = getattr(get_operands, "post", None)
            if post is not None:
                out = post(out)
            return (jnp.float32(best / n), out)

    # Lowering 2: scan chain. Checks are enforced on the single-shot
    # result path, not inside the timed scan: the check wrapper's host
    # bool() would crash on tracers in the scan body and it hides
    # raw_fn/hoisted_literals (the >=64KB-literal HTTP-413 hazard).
    step = compile(module, callee, interpret_kernels=interpret_kernels,
                   jit=not interp, enforce_checks=False)
    if interp:
        # eager host loop — the interpreter's reference semantics
        cur = list(vals)
        outs = tuple(cur[:nres])
        t0 = time.perf_counter()
        for _ in range(n):
            res = step(*cur)
            outs = res if isinstance(res, tuple) else (res,)
            cur[:len(outs)] = outs
        mean = (time.perf_counter() - t0) / n
        return (_jnp().float32(mean),) + tuple(outs)

    # thread hoisted literal constants (compile() trailing args) through
    # the outer jit as arguments — calling the hoist wrapper inside this
    # trace would re-embed them as closure constants in the chain's HLO
    lits = tuple(getattr(step, "hoisted_literals", ()))
    raw = getattr(step, "raw_fn", step)
    na = len(vals)

    def chain(k):
        def loop(*all_args):
            args, ls = all_args[:na], all_args[na:]

            def body(carry, _):
                res = raw(*carry, *ls)
                outs = res if isinstance(res, tuple) else (res,)
                return tuple(list(outs) + list(carry[len(outs):])), None
            final, _ = jax.lax.scan(body, tuple(args), None, length=k)
            return final[:nres]
        jitted = jax.jit(loop)
        if not lits:
            return jitted
        return lambda *args: jitted(*args, *lits)

    longf = chain(n)
    _force(longf(*vals))
    if n < 8:
        best, finals = timed(lambda: longf(*vals))
        return (jnp.float32(best / n),) + tuple(finals)
    shortf = chain(n // 4)
    _force(shortf(*vals))
    t_short, _ = timed(lambda: shortf(*vals))
    t_long, finals = timed(lambda: longf(*vals))
    mean = max((t_long - t_short) / (n - n // 4), 1e-12)
    return (jnp.float32(mean),) + tuple(finals)


HOIST_MIN_BYTES = 1 << 16


def _hoistable_constants(func: Function):
    """tl.constant ops whose materialized value should be passed to the
    jitted program as a runtime ARGUMENT instead of a baked HLO literal.

    Closure/trace-time constants embed in the serialized HLO; for torch-
    imported models every weight is a literal (frontend/torch_import.py),
    so GPT-2-class programs carried hundreds of MB of literals — over the
    axon tunnel's remote-compile request size limit (measured: HTTP 413 on
    the 12-layer s1024 row). Arguments travel over the runtime transfer
    channel once, and inside scan chains they are loop-invariant so XLA
    LICM still hoists their derived casts/packs out of the hot loop."""
    ops = []
    for op in func.ops:
        if op.opname != "tl.constant" or not op.results:
            continue
        rt = op.results[0].type
        n = 1
        for d in rt.shape:
            n *= d
        if n * np.dtype(jnp_dtype(rt)).itemsize >= HOIST_MIN_BYTES:
            ops.append(op)
    return ops


def compile(module: Module, func_name: str = "entry",
            interpret_kernels: bool | None = None,
            jit: bool = True, enforce_checks: bool = True) -> Callable:
    """Build a (jitted) JAX callable for `func_name`.

    check.* ops lower INTO the compiled program as scalar status tensors
    (jnp.isfinite / max-abs-diff reductions) enforced on the host after each
    call — the role of the reference's ConvertCheckToLoops
    (lib/TPP/Conversion/ConvertCheckToLoops/ConvertCheckToLoops.cpp:1-191),
    which compiles checks into the optimized binary so integration tests
    assert on the real artifact. Programs without check ops pay nothing
    (no extra outputs, no host sync). perf.* ops require jit=False (host
    timers inside a traced program would bake trace-time constants into
    the HLO; _eval_perf raises) — the bench harness times whole compiled
    programs on device, matching perf.bench semantics.

    Large tl.constant values (>= HOIST_MIN_BYTES) are evaluated once here
    and passed to the jitted program as trailing arguments (see
    _hoistable_constants); the returned callable keeps the original
    signature and exposes `.raw_fn` / `.hoisted_literals` so bench scan
    chains can thread them through an outer jit without re-embedding."""
    import jax

    func = module[func_name]
    check_ops = [op for op in func.ops if op.opname.startswith("check.")]

    hoist_ops = _hoistable_constants(func) if jit else []
    hoist_vals = tuple(_eval_tl(op, [], interpret_kernels)
                       for op in hoist_ops)
    hoist_ids = tuple(id(op.results[0]) for op in hoist_ops)
    n_args = len(func.args)

    if not check_ops or not enforce_checks:
        def fn(*args):
            preset = dict(zip(hoist_ids, args[n_args:]))
            outs = _run_func(func, args[:n_args], interpret_kernels,
                             with_checks=False, preset=preset,
                             host_timers=not jit)
            return outs[0] if len(outs) == 1 else outs

        if not jit:
            return fn
        jitted = jax.jit(fn)
        if not hoist_ops:
            return jitted

        def hoist_wrapper(*args):
            return jitted(*args, *hoist_vals)

        hoist_wrapper.raw_fn = fn
        hoist_wrapper.hoisted_literals = hoist_vals
        return hoist_wrapper

    def fn_checked(*args):
        statuses = []

        def cb(op, vals):
            statuses.append(_traced_check(op, vals))

        preset = dict(zip(hoist_ids, args[n_args:]))
        outs = _run_func(func, args[:n_args], interpret_kernels,
                         with_checks=True, check_cb=cb, preset=preset,
                         host_timers=not jit)
        res = outs[0] if len(outs) == 1 else outs
        return res, tuple(statuses)

    inner = jax.jit(fn_checked) if jit else fn_checked

    def wrapper(*args):
        res, statuses = inner(*args, *hoist_vals)
        for op, (ok, aux) in zip(check_ops, statuses):
            if not bool(ok):           # host read = completion barrier
                detail = ""
                if op.opname == "check.expect_almost_eq":
                    thr = op.attrs.get("threshold", 1e-5)
                    detail = f": max |diff| {float(aux)} > {thr}"
                raise AssertionError(
                    f"{op.opname} failed in compiled program{detail}")
        return res

    return wrapper


def _traced_check(op: Operation, vals):
    """Status tensor (ok: bool scalar, aux: f32 scalar) for a check op,
    traceable under jit."""
    import jax.numpy as jnp

    if op.opname == "check.expect_sane":
        ok = jnp.isfinite(vals[0].astype(jnp.float32)).all()
        return ok, jnp.float32(0)
    if op.opname == "check.expect_almost_eq":
        thr = op.attrs.get("threshold", 1e-5)
        diff = jnp.max(jnp.abs(vals[0].astype(jnp.float32)
                               - vals[1].astype(jnp.float32)))
        return diff <= thr, diff
    if op.opname == "check.expect_true":
        v = vals[0]
        ok = v if getattr(v, "ndim", 0) == 0 else jnp.asarray(v).all()
        return jnp.asarray(ok, bool), jnp.float32(0)
    raise NotImplementedError(op.opname)


def extract_bench_kernel(module: Module, func_name: str = "entry"):
    """If the lowered function is a single chain/fc kernel application, return
    (ChainKey, get_operands) so the harness can time it with the in-kernel
    perf.bench region (ChainKey.repeats — warm VMEM weights, SURVEY's
    perf.bench semantics). Returns None when the program shape doesn't
    qualify (then the scan-based bench applies).

    get_operands(args) eagerly evaluates the kernel's (x, w/b...) operands
    (constants, reshapes, packs — the one-time setup the reference also
    excludes from its timed loop)."""
    from ..xsmm.flags import ChainKey

    func = module[func_name]
    invokes = [op for op in func.ops
               if op.opname.startswith("xsmm.")
               and not op.opname.endswith("_dispatch")]
    if len(invokes) != 1 or len(func.returns) != 1:
        return None
    inv = invokes[0]
    # allow a pure-layout epilogue (unpack/reshape) between invoke and
    # return: boundary relayout is one-time teardown, excluded from the
    # warm timed region exactly like the input packs are
    tail_ops = []
    tail = func.returns[0].owner
    while tail is not None and tail is not inv \
            and tail.opname in ("tl.unpack", "tl.reshape"):
        tail_ops.append(tail)
        tail = tail.operands[0].owner
    if tail is not inv:
        return None
    tail_ops.reverse()

    def _with_post(get_operands):
        """Attach a .post that re-applies the skipped layout tail to the
        bench output, so the result carries the op's DECLARED type (the
        unpacked shape), matching what the scan path returns."""
        if tail_ops:
            def post(out):
                import jax.numpy as jnp

                for top in tail_ops:
                    if top.opname == "tl.reshape":
                        out = jnp.reshape(out, top.result.type.shape)
                    else:
                        out = _unpack_val(out, top.attrs,
                                          top.result.type.shape)
                return out
            get_operands.post = post
        return get_operands

    d = inv.operands[0].owner

    if inv.opname == "xsmm.fused_chain":
        key = _dispatch_key(d, inv)
        wb_ops = inv.operands[1:]
    elif inv.opname in ("xsmm.fused_brgemm", "xsmm.brgemm", "xsmm.gemm") \
            and d.attrs.get("layout") == "blocked":
        # packed-parity warm bench (BlockedMatmulKey.repeats): the packed
        # weight stays VMEM-resident, output feeds back as the packed
        # activation — legal for square feedback only
        a = d.attrs
        if a.get("prologue"):
            return None   # BlockedMatmulKey cannot express an LN prologue
        key = _dispatch_key(d, inv)
        if key.Nb != key.Kb or key.nb != key.kb:
            return None
        if key.binary_kind not in (None, "add") \
                or key.binary_bcast != "bcast_col":
            return None
        if not key.beta0:
            return None
        from ..utils.target import current_target
        io_dsize = 2 if key.dtype in ("bf16", "f16") else 4
        mxu_dsize = 2 if (key.dtype in ("bf16", "f16")
                          or key.precision == "default") else 4
        need = (key.Nb * key.Kb * key.kb * key.nb * mxu_dsize   # weight
                + 2 * key.Mb * key.Kb * key.mb * key.kb * mxu_dsize  # a+act
                + key.Mb * key.Nb * key.mb * key.nb * io_dsize  # out
                + key.Nb * key.nb * io_dsize)                   # bias
        if need > int(current_target().vmem_bytes * 0.9):
            return None
        has_bias = key.binary_kind == "add"
        wb = [inv.operands[1], inv.operands[2]]
        if has_bias:
            wb.append(inv.operands[4])
        base_eval = _make_operand_eval(func, inv, wb, reshape2d=False)

        def get_operands(args, _ev=base_eval, _bias=has_bias):
            vals = _ev(args)
            # kernel signature is fn(a, b, c=None, d=None); beta_0 -> no c
            return ((vals[0], vals[1], None, vals[2]) if _bias
                    else (vals[0], vals[1]))
        return key, _with_post(get_operands)
    elif inv.opname in ("xsmm.fused_brgemm", "xsmm.gemm"):
        a = d.attrs
        if a.get("layout", "flat") != "flat" or a.get("batch", 1) != 1:
            return None
        if "beta_0" not in a.get("flags", ()):
            return None
        if a.get("vnni") or "transpose_b" in a.get("flags", ()):
            return None
        if a.get("prologue"):
            # LN-prologue fused GEMM (fuse-ln-gemm): ChainKey cannot
            # express the prologue — extracting without it would time and
            # RETURN a different computation; the scan bench handles it
            return None
        has_bias = (inv.opname == "xsmm.fused_brgemm"
                    and a.get("binary_kind") == "add"
                    and a.get("binary_bcast", "bcast_col") == "bcast_col")
        if inv.opname == "xsmm.fused_brgemm" \
                and a.get("binary_kind") not in ("add", "none", None):
            return None
        if inv.opname == "xsmm.fused_brgemm" \
                and a.get("binary_kind") == "add" and not has_bias:
            # an add with non-bcast_col broadcast can't ride the chain
            # kernel's bias slot — dropping it would mis-time AND
            # mis-compute; scan bench instead
            return None
        un = a.get("unary_kind")
        key = ChainKey(
            m=a["m"], dims=(a["k"], a["n"]), dtype=a["dtype"],
            out_dtype=inv.result.type.dtype, has_bias=has_bias,
            unary_kind=None if un in (None, "none", "identity") else un,
            last_unary=None if un in (None, "none", "identity") else un,
            precision=a.get("precision", "default"))
        operands = [inv.operands[1], inv.operands[2]]
        if inv.opname == "xsmm.fused_brgemm" and has_bias:
            operands.append(inv.operands[4])
        wb_ops = operands
    elif inv.opname == "xsmm.attention":
        # warm-KV attention bench: K/V resident across in-kernel repeats,
        # output feeds back as the next query (shape-preserving by
        # construction). The bench builder gates on VMEM itself — if the
        # score block doesn't fit it raises and the caller falls back to
        # the scan bench.
        key = _dispatch_key(d, inv)
        wb_ops = list(inv.operands[1:])
        return key, _with_post(
            _make_operand_eval(func, inv, wb_ops, reshape2d=False))
    else:
        return None

    if key.dims[0] != key.dims[-1]:
        if len(key.dims) == 2:
            # non-square single-layer fc: ping-pong warm bench (odd repeats
            # contract back through the same resident weight)
            import dataclasses
            key = dataclasses.replace(key, pingpong=True)
        else:
            return None  # output cannot feed back as input

    # warm mode keeps ALL weights resident: gate on the full VMEM footprint.
    # Under default precision f32 weights enter the kernel as bf16 (see
    # _mxu_input_dtype), so the resident weight bytes use the MXU dtype.
    from ..utils.target import current_target

    io_dsize = 2 if key.dtype in ("bf16", "f16") else 4
    mxu_dsize = 2 if (key.dtype in ("bf16", "f16")
                      or key.precision == "default") else 4
    L = len(key.dims) - 1
    weights = sum(key.dims[i] * key.dims[i + 1] for i in range(L)) * mxu_dsize
    biases = sum(key.dims[1:]) * io_dsize if key.has_bias else 0
    # x block + out block (io dtype) + hbuf feedback (mxu dtype) + f32 temp
    if key.pingpong:
        k_, n_ = key.dims
        bufs = key.m * (k_ * (io_dsize + mxu_dsize)
                        + n_ * (io_dsize + mxu_dsize + 4))
    else:
        bufs = key.m * max(key.dims) * (2 * io_dsize + mxu_dsize + 4)
    if weights + biases + bufs > int(current_target().vmem_bytes * 0.9):
        return None

    return key, _with_post(
        _make_operand_eval(func, inv, wb_ops, reshape2d=True))


def _make_operand_eval(func, inv, wb_ops, reshape2d: bool):
    """Eagerly evaluate the kernel's operands (constants, reshapes, packs —
    the one-time setup the reference also excludes from its timed loop)."""
    def get_operands(args):
        env: dict[int, Any] = {}
        for farg, v in zip(func.args, args):
            env[id(farg)] = v
        for op in func.ops:
            if op is inv:
                break
            vals = [env.get(id(v)) for v in op.operands]
            if op.opname.endswith("_dispatch"):
                env[id(op.results[0])] = None
                continue
            res = _eval_tl(op, vals, False)
            if op.results and res is not None:
                env[id(op.results[0])] = res
        out = [env[id(v)] for v in wb_ops]
        if not reshape2d:
            return out
        # chain kernels take 2-D x/w; flat invokes carry rank-3 reshapes
        return [v.reshape(v.shape[-2], v.shape[-1]) if v.ndim == 3 and
                v.shape[0] == 1 else v for v in out]

    return get_operands


def _default_check_cb(op: Operation, vals):
    arrs = [np.asarray(v, np.float32) for v in vals]
    if op.opname == "check.expect_sane":
        if not np.isfinite(arrs[0]).all():
            raise AssertionError("check.expect_sane failed: NaN/Inf present")
    elif op.opname == "check.expect_almost_eq":
        thr = op.attrs.get("threshold", 1e-5)
        diff = np.max(np.abs(arrs[0] - arrs[1]))
        if diff > thr:
            raise AssertionError(
                f"check.expect_almost_eq failed: max |diff| {diff} > {thr}")
    elif op.opname == "check.expect_true":
        if not np.all(arrs[0]):
            raise AssertionError("check.expect_true failed")


def interpret(module: Module, func_name: str = "entry", *args,
              interpret_kernels: bool | None = None):
    """Eager, op-by-op execution with check.* enforced (tpp-run semantics)."""
    from ..xsmm.kernels import interpret_default

    func = module[func_name]
    ik = interpret_default() if interpret_kernels is None else interpret_kernels
    return _run_func(func, args, ik, with_checks=True,
                     check_cb=_default_check_cb)
