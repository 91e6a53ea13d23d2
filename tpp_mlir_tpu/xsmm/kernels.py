"""Pallas/Mosaic kernels — the TPU replacement for libxsmm microkernels.

The reference JITs CPU microkernels per (shape, dtype, flags) via libxsmm
(reference runtime/Xsmm/XsmmRunnerUtils.cpp). Here each dispatch key builds a
Pallas kernel:

  * BRGEMM / GEMM / fused BRGEMM run on the MXU with an f32 VMEM accumulator;
    the reduction (batch x K-blocks) is the innermost grid dimension so
    Mosaic pipelines HBM->VMEM copies of A/B blocks against compute.
  * Fused epilogues (binary add/mul/... + unary relu/gelu/...) execute on the
    VPU on the final reduction step, before the single write of the output
    tile — the xsmm.fused_brgemm equivalent (XsmmOps.td fused_brgemm).
  * bf16 inputs accumulate in f32, matching the reference's BF16->F32
    compute-type policy (XsmmRunnerUtils.cpp:29-59). VNNI layouts are
    consumed directly by indexing the packed operand — on the MXU no
    repacking is needed, which is the whole point of the TPU redesign.
  * Standalone elementwise unary/binary "kernels" are returned as jnp
    closures: under jit, XLA emits fused VPU loops for these already, and a
    hand-written Pallas elementwise kernel cannot beat a fused XLA one. The
    dispatch/invoke *interface* is preserved; only the backend differs.

Block-size selection mirrors the role of the reference's BrgemmLinalgTiling /
--registerBlocking knobs but targets MXU/VMEM geometry instead of AVX
registers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.target import current_target
from . import tune
from .flags import (BinaryKey, BlockedMatmulKey, BrgemmKey, ConvBrgemmKey,
                    UnaryKey)

_JNP_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f16": jnp.float16,
               "i32": jnp.int32, "i8": jnp.int8}


def _jdt(name: str):
    return _JNP_DTYPES[name]


def interpret_default() -> bool:
    """Pallas interpret mode when not on TPU (CPU test suite); compiled via
    Mosaic on real hardware. This is the analogue of the reference's
    -linalg-to-loops validation path (SURVEY.md section 4)."""
    return current_target().generation == 0


# ---------------------------------------------------------------------------
# Epilogues (VPU)
# ---------------------------------------------------------------------------

def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7), in f32.

    Exists because Mosaic has no TPU lowering for erf/erfc primitives
    (measured on v5e, jax 0.9); exp lowers fine. Odd extension via sign."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741)
                * t - 0.284496736) * t + 0.254829592) * t * jnp.exp(-a * a)
    return s * y


# exp2-domain erfc exponent in |x| units:
#   erfc(|x|/sqrt2) = exp2(-(K*x^2 + _GELU_Q5(|x|))),  K = log2(e)/2.
# Degree-5 least-squares fit weighted by gelu sensitivity (0.5*x*erfc),
# max |gelu err| 6.4e-7 in f32. The 1/sqrt2 argument scale is FOLDED
# into K and the coefficients (r5: one fewer VPU pass), and the fit is
# one degree lower than the r4 polynomial (another pass) at 1.3e-7 more
# error — both far inside the 1e-5 torch-gelu test budget.
_GELU_Q5 = (0.0004712450553503085, -0.007063951197523899,
            0.05175779870672941, -0.26125505922286846,
            1.1507275369545586, 4.939192122802906e-05)
_GELU_K = 0.7213475204444817        # log2(e)/2
_GELU_UMAX = 5.939696961966999      # 4.2*sqrt2: erfc there < 6e-9


def _gelu_exp2(x):
    """Exact-erf gelu as  relu(x) - 0.5*|x|*erfc(|x|/sqrt2)  with erfc in
    the exp2 domain — NO division, NO sign/select, ONE exp2, no tail
    `where` (the clamped exponent saturates erfc at ~6e-9, so the
    clamped product term is a <3e-8 constant beyond u_max): ~13 VPU
    passes vs ~16 in r4 and ~22 for the A&S route. The fc1+LN+gelu
    kernel is VPU-critical-path (r4: each pass ~8.7us at the
    transformer fc1 shape), so every pass is ~1 roofline point."""
    xf = x.astype(jnp.float32)
    u = jnp.minimum(jnp.abs(xf), _GELU_UMAX)
    q = _GELU_Q5[0]
    for coef in _GELU_Q5[1:]:
        q = q * u + coef
    e = jnp.exp2(-(_GELU_K * u * u + q))
    return (jnp.maximum(xf, 0.0) - 0.5 * u * e).astype(x.dtype)


_UNARY_FNS = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "identity": lambda x: x,
    "exp": jnp.exp,
    "square": lambda x: x * x,
    "sqrt": jnp.sqrt,
    "rsqrt": jax.lax.rsqrt,
    "tanh": jnp.tanh,
    # "gelu" = EXACT erf gelu (torch nn.GELU default);
    # "gelu_tanh" = the tanh approximation (torch approximate='tanh').
    # Mosaic lowers NEITHER erfc (what jax.nn.gelu(exact) uses) NOR erf
    # (both measured on v5e: "Unimplemented primitive ... erf[c]"), so
    # exact gelu runs in-kernel arithmetic. r4: the exp2-domain erfc
    # form (_gelu_exp2, max abs err 4.9e-7) replaced the A&S erf route
    # (_erf_poly) — ~30% fewer VPU passes (no divide, no sign/select),
    # measured on the VPU-bound fc1 kernel.
    "gelu": _gelu_exp2,
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "negate": lambda x: -x,
    "zero": lambda x: jnp.zeros_like(x),
}

_BINARY_FNS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "max": jnp.maximum,
}


def _apply_epilogue(acc, d_blk, binary_kind, unary_kind):
    if binary_kind:
        acc = _BINARY_FNS[binary_kind](acc, d_blk.astype(acc.dtype))
    if unary_kind:
        acc = _UNARY_FNS[unary_kind](acc)
    return acc


def _mxu_input_dtype(dtype_name: str, interpret: bool,
                     precision: str = "default"):
    """Compute dtype fed to the MXU under XLA default-precision semantics:
    f32 matmul inputs are truncated to bf16 passes with f32 accumulation
    (what jnp.dot does on TPU at default precision — the platform baseline).
    precision="highest" keeps f32 operands (bf16x3-class rate). Interpret
    mode (CPU tests) keeps full f32 so differential tests against jnp-on-CPU
    stay exact."""
    if dtype_name == "f32" and not interpret and precision == "default":
        return jnp.bfloat16
    return _jdt(dtype_name)


def _unvnni(b):
    """[..., kv, n, v] -> [..., kv*v, n]: normalize a VNNI operand to the
    flat bf16 layout the MXU consumes. Runs OUTSIDE the kernel: for constant
    weights XLA folds it at compile time, so VNNI parity costs nothing at
    runtime; Mosaic cannot express the packed-lane contraction in-kernel
    (multi-dim contractions and packed shape casts are unsupported)."""
    import jax.numpy as jnp
    *lead, kv, n, v = b.shape
    return jnp.moveaxis(b, -1, -2).reshape(*lead, kv * v, n)


# ---------------------------------------------------------------------------
# Block-size heuristic
# ---------------------------------------------------------------------------

def _divisor_block(dim: int, target: int, mult: int) -> int:
    """Largest b <= target with b % mult == 0 and dim % b == 0; falls back to
    dim itself (no split) when no aligned divisor exists."""
    if dim <= target:
        return dim
    best = 0
    b = (target // mult) * mult
    while b >= mult:
        if dim % b == 0:
            best = b
            break
        b -= mult
    return best or dim


def pick_blocks(m: int, n: int, k: int, dtype: str,
                bm: int = 0, bn: int = 0, bk: int = 0) -> tuple[int, int, int]:
    """MXU/VMEM-aware block sizes for the BRGEMM grid.

    Defaults aim at: output tile >= MXU (128x128) when the problem allows,
    K-block deep enough to amortize the epilogue+write, and
    2*(bm*bk + bk*bn)*dsize + 4*bm*bn within a ~60% VMEM budget
    (double-buffered input blocks + f32 accumulator).
    """
    t = current_target()
    sub, lane = t.min_tile(dtype)
    dsize = 2 if dtype in ("bf16", "f16") else 4
    bm = bm or _divisor_block(m, 512 if m >= 512 else m, sub) if m >= sub else (bm or m)
    bn = bn or _divisor_block(n, 512, lane)
    budget = int(t.vmem_bytes * 0.6)
    target_bk = 2048 // dsize * 2  # 1024 f32 / 2048 bf16 starting point
    bk_final = bk or _divisor_block(k, min(k, target_bk), lane if k % lane == 0 else 1)
    while (2 * (bm * bk_final + bk_final * bn) * dsize + 4 * bm * bn > budget
           and bk_final % 2 == 0 and bk_final > lane):
        bk_final //= 2
    while (2 * (bm * bk_final + bk_final * bn) * dsize + 4 * bm * bn > budget
           and bn % 2 == 0 and bn > lane):
        bn //= 2
    return bm, bn, bk_final


# ---------------------------------------------------------------------------
# BRGEMM family
# ---------------------------------------------------------------------------

#: experiment hook for the wres epilogue schedule; policy lives in
#: _wres_sched (None = policy decides)
_WRES_SCHED_OVERRIDE = [None]


def _wres_sched(key) -> str:
    """Epilogue schedule of the weights-resident GEMM:
    - "interleave": dot chunk c, then its epilogue, then chunk c+1 (the
      r3 baseline; fine for cheap epilogues).
    - "split": ALL chunk dots into an f32 scratch, then ONE full-width
      epilogue pass — consecutive MXU passes pipeline instead of
      stalling on the VPU between chunks (the schedule that won the
      attention kernel +15%, commit a2f559b).
    - "lag": cross-m-block software pipeline — epilogue of block i-1 is
      issued in the same program as the dots of block i (independent MXU/
      VPU work, parity-double scratch, out specs lag one step).
    Measured r4 on v5e (fc1-class LN+gelu m2048 k1024 n4096, one run,
    scripts/exp_wres_sched.py): interleave 65.3/68.5 (f32/bf16 % of
    roofline) vs split 45.1/41.6 and lag 40.3/38.6 — the scratch
    round-trip costs far more than the MXU stalls it saves; Mosaic
    already overlaps the epilogue with the next chunk's dot in the
    interleaved form. interleave is the policy; split/lag stay for
    reproduction. The fc1 lever that DID pay is the epilogue itself
    (_gelu_exp2)."""
    if _WRES_SCHED_OVERRIDE[0]:
        return _WRES_SCHED_OVERRIDE[0]
    return "interleave"


def _build_brgemm_wres(key, interpret: bool):
    """Weights-RESIDENT flat GEMM for the large-m streamed regime.

    The blocked path re-streams the weight matrix once per m-block
    (grid (i, j, r): the B block index depends on (j, r), so every i step
    re-fetches all of B) — at m=2048/bm=512 that is 4x the weight bytes,
    and it measurably capped the imported transformer block's GEMMs. Here
    the weights are DMA'd from HBM into a persistent VMEM scratch ONCE on
    the first grid step (grid is m-blocks only; TPU grids are sequential,
    scratch persists) at the MXU input dtype — under default precision an
    f32 GEMM's weights live in VMEM at bf16, so a 1024x4096 layer costs
    8MB, not 16. Single k block per program, so no accumulator scratch and
    the layer_norm prologue composes. Returns None when the shape does not
    fit (the blocked path then applies)."""
    from .flags import BrgemmKey
    assert isinstance(key, BrgemmKey)
    B, m, n, k = key.batch, key.m, key.n, key.k
    if B != 1 or key.vnni or key.transpose_b:
        return None
    if key.bm or key.bn or key.bk:
        return None  # explicit register blocking: honor the blocked path
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    wsz = jnp.dtype(mxu_dt).itemsize
    osz = jnp.dtype(out_dtype).itemsize
    sub, lane = current_target().min_tile(key.dtype)
    if k % lane or n % lane or m % sub:
        return None
    wbytes = k * n * wsz
    # 0.88: measured headroom on v5e — the need() estimate below is honest
    # (double-buffered A/out blocks, single-buffered weight scratch), so
    # ~14.5MB accounted configs compile fine; fc1-class shapes got bm=128
    # (5% faster than bm=64) and qkv-class (6MB weights) get bm=256
    budget = int(current_target().vmem_bytes * 0.88)
    if wbytes > min(budget - 2 * 1024 * 1024, 8 * 1024 * 1024):
        return None
    if key.prologue not in (None, "layer_norm", "ln_stats"):
        return None
    has_ln = key.prologue == "layer_norm"
    has_lns = key.prologue == "ln_stats"
    has_c = not key.beta0
    has_d = key.binary_kind is not None
    full_d = has_d and key.binary_bcast == "none"
    asz = jnp.dtype(_jdt(key.dtype)).itemsize if (has_ln or has_lns) else wsz

    sched = _wres_sched(key)
    nscr = {"interleave": 0, "split": 1, "lag": 2}[sched]
    tn = tune.tuned(key)
    if tn.get("wres") is False:
        return None   # tuner measured the blocked path faster here

    def need(bm_):
        per_row = 2 * (bm_ * k * asz + bm_ * n * osz)
        if has_c:
            per_row += 2 * bm_ * n * 4
        if full_d:
            per_row += 2 * bm_ * n * 4
        return wbytes + per_row + nscr * bm_ * n * 4

    bm = 0
    tuned_bm = tn.get("wres_bm", 0)
    if tuned_bm and m % tuned_bm == 0 and tuned_bm % sub == 0 \
            and need(tuned_bm) <= budget:
        bm = tuned_bm
    cand = min(m, 512)
    while not bm and cand >= sub:
        if m % cand == 0 and cand % sub == 0 and need(cand) <= budget:
            bm = cand
            break
        cand //= 2
    if not bm or m // bm < 2:
        return None  # single m block: the blocked path already fetches
                     # weights exactly once

    nm = m // bm
    lagged = sched == "lag"
    grid = (nm + 1,) if lagged else (nm,)
    # "lag" runs one extra step and shifts every epilogue-phase block
    # (out, c, full/row d) back by one: program i computes dots for
    # m-block i while finishing block i-1's epilogue
    if lagged:
        cur = lambda i: (jnp.minimum(i, nm - 1), 0)    # dot-phase blocks
        lag = lambda i: (jnp.maximum(i - 1, 0), 0)     # epilogue blocks
    else:
        cur = lag = lambda i: (i, 0)
    in_specs = [
        pl.BlockSpec((bm, k), cur, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),          # weights: manual DMA
    ]
    if has_c:
        in_specs.append(pl.BlockSpec((bm, n), lag,
                                     memory_space=pltpu.VMEM))
    if has_d:
        if key.binary_bcast == "bcast_col":
            in_specs.append(pl.BlockSpec((1, n), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        elif key.binary_bcast == "bcast_row":
            in_specs.append(pl.BlockSpec((bm, 1), lag,
                                         memory_space=pltpu.VMEM))
        elif key.binary_bcast == "bcast_scalar":
            in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec((bm, n), lag,
                                         memory_space=pltpu.VMEM))
    if (has_ln or has_lns) and key.prologue_affine:
        for _ in range(2):
            in_specs.append(pl.BlockSpec((1, k), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
    if has_lns:
        # producer-emitted per-row (mean, var): dot-phase operands, so
        # they follow the A block's index map
        for _ in range(2):
            in_specs.append(pl.BlockSpec((bm, 1), cur,
                                         memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((bm, n), lag, memory_space=pltpu.VMEM)
    emit_stats = key.ln_stats_out

    # Column-chunked first-step weight DMA: all chunk copies start up
    # front, each is waited just before its dot, so the transfer overlaps
    # the first m-block's MXU work instead of stalling ~10us per call
    # (times one per GEMM per scan iteration). Later grid steps skip the
    # waits entirely (scratch persists).
    CH = 1
    for cand in (4, 2):
        if n % cand == 0 and (n // cand) % lane == 0:
            CH = cand
            break
    nc = n // CH

    def kernel(*refs):
        idx = 0
        a_ref = refs[idx]; idx += 1
        w_ref = refs[idx]; idx += 1
        c_ref = refs[idx] if has_c else None
        idx += has_c
        d_ref = refs[idx] if has_d else None
        idx += has_d
        g_ref = be_ref = None
        if (has_ln or has_lns) and key.prologue_affine:
            g_ref, be_ref = refs[idx], refs[idx + 1]
            idx += 2
        mu_ref = var_ref = None
        if has_lns:
            mu_ref, var_ref = refs[idx], refs[idx + 1]
            idx += 2
        o_ref = refs[idx]; idx += 1
        mo_ref = vo_ref = None
        if emit_stats:
            mo_ref, vo_ref = refs[idx], refs[idx + 1]
            idx += 2
        wbuf = refs[idx]
        sems = refs[idx + 1]
        s_refs = refs[idx + 2:idx + 2 + nscr]

        i = pl.program_id(0)

        def chunk_copy(c):
            return pltpu.make_async_copy(
                w_ref.at[:, pl.ds(c * nc, nc)],
                wbuf.at[:, pl.ds(c * nc, nc)],
                sems.at[c])

        @pl.when(i == 0)
        def _start_all():
            for c in range(CH):
                chunk_copy(c).start()

        def normalize(a):
            if has_lns:
                # stats came from the producer's epilogue: normalize is a
                # single fused scale+shift pass — no reduction over A
                af = a.astype(jnp.float32)
                af = (af - mu_ref[:]) * jax.lax.rsqrt(
                    var_ref[:] + key.prologue_eps)
                if key.prologue_affine:
                    af = af * g_ref[0] + be_ref[0]
                return af.astype(mxu_dt)
            if not has_ln:
                return a
            af = a.astype(jnp.float32)
            mu = jnp.mean(af, axis=1, keepdims=True)
            var = jnp.mean(af * af, axis=1, keepdims=True) - mu * mu
            af = (af - mu) * jax.lax.rsqrt(var + key.prologue_eps)
            if key.prologue_affine:
                af = af * g_ref[0] + be_ref[0]
            return af.astype(mxu_dt)

        def epilogue_chunk(res, c):
            if has_c:
                res += c_ref[:, c * nc:(c + 1) * nc].astype(jnp.float32)
            if has_d:
                if key.binary_bcast in ("bcast_col", "none"):
                    d_blk = d_ref[:, c * nc:(c + 1) * nc]
                else:                       # bcast_row / bcast_scalar
                    d_blk = d_ref[:]
            else:
                d_blk = None
            return _apply_epilogue(res, d_blk, key.binary_kind,
                                   key.unary_kind).astype(out_dtype)

        def dots_into(s_ref, a):
            for c in range(CH):
                @pl.when(i == 0)
                def _wait_chunk(c=c):
                    chunk_copy(c).wait()
                s_ref[:, c * nc:(c + 1) * nc] = jnp.dot(
                    a, wbuf[:, c * nc:(c + 1) * nc],
                    preferred_element_type=jnp.float32)

        def stats_acc(resc, acc):
            # row sums of the CAST output (what the consumer will read),
            # accumulated across chunks on values hot in registers
            if not emit_stats:
                return acc
            rf = resc.astype(jnp.float32)
            s1 = jnp.sum(rf, axis=1, keepdims=True)
            s2 = jnp.sum(rf * rf, axis=1, keepdims=True)
            return (s1, s2) if acc is None else (acc[0] + s1, acc[1] + s2)

        def stats_write(acc):
            if emit_stats:
                mu = acc[0] / n
                mo_ref[:] = mu
                vo_ref[:] = acc[1] / n - mu * mu

        def epilogue_from(s_ref):
            # ONE full-width VPU pass over the scratch: no MXU stalls
            # between chunk dots, and the epilogue vectorizes over the
            # whole (bm, n) block
            acc = None
            for c in range(CH):
                resc = epilogue_chunk(s_ref[:, c * nc:(c + 1) * nc], c)
                o_ref[:, c * nc:(c + 1) * nc] = resc
                acc = stats_acc(resc, acc)
            stats_write(acc)

        if sched == "interleave":
            a = normalize(a_ref[:])
            acc = None
            for c in range(CH):
                @pl.when(i == 0)
                def _wait_chunk(c=c):
                    chunk_copy(c).wait()
                res = jnp.dot(a, wbuf[:, c * nc:(c + 1) * nc],
                              preferred_element_type=jnp.float32)
                resc = epilogue_chunk(res, c)
                o_ref[:, c * nc:(c + 1) * nc] = resc
                acc = stats_acc(resc, acc)
            stats_write(acc)
        elif sched == "split":
            a = normalize(a_ref[:])
            dots_into(s_refs[0], a)
            epilogue_from(s_refs[0])
        else:                               # "lag": cross-block pipeline
            par = jax.lax.rem(i, 2)

            @pl.when((i < nm) & (par == 0))
            def _dots_even():
                dots_into(s_refs[0], normalize(a_ref[:]))

            @pl.when((i < nm) & (par == 1))
            def _dots_odd():
                dots_into(s_refs[1], normalize(a_ref[:]))

            # epilogue of the PREVIOUS block: independent of this step's
            # dots, so Mosaic can overlap the VPU pass with the MXU work
            @pl.when((i > 0) & (par == 1))
            def _epi_even():
                epilogue_from(s_refs[0])

            @pl.when((i > 0) & (par == 0))
            def _epi_odd():
                epilogue_from(s_refs[1])

    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=m * k * asz + wbytes + m * n * osz
        + (m * n * 4 if has_c else 0) + (m * n * 4 if full_d else 0),
        transcendentals=m * n if key.unary_kind in ("exp", "tanh", "gelu")
        else 0)

    out_specs = out_spec
    out_shape = jax.ShapeDtypeStruct((m, n), out_dtype)
    if emit_stats:
        stat_spec = pl.BlockSpec((bm, 1), lag, memory_space=pltpu.VMEM)
        out_specs = [out_spec, stat_spec, stat_spec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((m, 1), jnp.float32),
                     jax.ShapeDtypeStruct((m, 1), jnp.float32)]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((k, n), mxu_dt),
                        pltpu.SemaphoreType.DMA((CH,))]
        + [pltpu.VMEM((bm, n), jnp.float32) for _ in range(nscr)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=cost,
        interpret=interpret,
    )

    def fn(a, b, c=None, d=None, gamma=None, beta=None, mu=None, var=None):
        a = a.reshape(m, k)          # invoke operands carry a leading
        b = b.reshape(k, n)          # batch-1 dim
        args = [a if (has_ln or has_lns) else a.astype(mxu_dt),
                b.astype(mxu_dt)]
        if has_c:
            assert c is not None
            args.append(c)
        if has_d:
            assert d is not None
            if d.ndim == 0:
                d = d.reshape(1, 1)
            elif d.ndim == 1:
                d = d.reshape(1, -1) if key.binary_bcast == "bcast_col" \
                    else d.reshape(-1, 1)
            args.append(d)
        if (has_ln or has_lns) and key.prologue_affine:
            assert gamma is not None and beta is not None
            args += [gamma.reshape(1, -1).astype(jnp.float32),
                     beta.reshape(1, -1).astype(jnp.float32)]
        if has_lns:
            assert mu is not None and var is not None, \
                "ln_stats prologue needs producer-emitted (mu, var)"
            args += [mu.reshape(m, 1).astype(jnp.float32),
                     var.reshape(m, 1).astype(jnp.float32)]
        return call(*args)

    fn._tune_info = {"kind": "wres", "wres_bm": bm, "sched": sched}
    return fn


def _build_brgemm(key: BrgemmKey, interpret: bool):
    B, m, n, k = key.batch, key.m, key.n, key.k
    dtype = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    vf = key.vnni
    if vf:
        assert key.dtype in ("bf16", "f16") and k % vf == 0, key
        import dataclasses
        inner = _build_brgemm(dataclasses.replace(key, vnni=0), interpret)

        def vnni_fn(a, b, c=None, d=None):
            return inner(a, _unvnni(b), c, d)
        return vnni_fn
    wres = _build_brgemm_wres(key, interpret)
    if wres is not None:
        return wres
    if key.prologue == "ln_stats" or key.ln_stats_out:
        # the producer/consumer LN-stats pair is a weights-resident
        # construction (stats accumulate across the epilogue's chunk
        # loop; the blocked path's (i, j) grid splits rows across
        # programs) — refuse loudly rather than silently dropping it
        raise ValueError(f"ln_stats form needs the wres path; "
                         f"shape does not fit: {key}")
    tn = {} if (key.bm or key.bn or key.bk) else tune.tuned(key)
    bm, bn, bk = pick_blocks(m, n, k, key.dtype,
                             key.bm or tn.get("bm", 0),
                             key.bn or tn.get("bn", 0),
                             key.bk or tn.get("bk", 0))
    if key.prologue:
        bk = k  # the prologue normalizes whole rows: single K block
    kb_steps = max(1, k // bk) if k % bk == 0 else 1
    if k % bk != 0:
        bk = k  # no aligned divisor: single K block
    red_steps = B * kb_steps
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), red_steps)

    has_c = not key.beta0
    has_d = key.binary_kind is not None
    has_ln = key.prologue == "layer_norm"
    assert not has_ln or (B == 1 and red_steps == 1), \
        "layer_norm prologue needs the full A row per program"

    in_specs = [
        pl.BlockSpec((1, bm, bk),
                     lambda i, j, r: (r // kb_steps, i, r % kb_steps),
                     memory_space=pltpu.VMEM),
    ]
    if key.transpose_b:
        in_specs.append(pl.BlockSpec(
            (1, bn, bk),
            lambda i, j, r: (r // kb_steps, j, r % kb_steps),
            memory_space=pltpu.VMEM))
    else:
        in_specs.append(pl.BlockSpec(
            (1, bk, bn),
            lambda i, j, r: (r // kb_steps, r % kb_steps, j),
            memory_space=pltpu.VMEM))
    if has_c:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, r: (i, j),
                                     memory_space=pltpu.VMEM))
    if has_d:
        # D (binary rhs, e.g. bias) is canonicalized to 2D by the wrapper.
        if key.binary_bcast == "bcast_col":      # shape (1, n)
            in_specs.append(pl.BlockSpec((1, bn), lambda i, j, r: (0, j),
                                         memory_space=pltpu.VMEM))
        elif key.binary_bcast == "bcast_row":    # shape (m, 1)
            in_specs.append(pl.BlockSpec((bm, 1), lambda i, j, r: (i, 0),
                                         memory_space=pltpu.VMEM))
        elif key.binary_bcast == "bcast_scalar":  # shape (1, 1)
            in_specs.append(pl.BlockSpec((1, 1), lambda i, j, r: (0, 0),
                                         memory_space=pltpu.VMEM))
        else:                                     # full (m, n)
            in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, r: (i, j),
                                         memory_space=pltpu.VMEM))
    if has_ln and key.prologue_affine:
        # gamma / beta, canonicalized to (1, k) by the wrapper
        for _ in range(2):
            in_specs.append(pl.BlockSpec((1, k), lambda i, j, r: (0, 0),
                                         memory_space=pltpu.VMEM))

    out_spec = pl.BlockSpec((bm, bn), lambda i, j, r: (i, j),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        idx = 0
        a_ref = refs[idx]; idx += 1
        b_ref = refs[idx]; idx += 1
        c_ref = refs[idx] if has_c else None
        idx += has_c
        d_ref = refs[idx] if has_d else None
        idx += has_d
        g_ref = be_ref = None
        if has_ln and key.prologue_affine:
            g_ref, be_ref = refs[idx], refs[idx + 1]
            idx += 2
        o_ref = refs[idx]
        acc_ref = refs[idx + 1]

        r = pl.program_id(2)

        @pl.when(r == 0)
        def _init():
            if has_c:
                acc_ref[:] = c_ref[:].astype(jnp.float32)
            else:
                acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[0]
        if has_ln:
            af = a.astype(jnp.float32)
            mu = jnp.mean(af, axis=1, keepdims=True)
            var = jnp.mean(af * af, axis=1, keepdims=True) - mu * mu
            af = (af - mu) * jax.lax.rsqrt(var + key.prologue_eps)
            if key.prologue_affine:
                af = af * g_ref[0] + be_ref[0]
            # normalize in f32, then drop to the MXU input dtype for the
            # contraction (the outside-the-kernel downcast the flat path
            # does, moved after the LN so mean/variance keep f32)
            a = af.astype(_mxu_input_dtype(key.dtype, interpret,
                                           key.precision))
        if key.transpose_b:
            update = jax.lax.dot_general(
                a, b_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            update = jnp.dot(a, b_ref[0], preferred_element_type=jnp.float32)
        acc_ref[:] += update

        @pl.when(r == red_steps - 1)
        def _finish():
            res = acc_ref[:]
            d_blk = d_ref[:] if has_d else None
            res = _apply_epilogue(res, d_blk, key.binary_kind, key.unary_kind)
            o_ref[:] = res.astype(out_dtype)

    dsize = jnp.dtype(dtype).itemsize
    cost = pl.CostEstimate(
        flops=2 * B * m * n * k,
        bytes_accessed=(B * m * k + B * k * n) * dsize + m * n * jnp.dtype(out_dtype).itemsize,
        transcendentals=m * n if key.unary_kind in ("exp", "tanh", "gelu") else 0)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )

    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)

    def fn(a, b, c=None, d=None, gamma=None, beta=None):
        # the LN prologue normalizes in f32 inside the kernel; feed the raw
        # rows at input dtype (a bf16 MXU downcast before normalization
        # would lose the mean/variance precision the fused LN kernel keeps)
        args = [a.astype(mxu_dt) if not has_ln else a,
                b.astype(mxu_dt)]
        if has_c:
            assert c is not None, "kernel dispatched without beta_0 needs C"
            args.append(c)
        if has_d:
            assert d is not None, "fused kernel needs the binary operand D"
            if d.ndim == 0:
                d = d.reshape(1, 1)
            elif d.ndim == 1:
                d = d.reshape(1, -1) if key.binary_bcast == "bcast_col" \
                    else d.reshape(-1, 1)
            args.append(d)
        if has_ln and key.prologue_affine:
            assert gamma is not None and beta is not None
            args += [gamma.reshape(1, -1).astype(jnp.float32),
                     beta.reshape(1, -1).astype(jnp.float32)]
        return call(*args)

    fn._tune_info = {"kind": "blocked", "bm": bm, "bn": bn, "bk": bk}
    return fn


def _build_blocked_matmul(key: BlockedMatmulKey, interpret: bool):
    """Packed-layout matmul: per (Mb,Nb) output tile, batch-reduce over Kb —
    the reference's blocked GEMM normal form (ToBlockLayoutAndBack.cpp:484)
    executed as one Pallas kernel with the Kb loop as the innermost grid dim."""
    Mb, Nb, Kb = key.Mb, key.Nb, key.Kb
    mb, nb, kb = key.mb, key.nb, key.kb
    dtype = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    vf = key.vnni
    if vf:
        import dataclasses
        inner = _build_blocked_matmul(dataclasses.replace(key, vnni=0),
                                      interpret)

        def vnni_fn(a, b, c=None, d=None):
            return inner(a, _unvnni(b), c, d)
        return vnni_fn
    has_c = not key.beta0
    has_d = key.binary_kind is not None
    if key.repeats:
        return _build_blocked_matmul_warm(key, interpret)

    grid = (Mb, Nb, Kb)
    in_specs = [
        pl.BlockSpec((1, 1, mb, kb), lambda i, j, r: (i, r, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs.append(pl.BlockSpec((1, 1, kb, nb),
                                 lambda i, j, r: (j, r, 0, 0),
                                 memory_space=pltpu.VMEM))
    if has_c:
        in_specs.append(pl.BlockSpec((1, 1, mb, nb), lambda i, j, r: (i, j, 0, 0),
                                     memory_space=pltpu.VMEM))
    if has_d:
        # packed bias [Nb, nb] is contiguous (a 1-D pack is a pure reshape),
        # so it is passed flat (1, Nb*nb) and block-indexed by column —
        # Mosaic cannot dynamically index sub-sublane rows of a packed-dtype
        # 2D array, but a lane-aligned column block is free
        in_specs.append(pl.BlockSpec((1, nb), lambda i, j, r: (0, j),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, 1, mb, nb), lambda i, j, r: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        idx = 0
        a_ref = refs[idx]; idx += 1
        b_ref = refs[idx]; idx += 1
        c_ref = refs[idx] if has_c else None
        idx += has_c
        d_ref = refs[idx] if has_d else None
        idx += has_d
        o_ref = refs[idx]
        acc_ref = refs[idx + 1]

        r = pl.program_id(2)
        j = pl.program_id(1)

        @pl.when(r == 0)
        def _init():
            if has_c:
                acc_ref[:] = c_ref[0, 0].astype(jnp.float32)
            else:
                acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[0, 0]
        acc_ref[:] += jnp.dot(a, b_ref[0, 0],
                              preferred_element_type=jnp.float32)

        @pl.when(r == Kb - 1)
        def _finish():
            res = acc_ref[:]
            d_blk = d_ref[:] if has_d else None
            res = _apply_epilogue(res, d_blk, key.binary_kind, key.unary_kind)
            o_ref[0, 0] = res.astype(out_dtype)

    cost = pl.CostEstimate(
        flops=2 * Mb * Nb * Kb * mb * nb * kb,
        bytes_accessed=(Mb * Kb * mb * kb + Nb * Kb * kb * nb
                        + Mb * Nb * mb * nb) * jnp.dtype(dtype).itemsize,
        transcendentals=0)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Mb, Nb, mb, nb), out_dtype),
        scratch_shapes=[pltpu.VMEM((mb, nb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )

    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)

    def fn(a, b, c=None, d=None):
        args = [a.astype(mxu_dt), b.astype(mxu_dt)]
        if has_c:
            args.append(c)
        if has_d:
            args.append(d.reshape(1, -1))
        return call(*args)

    return fn


def _build_blocked_matmul_warm(key: BlockedMatmulKey, interpret: bool):
    """perf.bench-in-kernel for the PACKED layout (key.repeats > 0): the
    packed weight + bias stay VMEM-resident, the timed loop runs as an
    'arbitrary' grid dimension, and each step's output feeds back as the
    next step's packed activation (requires Nb==Kb, nb==kb — square
    feedback, same rule as ChainKey). This is the packed-parity analogue
    of the flat chain's warm bench, so default-tpp-passes-packed rows can
    be measured warm-vs-warm against the flat default (the reference
    times its packed path hot: MLIRBench.cpp:265-295)."""
    Mb, Nb, Kb = key.Mb, key.Nb, key.Kb
    mb, nb, kb = key.mb, key.nb, key.kb
    assert Nb == Kb and nb == kb, (
        f"blocked warm bench needs square feedback, got "
        f"Nb={Nb} Kb={Kb} nb={nb} kb={kb}")
    out_dtype = _jdt(key.out_dtype or key.dtype)
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    has_d = key.binary_kind is not None
    reps = key.repeats

    in_specs = [
        pl.BlockSpec((Mb, Kb, mb, kb), lambda t: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Nb, Kb, kb, nb), lambda t: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_d:
        in_specs.append(pl.BlockSpec((1, Nb * nb), lambda t: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((Mb, Nb, mb, nb), lambda t: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        idx = 0
        a_ref = refs[idx]; idx += 1
        b_ref = refs[idx]; idx += 1
        d_ref = refs[idx] if has_d else None
        idx += has_d
        o_ref = refs[idx]
        act_ref = refs[idx + 1]

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            act_ref[:] = a_ref[:]

        for i in range(Mb):
            # read the full activation row BEFORE writing any of its
            # replacement tiles (next[i, j] depends on act[i, :])
            arow = [act_ref[i, r] for r in range(Kb)]
            for j in range(Nb):
                acc = jnp.zeros((mb, nb), jnp.float32)
                for r in range(Kb):
                    acc += jnp.dot(arow[r], b_ref[j, r],
                                   preferred_element_type=jnp.float32)
                d_blk = (d_ref[0, j * nb:(j + 1) * nb].reshape(1, nb)
                         if has_d else None)
                res = _apply_epilogue(acc, d_blk, key.binary_kind,
                                      key.unary_kind)
                act_ref[i, j] = res.astype(mxu_dt)

        @pl.when(t == reps - 1)
        def _finish():
            o_ref[:] = act_ref[:].astype(out_dtype)

    cost = pl.CostEstimate(
        flops=2 * reps * Mb * Nb * Kb * mb * nb * kb,
        bytes_accessed=(Mb * Kb * mb * kb + Nb * Kb * kb * nb
                        + Mb * Nb * mb * nb) * jnp.dtype(mxu_dt).itemsize,
        transcendentals=0)

    call = pl.pallas_call(
        kernel,
        grid=(reps,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Mb, Nb, mb, nb), out_dtype),
        scratch_shapes=[pltpu.VMEM((Mb, Kb, mb, kb), mxu_dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=cost,
        interpret=interpret,
    )

    def fn(a, b, c=None, d=None):
        args = [a.astype(mxu_dt), b.astype(mxu_dt)]
        if has_d:
            args.append(d.reshape(1, -1))
        return call(*args)

    return fn


def _build_batch_matmul(key, interpret: bool):
    """Parallel-batch matmul: batch is a parallel grid dim; per-batch tiles
    follow the BRGEMM blocking. Feeds the MHA Q@Kt / P@V benchmarks.

    Tiny per-head problems (the reference's 32x64-head MHA microkernels)
    group G heads per program: one grid step computes G small matmuls, so
    per-program overhead amortizes instead of dominating."""
    from .flags import BatchMatmulKey
    assert isinstance(key, BatchMatmulKey)
    B, m, n, k = key.batch, key.m, key.n, key.k
    out_dtype = _jdt(key.out_dtype or key.dtype)
    tn = {} if (key.bm or key.bn or key.bk) else tune.tuned(key)
    bm, bn, bk = pick_blocks(m, n, k, key.dtype,
                             key.bm or tn.get("bm", 0),
                             key.bn or tn.get("bn", 0),
                             key.bk or tn.get("bk", 0))
    if key.softmax_lhs:
        bk = k  # softmax over the contraction dim needs the whole row
    kb_steps = max(1, k // bk) if k % bk == 0 else 1
    if k % bk != 0:
        bk = k
    if kb_steps == 1 and bm >= m and bn >= n and m * k <= 128 * 128:
        return _build_batch_matmul_grouped(key, interpret)
    grid = (B, pl.cdiv(m, bm), pl.cdiv(n, bn), kb_steps)
    has_c = not key.beta0

    if key.lhs_shared:
        # rank-2 A shared across the batch: constant batch index, so the
        # weight block stays VMEM-resident across batch steps
        a_spec = pl.BlockSpec((bm, bk), lambda b, i, j, r: (i, r),
                              memory_space=pltpu.VMEM)
    else:
        a_spec = pl.BlockSpec((1, bm, bk), lambda b, i, j, r: (b, i, r),
                              memory_space=pltpu.VMEM)
    in_specs = [
        a_spec,
        pl.BlockSpec((1, bk, bn), lambda b, i, j, r: (b, r, j),
                     memory_space=pltpu.VMEM),
    ]
    if has_c:
        in_specs.append(pl.BlockSpec((1, bm, bn),
                                     lambda b, i, j, r: (b, i, j),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, bm, bn), lambda b, i, j, r: (b, i, j),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        a_ref, b_ref = refs[0], refs[1]
        c_ref = refs[2] if has_c else None
        o_ref = refs[2 + has_c]
        acc_ref = refs[3 + has_c]
        r = pl.program_id(3)

        @pl.when(r == 0)
        def _init():
            if has_c:
                acc_ref[:] = c_ref[0].astype(jnp.float32)
            else:
                acc_ref[:] = jnp.zeros_like(acc_ref)

        a = a_ref[:] if key.lhs_shared else a_ref[0]
        if key.softmax_lhs:
            a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(a.dtype)
        acc_ref[:] += jnp.dot(a, b_ref[0],
                              preferred_element_type=jnp.float32)

        @pl.when(r == kb_steps - 1)
        def _finish():
            o_ref[0] = acc_ref[:].astype(out_dtype)

    dsize = jnp.dtype(_jdt(key.dtype)).itemsize
    cost = pl.CostEstimate(
        flops=2 * B * m * n * k,
        bytes_accessed=B * (m * k + k * n + m * n) * dsize,
        transcendentals=0)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )

    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)

    def fn(a, b, c=None):
        args = [a if key.softmax_lhs else a.astype(mxu_dt),
                b.astype(mxu_dt)]
        if has_c:
            args.append(c)
        return call(*args)

    return fn


def _build_batch_matmul_grouped(key, interpret: bool):
    """Head-grouped small batched matmul: G whole (m,k)x(k,n) problems per
    grid step."""
    B, m, n, k = key.batch, key.m, key.n, key.k
    out_dtype = _jdt(key.out_dtype or key.dtype)
    dsize = 2 if key.dtype in ("bf16", "f16") else 4
    budget = 4 * 2 ** 20
    G = 1
    a_bytes = 0 if key.lhs_shared else m * k
    for cand in (16, 8, 4, 2):
        if B % cand == 0 and cand * (a_bytes + k * n + m * n) * dsize <= budget:
            G = cand
            break
    has_c = not key.beta0
    grid = (B // G,)
    if key.lhs_shared:
        a_spec = pl.BlockSpec((m, k), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)
    else:
        a_spec = pl.BlockSpec((G, m, k), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        a_spec,
        pl.BlockSpec((G, k, n), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_c:
        in_specs.append(pl.BlockSpec((G, m, n), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((G, m, n), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        a_ref, b_ref = refs[0], refs[1]
        c_ref = refs[2] if has_c else None
        o_ref = refs[2 + has_c]
        for g in range(G):
            a = a_ref[:] if key.lhs_shared else a_ref[g]
            if key.softmax_lhs:
                a = jax.nn.softmax(a.astype(jnp.float32),
                                   axis=-1).astype(a.dtype)
            acc = jnp.dot(a, b_ref[g], preferred_element_type=jnp.float32)
            if has_c:
                acc = acc + c_ref[g].astype(jnp.float32)
            o_ref[g] = acc.astype(out_dtype)

    cost = pl.CostEstimate(
        flops=2 * B * m * n * k,
        bytes_accessed=B * (m * k + k * n + m * n) * dsize,
        transcendentals=B * m * k if key.softmax_lhs else 0)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=cost,
        interpret=interpret,
    )
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)

    def fn(a, b, c=None):
        args = [a if key.softmax_lhs else a.astype(mxu_dt),
                b.astype(mxu_dt)]
        if has_c:
            args.append(c)
        return call(*args)

    return fn


def _build_grouped_gemm(key, interpret: bool):
    """Grouped (ragged-batch) GEMM — the megablocks dropless-MoE dispatch
    on the BRGEMM grid (reference batch-reduce GEMM role,
    runtime/Xsmm/XsmmRunnerUtils.cpp:288-361, extended to ragged batches).

    Rows arrive pre-sorted by group and padded per group to a bm multiple
    (padding rows are zero and compute zero), so every grid step is one
    dense (bm, bk) x (bk, bn) MXU pass; the block->group map `ge` is a
    scalar-prefetch operand feeding the weight BlockSpec index map, so a
    single compiled kernel serves every routing. Consecutive blocks of the
    same group keep a CONSTANT weight block index and Mosaic skips the
    HBM->VMEM copy, so each group's weights stream ~once when n/k need no
    splitting (the bf16 MoE shapes) — that is what beats the capacity-
    padded gather/einsum/scatter round trip of the GShard form."""
    from .flags import GroupedGemmKey
    assert isinstance(key, GroupedGemmKey)
    m, n, k, bm = key.m, key.n, key.k, key.bm
    assert m % bm == 0, (m, bm)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    t = current_target()
    sub, lane = t.min_tile(key.dtype)
    dsize = 2 if key.dtype in ("bf16", "f16") else 4
    # VMEM budget: x/w/out blocks are all double-buffered (CLAUDE r3:
    # Pallas double-buffers every CHANGING block), plus the f32 scratch
    bn = key.bn or n
    bk = key.bk or k

    def vmem_use(bn_, bk_):
        return (2 * (bm * bk_ + bk_ * bn_) * dsize
                + 2 * bm * bn_ * jnp.dtype(out_dtype).itemsize
                + 4 * bm * bn_)

    budget = int(t.vmem_bytes * 0.8)
    while vmem_use(bn, bk) > budget and bn % 2 == 0 and bn // 2 >= lane \
            and n % (bn // 2) == 0:
        bn //= 2
    while vmem_use(bn, bk) > budget and bk % 2 == 0 and bk // 2 >= lane \
            and k % (bk // 2) == 0:
        bk //= 2
    nj, kr = pl.cdiv(n, bn), pl.cdiv(k, bk)
    grid = (m // bm, nj, kr)

    if key.layers:
        # stacked-weights variant: w is (layers, n_groups, k, n) — or
        # (layers, n_groups, n, k) under transpose_b (the training
        # dgrad) — and the layer index rides as a SECOND scalar-prefetch
        # operand feeding the weight BlockSpec — the per-layer slice
        # never exists as a value, so a lax.scan over layers pays no
        # slab copy (forward NOR backward: threading this through the
        # custom-VJP trainable path is the r5 verdict #1a fix).
        if key.transpose_b:
            w_spec = pl.BlockSpec(
                (1, 1, bn, bk),
                lambda i, j, r, li, ge: (li[0], ge[i], j, r))
        else:
            w_spec = pl.BlockSpec(
                (1, 1, bk, bn),
                lambda i, j, r, li, ge: (li[0], ge[i], r, j))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, r, li, ge: (i, r)),
                w_spec,
            ],
            out_specs=pl.BlockSpec((bm, bn),
                                   lambda i, j, r, li, ge: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        )
    else:
        if key.transpose_b:
            w_spec = pl.BlockSpec((1, bn, bk),
                                  lambda i, j, r, ge: (ge[i], j, r))
        else:
            w_spec = pl.BlockSpec((1, bk, bn),
                                  lambda i, j, r, ge: (ge[i], r, j))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, r, ge: (i, r)),
                w_spec,
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, r, ge: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        )

    def kernel(*refs):
        if key.layers:
            _li_ref, _ge_ref, x_ref, w_ref, o_ref, acc_ref = refs
            w_blk = w_ref[0, 0]
        else:
            _ge_ref, x_ref, w_ref, o_ref, acc_ref = refs
            w_blk = w_ref[0]
        r = pl.program_id(2)

        @pl.when(r == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if key.transpose_b:
            # x (bm, bk) @ w (bn, bk)^T — the dgrad contraction
            # (ops/trainable.py / BrgemmKey transpose_b spelling)
            acc_ref[:] += jax.lax.dot_general(
                x_ref[:], w_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc_ref[:] += jnp.dot(x_ref[:], w_blk,
                                  preferred_element_type=jnp.float32)

        @pl.when(r == kr - 1)
        def _finish():
            o_ref[:] = _apply_epilogue(
                acc_ref[:], None, None, key.unary_kind).astype(out_dtype)

    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=(m * k + key.n_groups * k * n + m * n) * dsize,
        transcendentals=m * n if key.unary_kind in ("gelu", "gelu_tanh",
                                                    "exp", "tanh") else 0)
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)

    if key.layers:
        def fn(li, ge, x, w):
            li = jnp.asarray(li, jnp.int32).reshape(1)
            return call(li, ge.astype(jnp.int32), x.astype(mxu_dt),
                        w.astype(mxu_dt))
    else:
        def fn(ge, x, w):
            return call(ge.astype(jnp.int32), x.astype(mxu_dt),
                        w.astype(mxu_dt))

    return fn


def _build_grouped_wgrad(key, interpret: bool):
    """Grouped weight gradient — the training complement of the grouped
    (ragged-batch) GEMM: dW[g] = sum over g's sorted row blocks of
    A_blk.T @ dY_blk, one MXU pass per (block, n-tile) with NO
    capacity table, scatter, or n_groups x flops inflation (flops =
    2*m*k*n, the dense wgrad cost over the padded rows).

    Rows are sorted by group (the grouped forward's layout), so the
    scratch accumulates while ge[i] is constant and is written to the
    (ge[i], ., j) output block exactly on each group's LAST step — the
    VMEM->HBM write-back on block-index change finalizes it. A is
    passed pre-transposed (k, m) so the step dot stays the standard
    (k, bm) x (bm, bn) form. Contract: every group owns >= 1 block
    (engine pads each expert to min one block) — unindexed output
    blocks are never written."""
    from .flags import GroupedWgradKey
    assert isinstance(key, GroupedWgradKey)
    m, k, n, bm = key.m, key.k, key.n, key.bm
    assert m % bm == 0, (m, bm)
    t = current_target()
    dsize = 2 if key.dtype in ("bf16", "f16") else 4
    lane = 128
    bn = key.bn or _divisor_block(n, 512, lane)

    def vmem_use(bn_):
        return (2 * (k * bm + bm * bn_) * dsize   # xT + dy blocks
                + 2 * k * bn_ * 4                 # out block (dbl-buf)
                + 4 * k * bn_)                    # f32 scratch

    budget = int(t.vmem_bytes * 0.8)
    while vmem_use(bn) > budget and bn % 2 == 0 and bn // 2 >= lane \
            and bn // 2 % lane == 0 and n % (bn // 2) == 0:
        bn //= 2
    nb, nj = m // bm, pl.cdiv(n, bn)
    grid = (nj, nb)   # block sweep innermost: accumulate per group

    def kernel(ge_ref, xt_ref, dy_ref, o_ref, acc_ref):
        i = pl.program_id(1)
        prev = ge_ref[jnp.maximum(i - 1, 0)]
        nxt = ge_ref[jnp.minimum(i + 1, nb - 1)]

        @pl.when((i == 0) | (ge_ref[i] != prev))
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(xt_ref[:], dy_ref[:],
                              preferred_element_type=jnp.float32)

        @pl.when((i == nb - 1) | (ge_ref[i] != nxt))
        def _finish():
            o_ref[0] = acc_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, bm), lambda j, i, ge: (0, i)),
            pl.BlockSpec((bm, bn), lambda j, i, ge: (i, j)),
        ],
        out_specs=pl.BlockSpec((1, k, bn), lambda j, i, ge: (ge[i], 0, j)),
        scratch_shapes=[pltpu.VMEM((k, bn), jnp.float32)],
    )
    cost = pl.CostEstimate(
        flops=2 * m * k * n,
        bytes_accessed=(nj * m * k + m * n) * dsize
        + key.n_groups * k * n * 4,
        transcendentals=0)
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((key.n_groups, k, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=cost, interpret=interpret)
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)

    def fn(ge, xt, dy):
        return call(ge.astype(jnp.int32), xt.astype(mxu_dt),
                    dy.astype(mxu_dt))

    return fn


def _build_int8_gemm(key, interpret: bool):
    """int8 MXU compute GEMM: Xq(m,k)s8 @ Wq(k,n)s8 -> s32 accumulate,
    dequantized ONCE on the f32 accumulator tile by the per-row
    activation scale x per-column weight scale outer product. v5e runs
    int8 MXU passes at ~2x the bf16 rate, and the operand HBM bytes
    halve vs bf16 — the compute-bound complement to the weight-only
    serving path (serving/quant.py), which only saves bandwidth.

    int8 native tiles are (32, 128): bm/bk prefer 32/128 multiples and
    fall back to the full dim (callers pad rows to 32 when needed)."""
    from .flags import Int8GemmKey
    assert isinstance(key, Int8GemmKey)
    m, n, k = key.m, key.n, key.k
    out_dtype = _jdt(key.out_dtype)
    t = current_target()
    bm = key.bm or _divisor_block(m, 512, 32)
    bn = key.bn or _divisor_block(n, 2048, 128)
    bk = key.bk or k

    def vmem_use(bn_, bk_):
        return (2 * (bm * bk_ + bk_ * bn_) + 2 * bm * bn_
                * jnp.dtype(out_dtype).itemsize + 4 * bm * bn_)

    budget = int(t.vmem_bytes * 0.8)
    while vmem_use(bn, bk) > budget and bk % 2 == 0 and bk // 2 >= 128 \
            and k % (bk // 2) == 0:
        bk //= 2
    while vmem_use(bn, bk) > budget and bn % 2 == 0 and bn // 2 >= 128 \
            and n % (bn // 2) == 0:
        bn //= 2
    nj, kr = pl.cdiv(n, bn), pl.cdiv(k, bk)
    grid = (pl.cdiv(m, bm), nj, kr)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, r: (i, r)),
        pl.BlockSpec((bk, bn), lambda i, j, r: (r, j)),
        pl.BlockSpec((bm, 1), lambda i, j, r: (i, 0)),
        pl.BlockSpec((1, bn), lambda i, j, r: (0, j)),
    ]
    if key.has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, r: (0, j)))
    out_spec = pl.BlockSpec((bm, bn), lambda i, j, r: (i, j))

    def kernel(x_ref, w_ref, xs_ref, ws_ref, *refs):
        if key.has_bias:
            b_ref, o_ref, acc_ref = refs
        else:
            o_ref, acc_ref = refs
        r = pl.program_id(2)

        @pl.when(r == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                              preferred_element_type=jnp.int32)

        @pl.when(r == kr - 1)
        def _finish():
            # dequant + bias + activation on the accumulator tile — one
            # VPU epilogue instead of (T, n) f32 HBM round trips
            y = acc_ref[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]
            if key.has_bias:
                y = y + b_ref[:]
            if key.unary_kind:
                y = _UNARY_FNS[key.unary_kind](y)
            o_ref[:] = y.astype(out_dtype)

    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=m * k + k * n
        + m * n * jnp.dtype(out_dtype).itemsize,
        transcendentals=0)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )

    def fn(xq, wq, xscale, wscale, bias=None):
        args = [xq, wq, xscale.reshape(m, 1).astype(jnp.float32),
                wscale.reshape(1, n).astype(jnp.float32)]
        if key.has_bias:
            assert bias is not None, "has_bias kernel needs a bias"
            args.append(bias.reshape(1, n).astype(jnp.float32))
        return call(*args)

    return fn


def chain_fits_vmem(key: "ChainKey") -> bool:
    """Budget check: double-buffered weight slots + biases + activation
    buffers in VMEM (the chain kernel streams weights, so only the two
    largest consecutive layers must be resident at once)."""
    t = current_target()
    dsize = 2 if key.dtype in ("bf16", "f16") else 4
    L = len(key.dims) - 1
    wmax = max(key.dims[i] * key.dims[i + 1] for i in range(L)) * dsize
    biases = sum(key.dims[1:]) * dsize if key.has_bias else 0
    bm = key.bm or min(key.m, 512)
    acts = 3 * bm * max(key.dims) * 4
    return 2 * wmax + biases + acts < int(t.vmem_bytes * 0.8)


def _build_chain(key, interpret: bool):
    """Whole-chain fused MLP kernel, weight-streaming version.

    Weights stay in HBM (memory_space=ANY) and are DMA'd into two ping-pong
    VMEM slots: layer i+1's weight transfer overlaps layer i's MXU compute,
    so the kernel runs at max(weight-DMA, compute) instead of their sum —
    the double-buffering pattern from the pallas guide, applied across
    layers instead of across K-blocks."""
    from .flags import ChainKey
    assert isinstance(key, ChainKey)
    if key.repeats > 1:
        if key.pingpong:
            return _build_chain_bench_pingpong(key, interpret)
        return _build_chain_bench(key, interpret)
    m, dims = key.m, key.dims
    L = len(dims) - 1
    dtype = _jdt(key.dtype)
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    sub, _ = current_target().min_tile(key.dtype)
    bm = key.bm or tune.tuned(key).get("bm", 0) or min(m, 512)
    bm = max(sub, bm - bm % sub) if m % sub == 0 else bm
    kmax = max(dims[:-1])
    nmax = max(dims[1:])

    grid = (pl.cdiv(m, bm),)
    in_specs = [pl.BlockSpec((bm, dims[0]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for li in range(L):
        # weights stream from HBM via manual DMA (see kernel body)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        if key.has_bias:
            in_specs.append(pl.BlockSpec((1, dims[li + 1]), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((bm, dims[-1]), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    act = _UNARY_FNS.get(key.unary_kind or "identity")
    last_act = _UNARY_FNS.get(key.last_unary or "identity")
    step = 2 if key.has_bias else 1

    # Column-chunked streaming: each layer's weight is fetched as CHUNKS
    # column slices through NBUF rotating VMEM slots, keeping several DMAs
    # in flight (one stream does not saturate HBM) and overlapping the tail
    # of layer i's compute with the head of layer i+1's transfers.
    CHUNKS = 2 if min(dims[1:]) >= 256 else 1
    if any(n % CHUNKS for n in dims[1:]):
        CHUNKS = 1
    queue = [(li, ci) for li in range(L) for ci in range(CHUNKS)]
    NBUF = min(3, len(queue))
    nc_of = {li: dims[li + 1] // CHUNKS for li in range(L)}
    ncmax = max(nc_of.values())

    def kernel(*refs):
        x_ref = refs[0]
        w_refs = [refs[1 + step * li] for li in range(L)]
        b_refs = [refs[2 + step * li] for li in range(L)] \
            if key.has_bias else [None] * L
        o_ref = refs[1 + step * L]
        wbuf = refs[2 + step * L]      # VMEM (NBUF, kmax, ncmax)
        sems = refs[3 + step * L]      # DMA semaphores (NBUF,)
        zbuf = refs[4 + step * L]      # VMEM (bm, nmax) f32 layer output

        def start(qi):
            li, ci = queue[qi]
            kd, nc = dims[li], nc_of[li]
            slot = qi % NBUF
            pltpu.make_async_copy(
                w_refs[li].at[:, pl.ds(ci * nc, nc)],
                wbuf.at[slot, :kd, :nc],
                sems.at[slot]).start()

        for qi in range(NBUF):
            start(qi)

        h = x_ref[:].astype(jnp.float32)
        qi = 0
        for li in range(L):
            kd, nc = dims[li], nc_of[li]
            hd = h.astype(mxu_dt)
            a = act if li < L - 1 else last_act
            for ci in range(CHUNKS):
                slot = qi % NBUF
                pltpu.make_async_copy(
                    w_refs[li].at[:, pl.ds(ci * nc, nc)],
                    wbuf.at[slot, :kd, :nc],
                    sems.at[slot]).wait()
                z = jnp.dot(hd, wbuf[slot, :kd, :nc],
                            preferred_element_type=jnp.float32)
                if key.has_bias:
                    z = z + b_refs[li][:, pl.ds(ci * nc, nc)] \
                        .astype(jnp.float32)
                if qi + NBUF < len(queue):
                    start(qi + NBUF)
                zbuf[:, pl.ds(ci * nc, nc)] = a(z)
                qi += 1
            h = zbuf[:, :dims[li + 1]]
        o_ref[:] = h.astype(out_dtype)

    flops = sum(2 * m * dims[i] * dims[i + 1] for i in range(L))
    dsize = jnp.dtype(dtype).itemsize
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(m * dims[0] + m * dims[-1]
                        + sum(dims[i] * dims[i + 1] for i in range(L))) * dsize,
        transcendentals=0)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, dims[-1]), out_dtype),
        scratch_shapes=[pltpu.VMEM((NBUF, kmax, ncmax), mxu_dt),
                        pltpu.SemaphoreType.DMA((NBUF,)),
                        pltpu.VMEM((bm, nmax), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=cost,
        interpret=interpret,
    )

    def fn(x, *wb):
        args = [x]
        for v in wb:
            # rank-2 weights feed the MXU: cast at call time (folded by XLA
            # for constants); biases keep their dtype
            if v.ndim == 1:
                args.append(v.reshape(1, -1))
            else:
                args.append(v.astype(mxu_dt))
        return call(*args)

    return fn


# softmax in base-2 space: softmax(s) == 2^(s*log2e) / sum 2^(s*log2e), and
# log2e folds into the attention scale applied to Q — one fewer VPU multiply
# per SCORE element (S*Skv of them), paid once per Q element (S*D) instead.
# FlashAttention-2 (PAPERS.md) uses the same rebasing on CUDA.
_LOG2E = 1.4426950408889634


def _build_attn_flash_heads(key, interpret: bool):
    """Token-layout causal attention via the flash-train FORWARD
    (flash_train.py): whole-(b, head-group) programs with an in-kernel
    head loop — no per-head LANE slices, no (B,H,S,S) HBM scores. The
    r7 route for D<128 at s>=1024, where it beats the token-layout
    kernel 1.28x (flash_infer_r7.json: 80.9 vs 103.7 us at b2 h12
    s1024 d64 bf16) and, unlike XLA's composed path, stays flat in
    batch (no S^2 materialization). Returns None when the head slabs
    don't fit VMEM (caller falls through to the token-layout kernel)."""
    import dataclasses

    from ..utils.target import current_target
    from .flash_train import (FlashTrainKey, build_flash_train_fwd,
                              flash_fwd_hpp)

    B, S, H, D = key.batch, key.seq, key.heads, key.head_dim
    tkey = FlashTrainKey(batch=B, heads=H, seq=S, head_dim=D,
                         dtype=key.dtype, causal=key.causal,
                         scale=key.scale)
    hpp = flash_fwd_hpp(tkey, current_target().vmem_bytes)
    if not hpp:
        return None
    fwd = build_flash_train_fwd(dataclasses.replace(tkey, hpp=hpp),
                                interpret)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    E = H * D

    def fn(q, k, v):
        def heads(t):
            return jnp.transpose(t.reshape(B, S, H, D), (0, 2, 1, 3))
        o, _ = fwd(heads(q), heads(k), heads(v))
        return jnp.transpose(o, (0, 2, 1, 3)).reshape(
            B, S, E).astype(out_dtype)
    if key.qkv_packed:
        # packed (B, S, 3E) operand: slice — XLA fuses the slices into
        # the head-split relayouts the unpacked form performs anyway
        def fn_packed(x, *_):
            return fn(x[..., :E], x[..., E:2 * E], x[..., 2 * E:])
        return fn_packed
    return fn


def _build_flash_mha(key, interpret: bool):
    """Fused attention: one kernel per (batch, q-block) computing
    softmax(Q Kt * scale) V with the online-softmax recurrence; KV blocks are
    the innermost 'arbitrary' grid dim, so their HBM->VMEM copies pipeline
    against the two MXU contractions per step."""
    from .flags import FlashMhaKey
    assert isinstance(key, FlashMhaKey)
    # qkv_packed is EXCLUDED from the auto flash-heads route: measured
    # in-pipeline (gpt2_small_s1024 b2 d64), slicing the packed operand
    # to feed the flash kernel ran 58.4% vs the tokens kernel's 61.3% —
    # the value-level slices feeding a pallas_call materialize copies
    # (the r5b rule) and eat the 1.28x isolated win. The tokens kernel
    # consumes the packed operand in BlockSpec index space, copy-free.
    # strategy="flash_heads" still forces it for A/Bs.
    if key.heads and not key.repeats \
            and (not key.qkv_packed or key.strategy == "flash_heads") \
            and key.causal and key.seq == key.seq_kv \
            and key.dtype in ("f32", "bf16") \
            and key.precision == "default" and (
                key.strategy == "flash_heads"
                or (key.strategy == "auto" and key.head_dim < 128
                    and key.seq >= 1024)):
        fn = _build_attn_flash_heads(key, interpret)
        if fn is not None:
            return fn
    if key.heads and not key.repeats and (
            key.strategy == "xla"
            or (key.strategy == "auto" and key.head_dim < 128
                and key.seq < 1024)):
        # Measured head-to-head on v5e (r3, b8 s256 E1024): at D=64 the
        # token-layout Pallas kernel pays per-head 64-wide LANE slices
        # (vreg relayouts; 65.8us = 17%) while XLA's own composed attention
        # runs 32.6us = 34% — delegate, exactly as the conv path does. At
        # D=128 the Pallas kernel wins (25.1us vs 34.6us) and keeps the
        # job. r4: the delegation is SHORT-SEQUENCE only — at s=1024 the
        # XLA-composed path materializes the (B,H,S,S) f32 scores in HBM
        # (134MB at b2/h16) and collapses to 9.7% while the tokens kernel
        # holds 34.5% (3.5x, scripts/exp_d64_pair.py); the head-pair
        # +/- trick was also measured there and never beat tokens (33.2
        # vs 34.5 at s1024, 21 vs 28-46 at s256) — rejected. r7: the
        # long-seq causal case routes to the flash-train forward above
        # (1.28x tokens, flash_infer_r7.json). Override with
        # strategy="tokens"/"xla"/"flash_heads" to force a variant.
        return _build_attn_xla_tokens(key)
    if key.qkv_packed:
        import dataclasses
        assert key.heads and key.seq == key.seq_kv, key
        E = key.heads * key.head_dim
        if not key.repeats and key.seq >= 128:
            fn = _build_flash_mha_tokens(key, interpret)
            if fn is not None:
                return fn
        # fallback: slice the packed operand (XLA fuses the slices into the
        # relayouts the unpacked path performs anyway)
        inner = _build_flash_mha(
            dataclasses.replace(key, qkv_packed=False), interpret)

        def fn_packed(x, *_):
            return inner(x[..., :E], x[..., E:2 * E], x[..., 2 * E:])
        return fn_packed
    if key.heads:
        # token-layout kernel pays off when per-program work is real;
        # at tiny seq (s=32 benchmark regime) the head-grouped flat kernel
        # behind cheap relayouts measured 31.2% vs 23.7% for (S, W)-tiny
        # token blocks — gate on sequence length
        if not key.repeats and key.seq >= 128 and key.seq_kv >= 128:
            fn = _build_flash_mha_tokens(key, interpret)
            if fn is not None:
                return fn
        # fallback: split heads OUTSIDE the kernel (XLA fuses the
        # transposes into neighbors) and run the flat-layout variants
        import dataclasses
        B, S, Skv = key.batch, key.seq, key.seq_kv
        D, H = key.head_dim, key.heads
        inner = _build_flash_mha(
            dataclasses.replace(key, heads=0, batch=B * H), interpret)

        def split(x, s):
            return x.reshape(B, s, H, D).transpose(0, 2, 1, 3).reshape(
                B * H, s, D)

        def fn_tokens(q, k, v):
            o = inner(split(q, S), split(k, Skv), split(v, Skv))
            return o.reshape(B, H, S, D).transpose(0, 2, 1, 3).reshape(
                B, S, H * D)
        return fn_tokens
    if key.repeats:
        fn = _build_flash_bench(key, interpret)
        if fn is None:
            raise ValueError(
                f"warm attention bench does not fit VMEM for {key}")
        return fn
    B, S, Skv, D = key.batch, key.seq, key.seq_kv, key.head_dim
    dtype = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    sub, lane = current_target().min_tile(key.dtype)
    # bigger q/kv blocks amortize the online-softmax rescaling: measured on
    # v5e, 1024x1024 blocks run ~2x faster than 512x512 (PERF.md); cap so
    # the f32 score block (4*bq*bk) stays within ~1/3 of VMEM
    bq = key.bq or _divisor_block(S, 1024, sub)
    bk = key.bk or _divisor_block(Skv, 1024, lane if Skv % lane == 0 else sub)
    while 4 * bq * bk > current_target().vmem_bytes // 3 and bk > 256:
        bk //= 2
    # blocks must DIVIDE: the grid has no tail masking, so a padded final
    # KV block would add unmasked mass to the softmax denominator (and a
    # padded q block would write garbage rows). User overrides that don't
    # divide are rejected loudly; the VMEM halving re-snaps to a divisor.
    if Skv % bk:
        if key.bk:
            raise ValueError(
                f"flash bk override {key.bk} must divide seq_kv {Skv}")
        bk = _divisor_block(Skv, bk, sub)
    if S % bq:
        raise ValueError(f"flash bq override {key.bq} must divide seq {S}")
    nq = pl.cdiv(S, bq)
    nk = pl.cdiv(Skv, bk)
    if key.strategy == "grouped":
        return _build_flash_mha_grouped(key, interpret)
    if key.strategy == "twocall":
        fn = _build_flash_causal_twocall(key, interpret)
        if fn is None:
            raise ValueError(
                f"twocall causal attention does not apply to {key}")
        return fn
    if key.strategy == "twocall2":
        fn = _build_flash_causal_fold2(key, interpret)
        if fn is None:
            raise ValueError(
                f"twocall2 causal attention does not apply to {key}")
        return fn
    if key.strategy == "qblock":
        fn = _build_flash_mha_qblock(key, interpret)
        if fn is None:
            raise ValueError(
                f"qblock attention does not fit VMEM for {key}")
        return fn
    if key.strategy == "auto":
        if key.causal and S >= 1024 and D >= 128 and not key.bq \
                and not key.bk:
            # measured r5 (scripts/exp_causal_r5.py, one run, D=128
            # bf16 b8, % of triangle roof): twocall2 (band folded into
            # the rectangle, no LSE merge) wins at EVERY point of the
            # r4 crossover — s1024 50.6 vs qblock 39.3/twocall 37.9,
            # s1536 54.3 vs 34.3/39.7, s2048 46.8 vs 33.9/46.6 — so the
            # policy is fold2 from s1024 up.
            fn = _build_flash_causal_fold2(key, interpret)
            if fn is not None:
                return fn
        if key.causal and S >= 2048 and not key.bq and not key.bk:
            # D < 128: measured r5 at s2048 D64 bf16 (causal_d64_r5.json,
            # one run, % of triangle roof): fold2 23.6 / twocall 23.5 /
            # qblock 17.6 — fold2 ties the 3-call form with one fewer
            # call, so it leads; twocall stays as the fallback. s=1024
            # D<64 keeps masked-full (r4: 22.2 qblock vs 15.9 twocall).
            fn = _build_flash_causal_fold2(key, interpret)
            if fn is not None:
                return fn
            fn = _build_flash_causal_twocall(key, interpret)
            if fn is not None:
                return fn
        if nq == 1 and nk == 1 and not key.bq and not key.bk:
            # whole sequence per head: group heads per program so
            # per-program overhead amortizes (the seq<=512 regime)
            return _build_flash_mha_grouped(key, interpret)
        if nk > 1 and not key.bq and not key.bk:
            # long-seq regime: prefer whole-KV-resident q-blocking when K+V
            # for one head fit in VMEM (at D=64, 2*Skv*D*2B = 0.5 MB at
            # s=2048) — kills the online-softmax rescale chain entirely and
            # fetches K/V once per head instead of once per q-block
            fn = _build_flash_mha_qblock(key, interpret)
            if fn is not None:
                return fn
    grid = (B, nq, nk)

    in_specs = [
        pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
        i = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)

        def _step():
            q = q_ref[0].astype(jnp.float32) * (key.scale * _LOG2E)
            k = k_ref[0]
            s_blk = jax.lax.dot_general(
                q.astype(dtype), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (bq, bk)
            if key.causal:
                rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) \
                    + i * bq
                cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) \
                    + j * bk
                s_blk = jnp.where(rows >= cols, s_blk, -1e30)

            m_prev = m_ref[:]
            l_prev = l_ref[:]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s_blk, axis=1, keepdims=True))
            p = jnp.exp2(s_blk - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_ref[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[:] = m_new
            acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
                p.astype(dtype), v_ref[0], preferred_element_type=jnp.float32)

        if key.causal:
            # skip kv blocks entirely above the diagonal: their scores mask
            # to -inf and contribute nothing — half the MXU/VPU work
            @pl.when(j * bk <= i * bq + bq - 1)
            def _run():
                _step()
        else:
            _step()

        @pl.when(j == nk - 1)
        def _finish():
            o_ref[0] = (acc_ref[:] / l_ref[:]).astype(out_dtype)

    dsize = jnp.dtype(dtype).itemsize
    cost = pl.CostEstimate(
        flops=4 * B * S * Skv * D,
        bytes_accessed=B * (S * D * 2 + 2 * Skv * D) * dsize,
        transcendentals=B * S * Skv)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, D), out_dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32),
                        pltpu.VMEM((bq, 1), jnp.float32),
                        pltpu.VMEM((bq, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )

    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    return lambda q, k, v: call(q.astype(mxu_dt), k.astype(mxu_dt),
                                v.astype(mxu_dt))


def _build_chain_bench_pingpong(key, interpret: bool):
    """Warm-weights bench for a NON-square single-layer fc (k != n, see
    ChainKey.pingpong): even repeats run the fc forward, odd repeats
    contract the state with the SAME resident weight on its n axis to
    return to width k. Every repeat is one full m*k*n MXU contraction with
    a hard data dependency on the previous one, so nothing folds away;
    the output is the state after the last FORWARD step. NOTE: W^T is not
    W^-1, so that state equals a single fc application ONLY at R == 2 —
    for larger R it is the end of the fwd/back sequence (the differential
    test, tests/xsmm/test_chain.py, models exactly that sequence)."""
    m, (k, n) = key.m, key.dims
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    R = key.repeats
    last_fwd = R - 1 if (R - 1) % 2 == 0 else R - 2
    act = _UNARY_FNS.get(key.last_unary or "identity")

    in_specs = [pl.BlockSpec((m, k), lambda r: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda r: (0, 0),
                             memory_space=pltpu.VMEM)]
    if key.has_bias:
        in_specs.append(pl.BlockSpec((1, n), lambda r: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((m, n), lambda r: (0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        x_ref, w_ref = refs[0], refs[1]
        b_ref = refs[2] if key.has_bias else None
        o_ref = refs[2 + int(key.has_bias)]
        hk = refs[3 + int(key.has_bias)]
        hn = refs[4 + int(key.has_bias)]
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _seed():
            hk[:] = x_ref[:].astype(mxu_dt)

        @pl.when(r % 2 == 0)
        def _fwd():
            z = jnp.dot(hk[:], w_ref[:], preferred_element_type=jnp.float32)
            if key.has_bias:
                z = z + b_ref[:].astype(jnp.float32)
            hn[:] = act(z).astype(mxu_dt)

        @pl.when(r % 2 == 1)
        def _back():
            hk[:] = jax.lax.dot_general(
                hn[:], w_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(mxu_dt)

        @pl.when(r == last_fwd)
        def _finish():
            o_ref[:] = hn[:].astype(out_dtype)

    call = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((m, k), mxu_dt),
                        pltpu.VMEM((m, n), mxu_dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(flops=R * 2 * m * k * n,
                                      bytes_accessed=0, transcendentals=0),
        interpret=interpret,
    )

    def fn(x, *wb):
        args = [x.astype(mxu_dt) if x.ndim > 1 else x]
        for v in wb:
            args.append(v.reshape(1, -1) if v.ndim == 1
                        else v.astype(mxu_dt))
        return call(*args)

    return fn


def _build_chain_bench(key, interpret: bool):
    """perf.bench region inside the kernel: `repeats` sequential applications
    of the chain with the output fed back as the next input. Weights use
    constant-index BlockSpecs, so Pallas fetches them once and every later
    grid step revisits the resident copy — the steady-state, warm-weights
    rate, directly comparable to the reference's timed loop over a hot
    libxsmm kernel (and to XLA pinning weights across a scan)."""
    m, dims = key.m, key.dims
    L = len(dims) - 1
    assert dims[0] == dims[-1], "bench chain must be shape-preserving"
    dtype = _jdt(key.dtype)
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    grid = (key.repeats,)

    in_specs = [pl.BlockSpec((m, dims[0]), lambda r: (0, 0),
                             memory_space=pltpu.VMEM)]
    for li in range(L):
        in_specs.append(pl.BlockSpec((dims[li], dims[li + 1]),
                                     lambda r: (0, 0),
                                     memory_space=pltpu.VMEM))
        if key.has_bias:
            in_specs.append(pl.BlockSpec((1, dims[li + 1]),
                                         lambda r: (0, 0),
                                         memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((m, dims[-1]), lambda r: (0, 0),
                            memory_space=pltpu.VMEM)

    act = _UNARY_FNS.get(key.unary_kind or "identity")
    last_act = _UNARY_FNS.get(key.last_unary or "identity")
    step = 2 if key.has_bias else 1

    def kernel(*refs):
        # feedback stays in the MXU input dtype (hbuf scratch): the f32
        # output block only materializes on the final repeat, avoiding
        # per-iteration f32<->bf16 retiling round trips
        x_ref = refs[0]
        w_refs = [refs[1 + step * li] for li in range(L)]
        b_refs = [refs[2 + step * li] for li in range(L)] \
            if key.has_bias else [None] * L
        o_ref = refs[1 + step * L]
        hbuf = refs[2 + step * L]

        r = pl.program_id(0)

        @pl.when(r == 0)
        def _seed():
            hbuf[:] = x_ref[:].astype(mxu_dt)

        h = hbuf[:]
        for li in range(L):
            z = jnp.dot(h, w_refs[li][:],
                        preferred_element_type=jnp.float32)
            if key.has_bias:
                z = z + b_refs[li][:].astype(jnp.float32)
            h = (act if li < L - 1 else last_act)(z).astype(mxu_dt)
        hbuf[:] = h

        @pl.when(r == key.repeats - 1)
        def _finish():
            o_ref[:] = h.astype(out_dtype)

    flops = key.repeats * sum(2 * m * dims[i] * dims[i + 1]
                              for i in range(L))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, dims[-1]), out_dtype),
        scratch_shapes=[pltpu.VMEM((m, dims[0]), mxu_dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=0,
                                      transcendentals=0),
        interpret=interpret,
    )

    def fn(x, *wb):
        args = [x]
        for v in wb:
            if v.ndim == 1:
                args.append(v.reshape(1, -1))
            else:
                args.append(v.astype(mxu_dt))
        return call(*args)

    return fn


def _build_flash_bench(key, interpret: bool):
    """perf.bench in-kernel timed region for attention: grid
    (B, nq, repeats) with K/V on constant-index BlockSpecs (fetched once per
    batch-head, resident across all repeats) and the output fed back as the
    next query through a (bq, D) VMEM scratch — the warm-KV analogue of the
    chain bench (`_build_chain_bench`). Softmax keeps the feedback bounded,
    so arbitrarily long repeat chains stay finite. Returns None when
    K/V + the score block don't fit VMEM."""
    B, S, Skv, D = key.batch, key.seq, key.seq_kv, key.head_dim
    dtype = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    dsz = jnp.dtype(mxu_dt).itemsize
    sub = 16 if dsz == 2 else 8
    budget = int(current_target().vmem_bytes * 0.85)
    fixed = 2 * Skv * D * dsz

    def need(bq_):
        # q/out blocks double-buffered (changing indices); the f32
        # feedback scratch is persistent (single)
        return (fixed + bq_ * D * (4 * dsz + 4) + 8 * bq_ * Skv)

    bq = 0
    cand = S
    while cand >= sub:
        if S % cand == 0 and cand % sub == 0 and need(cand) <= budget:
            bq = cand
            break
        cand //= 2
    if bq < 128:
        return None
    nq = S // bq
    # group heads per program when the whole sequence fits, exactly like the
    # grouped forward kernel — without it the warm bench under-reports small
    # -S shapes (measured: 1-head programs at S=256 ran 17.8% vs the
    # head-grouped scan's 32%)
    G = 1
    if nq == 1:
        for g in (8, 4, 2):
            if B % g == 0 and g * need(bq) <= budget:
                G = g
                break
    R = key.repeats
    grid = (B // G, nq, R)

    in_specs = [
        pl.BlockSpec((G, bq, D), lambda b, i, r: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, Skv, D), lambda b, i, r: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, Skv, D), lambda b, i, r: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((G, bq, D), lambda b, i, r: (b, i, 0),
                            memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, o_ref, hbuf):
        i = pl.program_id(1)
        r = pl.program_id(2)

        @pl.when(r == 0)
        def _seed():
            hbuf[:] = q_ref[:].reshape(G * bq, D).astype(mxu_dt)

        for g in range(G):
            q = hbuf[g * bq:(g + 1) * bq, :].astype(jnp.float32) \
                * (key.scale * _LOG2E)
            s = jax.lax.dot_general(
                q.astype(dtype), k_ref[g],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if key.causal:
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (bq, Skv), 0) + i * bq
                cols = jax.lax.broadcasted_iota(jnp.int32, (bq, Skv), 1)
                s = jnp.where(rows >= cols, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(dtype), v_ref[g],
                        preferred_element_type=jnp.float32) / l
            hbuf[g * bq:(g + 1) * bq, :] = o.astype(mxu_dt)

        @pl.when(r == R - 1)
        def _finish():
            o_ref[:] = hbuf[:].reshape(G, bq, D).astype(out_dtype)

    cost = pl.CostEstimate(
        flops=R * 4 * B * S * Skv * D,
        bytes_accessed=B * (S * D * 2 + 2 * Skv * D) * dsz,
        transcendentals=R * B * S * Skv)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, D), out_dtype),
        scratch_shapes=[pltpu.VMEM((G * bq, D), mxu_dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )
    return lambda q, k, v: call(q.astype(mxu_dt), k.astype(mxu_dt),
                                v.astype(mxu_dt))


def _build_attn_xla_tokens(key):
    """Token-layout attention COMPOSED IN XLA (head split -> batched
    softmax attention -> merge), the delegation target for head widths the
    Pallas tokens kernel handles badly (D < 128: per-head lane slices are
    vreg relayouts; measured 2x slower than this path on v5e — see
    _build_flash_mha). Plays the same role as the conv path's strategy
    "xla": the platform engine where it wins, Pallas where we win."""
    from .flags import FlashMhaKey
    assert isinstance(key, FlashMhaKey)
    B, S, Skv, D, H = (key.batch, key.seq, key.seq_kv, key.head_dim,
                       key.heads)
    E = H * D

    def split(t, s):
        return t.reshape(B, s, H, D).transpose(0, 2, 1, 3)

    def core(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", split(q, S), split(k, Skv),
                       preferred_element_type=jnp.float32) * key.scale
        if key.causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (S, Skv), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (S, Skv), 1)
            s = jnp.where(rows >= cols, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, split(v, Skv),
                       preferred_element_type=jnp.float32)
        return o.transpose(0, 2, 1, 3).reshape(B, S, E).astype(q.dtype)

    if key.qkv_packed:
        return lambda x, *_: core(x[..., :E], x[..., E:2 * E],
                                  x[..., 2 * E:])
    return core


def _build_flash_mha_tokens(key, interpret: bool):
    """Attention on the TOKEN layout (B, S, H*D): heads are COLUMN slices
    selected in BlockSpec index space — `hp` heads per program so the block
    width hp*D is lane-aligned (2 heads at D=64, 1 at D=128). The QKV
    projections' natural output feeds the kernel directly and the output
    feeds the out-projection directly: the head-split/merge transposes and
    reshapes that cost 6 HBM round trips in the flat layout simply do not
    exist. K/V for the program's heads stay VMEM-resident across q blocks
    (same elision as the qblock variant). Returns None when the block set
    cannot be lane-aligned or does not fit VMEM."""
    from .flags import FlashMhaKey
    assert isinstance(key, FlashMhaKey)
    B, S, Skv, D, H = (key.batch, key.seq, key.seq_kv, key.head_dim,
                       key.heads)
    E = H * D
    dtype = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    dsz = jnp.dtype(mxu_dt).itemsize
    sub = 16 if dsz == 2 else 8
    budget = int(current_target().vmem_bytes * 0.85)

    # Pick the LARGEST lane-aligned head group that fits VMEM: a v5e chip
    # has one TensorCore, so grid parallelism costs nothing, while small
    # groups are fatal — at hp=2 the K/V fetches of a qkv_packed operand
    # are 256-byte-per-row strided DMAs and the packed transformer block
    # measured the attention at 12.4% of roofline (87.9 us); wide groups
    # make the per-row chunks contiguous-KB-sized and amortize per-program
    # overhead over hp head-loops.
    def blocks(bq_, W_):
        # pallas double-buffers every changing block (q, K, V, out)
        return 2 * (2 * Skv * W_ * dsz
                    + bq_ * W_ * (dsz + jnp.dtype(out_dtype).itemsize))

    def need(bq_, W_):
        # blocks + the (hp, bq, Skv) f32 scores scratch of the phase-split
        # kernel + softmax temporaries (measured calibration: a 13.1MB
        # estimate once allocated 16.2MB and OOM'd scoped vmem)
        hp_ = W_ // D
        return blocks(bq_, W_) + 4 * hp_ * bq_ * Skv + 8 * bq_ * Skv

    def pick_bq(W_):
        cand = S
        while cand >= sub:
            if S % cand == 0 and cand % sub == 0 and need(cand, W_) <= budget:
                return cand
            cand //= 2
        return 0

    hp, bq = 0, 0
    h_cand = H
    while h_cand >= 1:
        W_ = h_cand * D
        # the W_ == E escape is only lane-legal for SPLIT q/k/v operands
        # (block dim == array dim); a packed operand's last dim is 3E, so
        # a non-128-divisible W_ block would violate the Mosaic last-dim
        # constraint (advisor r2 finding)
        lane_ok = (W_ % 128 == 0
                   or (W_ == E and not key.qkv_packed))
        if H % h_cand == 0 and lane_ok:
            b_ = pick_bq(W_)
            if b_ >= min(S, 128):
                hp, bq = h_cand, b_
                break
        h_cand //= 2
    if not hp:
        return None
    W = hp * D
    nq = S // bq
    # aggregate G batch elements per program when VMEM allows: one chip has
    # one TensorCore, so grid parallelism is free while per-program fixed
    # cost (setup + DMA issue latency) is not — G-wide blocks also make the
    # K/V fetches G-fold longer contiguous transfers
    # batch grouping: G multiplies the per-batch blocks but the scores
    # scratch is reused across the G loop
    G = 1
    for cand in (4, 2):
        if B % cand == 0 and cand * blocks(bq, W)                 + 4 * hp * bq * Skv + 8 * bq * Skv <= budget:
            G = cand
            break
    grid = (B // G, H // hp, nq)

    if key.qkv_packed:
        # one (B, S, 3E) operand, [Q | K | V] column groups: K/V blocks
        # live at group offsets H//hp and 2*H//hp of the SAME array — the
        # merged QKV projection output feeds the kernel with no slice ever
        # materialized (the packed array is passed for all three specs)
        goff = H // hp
        in_specs = [
            pl.BlockSpec((G, bq, W), lambda b, g, i: (b, i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Skv, W), lambda b, g, i: (b, 0, g + goff),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Skv, W), lambda b, g, i: (b, 0, g + 2 * goff),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((G, bq, W), lambda b, g, i: (b, i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Skv, W), lambda b, g, i: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Skv, W), lambda b, g, i: (b, 0, g),
                         memory_space=pltpu.VMEM),
        ]
    out_spec = pl.BlockSpec((G, bq, W), lambda b, g, i: (b, i, g),
                            memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, o_ref, s_ref):
        # PHASE-SPLIT per batch element: all hp QK dots into the scores
        # scratch, then all softmaxes, then all AV dots — consecutive MXU
        # passes pipeline instead of stalling on the VPU softmax between
        # every pair of dots (measured: 19.6us vs 23.1us interleaved at
        # d128/s256)
        i = pl.program_id(2)
        for bb in range(G):
            for t in range(hp):
                q = (q_ref[bb, :, t * D:(t + 1) * D].astype(jnp.float32)
                     * (key.scale * _LOG2E)).astype(dtype)
                s_ref[t] = jax.lax.dot_general(
                    q, k_ref[bb, :, t * D:(t + 1) * D],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (bq, Skv)
            ps = []
            for t in range(hp):
                s = s_ref[t]
                if key.causal:
                    rows = jax.lax.broadcasted_iota(
                        jnp.int32, (bq, Skv), 0) + i * bq
                    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, Skv), 1)
                    s = jnp.where(rows >= cols, s, -1e30)
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                ps.append((p / l).astype(dtype))
            for t in range(hp):
                o_ref[bb, :, t * D:(t + 1) * D] = jnp.dot(
                    ps[t], v_ref[bb, :, t * D:(t + 1) * D],
                    preferred_element_type=jnp.float32).astype(out_dtype)

    flops = 4 * B * S * Skv * E
    if key.causal:
        flops //= 2
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=B * (S * E * 2 + 2 * Skv * E) * dsz,
        transcendentals=B * H * S * Skv)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, E), out_dtype),
        scratch_shapes=[pltpu.VMEM((hp, bq, Skv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )
    return lambda q, k, v: call(q.astype(mxu_dt), k.astype(mxu_dt),
                                v.astype(mxu_dt))


def _build_flash_mha_qblock(key, interpret: bool):
    """Long-sequence attention with the WHOLE K/V resident per head and the
    query dimension blocked: grid (B, nq). No online softmax — the full
    score row (bq, Skv) is materialized once, so the per-kv-block rescale
    chain (2 extra exps + 2 multiplies of the accumulator per step) and the
    nq-fold K/V refetch of the blocked path both disappear. At D=64 the two
    attention dots can at most half-fill the MXU (64-wide contraction /
    output vs 128 lanes), which makes the VPU softmax work the co-bottleneck
    — this variant spends the VMEM budget on removing exactly that.

    Causal runs the SAME kernel with a triangular mask — full-square wall
    time. Two work-skipping designs measured WORSE on v5e r3 and were
    removed: an in-kernel kv-chunk loop (pl.when-guarded chunk dots ran 2-4x
    slower than one full-row dot, whether scores round-tripped through VMEM
    scratch or ran online), and per-q-block specialized calls (refetch K/V
    nq times — fatal at D=64 f32 near the bandwidth bound). Mosaic's cost
    model wants one large dot per program; the diagonal skip does not pay
    at these sequence lengths.

    Returns None when K+V+scores don't fit in VMEM (fall back to the
    blocked online-softmax path)."""
    from .flags import FlashMhaKey
    assert isinstance(key, FlashMhaKey)
    B, S, Skv, D = key.batch, key.seq, key.seq_kv, key.head_dim
    dtype = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    dsz = jnp.dtype(mxu_dt).itemsize
    sub = 16 if dsz == 2 else 8
    budget = int(current_target().vmem_bytes * 0.85)
    fixed = 2 * Skv * D * dsz                      # resident K + V

    def need(bq_):
        # q + out blocks DOUBLE-BUFFERED (changing block indices — the
        # CLAUDE.md r3 VMEM lesson), f32 scores + one f32-sized temp
        return (fixed
                + 2 * bq_ * D * (dsz + jnp.dtype(out_dtype).itemsize)
                + 8 * bq_ * Skv)

    bq = 0
    cand = S
    while cand >= sub:
        if S % cand == 0 and cand % sub == 0 and need(cand) <= budget:
            bq = cand
            break
        cand //= 2
    if key.bq and S % key.bq == 0 and need(key.bq) <= budget:
        bq = key.bq                      # explicit override for experiments
    if bq < 128:   # too small to amortize the grid step — not worth it
        return None
    nq = S // bq
    grid = (B, nq)

    in_specs = [
        pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Skv, D), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Skv, D), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        i = pl.program_id(1)
        q = q_ref[0].astype(jnp.float32) * (key.scale * _LOG2E)
        s = jax.lax.dot_general(
            q.astype(dtype), k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (bq, Skv)
        if key.causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (bq, Skv), 0) + i * bq
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, Skv), 1)
            s = jnp.where(rows >= cols, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(dtype), v_ref[0],
                    preferred_element_type=jnp.float32)
        o_ref[0] = (o / l).astype(out_dtype)

    cost = pl.CostEstimate(
        flops=4 * B * S * Skv * D,
        bytes_accessed=B * (S * D * 2 + 2 * Skv * D) * dsz,
        transcendentals=B * S * Skv)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=cost,
        interpret=interpret,
    )
    return lambda q, k, v: call(q.astype(mxu_dt), k.astype(mxu_dt),
                                v.astype(mxu_dt))


def _build_flash_causal_twocall(key, interpret: bool):
    """Causal attention as TWO fixed specializations + a stats merge (the
    judge-r2 untried design): the S x S triangle splits into
      - band_lo : causal(Q[:S/2],  KV[:S/2])   — final for the low rows
      - band_hi : causal(Q[S/2:],  KV[S/2:])   — local triangle, + LSE
      - dense   : unmasked(Q[S/2:], KV[:S/2])  — full-MXU rectangle, + LSE
    and the high rows combine band_hi/dense by their log-sum-exp stats in
    one fused XLA elementwise pass. KV is fetched exactly TWICE (KV_lo by
    band_lo and dense, KV_hi once) — not nq times like the rejected
    per-q-block specialization. All three calls address the FULL arrays
    via BlockSpec offsets, so no slice/concat of operands materializes.
    Masked-full work drops from S^2 to 3/4 S^2, the dense quarter at the
    unmasked rate. Returns None when the half-shape does not fit the
    qblock VMEM budget."""
    from .flags import FlashMhaKey
    assert isinstance(key, FlashMhaKey)
    if (not key.causal or key.seq != key.seq_kv or key.seq % 2
            or key.heads or key.repeats):
        return None
    B, S, D = key.batch, key.seq, key.head_dim
    half = S // 2
    dtype = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    dsz = jnp.dtype(mxu_dt).itemsize
    sub = 16 if dsz == 2 else 8
    budget = int(current_target().vmem_bytes * 0.85)
    fixed = 2 * half * D * dsz                     # resident K + V halves

    def need(bq_):
        return (fixed + bq_ * D * (dsz + jnp.dtype(out_dtype).itemsize)
                + 8 * bq_ * half)

    bq = 0
    cand = half
    while cand >= sub:
        if half % cand == 0 and cand % sub == 0 and need(cand) <= budget:
            bq = cand
            break
        cand //= 2
    if bq < 128:
        return None
    nqh = half // bq

    def partial(qoff_blocks, kv_off, causal, lse):
        in_specs = [
            pl.BlockSpec((1, bq, D),
                         lambda b, i: (b, i + qoff_blocks, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half, D), lambda b, i: (b, kv_off, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half, D), lambda b, i: (b, kv_off, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((B, half, D), out_dtype)]
        if lse:
            out_specs.append(pl.BlockSpec((1, bq, 1),
                                          lambda b, i: (b, i, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((B, half, 1),
                                                  jnp.float32))

        def kernel(q_ref, k_ref, v_ref, o_ref, *rest):
            i = pl.program_id(1)
            q = q_ref[0].astype(jnp.float32) * (key.scale * _LOG2E)
            s = jax.lax.dot_general(
                q.astype(dtype), k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (bq, half)
            if causal:
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (bq, half), 0) + i * bq
                cols = jax.lax.broadcasted_iota(jnp.int32, (bq, half), 1)
                s = jnp.where(rows >= cols, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(dtype), v_ref[0],
                        preferred_element_type=jnp.float32)
            o_ref[0] = (o / l).astype(out_dtype)
            if lse:
                rest[0][0] = m + jnp.log2(l)      # exp2-domain LSE

        cost = pl.CostEstimate(
            flops=4 * B * half * half * D,
            bytes_accessed=B * half * D * 4 * dsz,
            transcendentals=B * half * half)
        return pl.pallas_call(
            kernel,
            grid=(B, nqh),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=cost,
            interpret=interpret,
        )

    band_lo = partial(0, 0, causal=True, lse=False)
    band_hi = partial(nqh, 1, causal=True, lse=True)
    dense = partial(nqh, 0, causal=False, lse=True)

    def fn(q, k, v):
        q_, k_, v_ = (q.astype(mxu_dt), k.astype(mxu_dt),
                      v.astype(mxu_dt))
        (o_lo,) = band_lo(q_, k_, v_)
        o_hb, lse_b = band_hi(q_, k_, v_)
        o_d, lse_d = dense(q_, k_, v_)
        mm = jnp.maximum(lse_b, lse_d)
        wb = jnp.exp2(lse_b - mm)
        wd = jnp.exp2(lse_d - mm)
        o_hi = ((o_hb.astype(jnp.float32) * wb
                 + o_d.astype(jnp.float32) * wd)
                / (wb + wd)).astype(out_dtype)
        return jnp.concatenate([o_lo, o_hi], axis=1)

    return fn


def _build_flash_causal_fold2(key, interpret: bool):
    """Causal attention as literally TWO calls and NO stats merge (the
    r4-verdict "band folded into the rectangle" variant):

      - lo: causal(Q[:S/2], KV[:S/2])  — final for the low rows
      - hi: causal(Q[S/2:], KV[:S])    — ONE whole-KV-resident call with
        the global causal mask: the band and the dense rectangle of the
        3-call form (_build_flash_causal_twocall) compute in a single
        softmax pass, so the LSE outputs, the exp2 merge arithmetic and
        its extra HBM round trip over the high half disappear.

    KV traffic matches the 3-call form (KV_lo twice, KV_hi once); the
    hi call masks its top-right triangle (1/4 of its S/2 x S scores),
    total work 3/4 S^2 like the 3-call split. Returns None when the
    full KV does not fit the VMEM budget."""
    from .flags import FlashMhaKey
    assert isinstance(key, FlashMhaKey)
    if (not key.causal or key.seq != key.seq_kv or key.seq % 2
            or key.heads or key.repeats):
        return None
    B, S, D = key.batch, key.seq, key.head_dim
    half = S // 2
    dtype = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    dsz = jnp.dtype(mxu_dt).itemsize
    sub = 16 if dsz == 2 else 8
    budget = int(current_target().vmem_bytes * 0.85)

    def need(bq_, kvlen):
        return (2 * kvlen * D * dsz
                + bq_ * D * (dsz + jnp.dtype(out_dtype).itemsize)
                + 8 * bq_ * kvlen)

    bq = 0
    cand = half
    while cand >= sub:
        if half % cand == 0 and cand % sub == 0 \
                and need(cand, S) <= budget:
            bq = cand
            break
        cand //= 2
    if bq < 128:
        return None
    nqh = half // bq

    def call(qoff_blocks, kvlen, row_off):
        def kernel(q_ref, k_ref, v_ref, o_ref):
            i = pl.program_id(1)
            q = q_ref[0].astype(jnp.float32) * (key.scale * _LOG2E)
            s = jax.lax.dot_general(
                q.astype(dtype), k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # (bq, kvlen)
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (bq, kvlen), 0) + i * bq + row_off
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, kvlen), 1)
            s = jnp.where(rows >= cols, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(dtype), v_ref[0],
                        preferred_element_type=jnp.float32)
            o_ref[0] = (o / l).astype(out_dtype)

        cost = pl.CostEstimate(
            flops=4 * B * half * kvlen * D,
            bytes_accessed=B * (half + 2 * kvlen) * D * dsz,
            transcendentals=B * half * kvlen)
        return pl.pallas_call(
            kernel,
            grid=(B, nqh),
            in_specs=[
                pl.BlockSpec((1, bq, D),
                             lambda b, i: (b, i + qoff_blocks, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kvlen, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kvlen, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, half, D), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=cost,
            interpret=interpret,
        )

    lo = call(0, half, 0)
    hi = call(nqh, S, half)

    def fn(q, k, v):
        q_, k_, v_ = (q.astype(mxu_dt), k.astype(mxu_dt),
                      v.astype(mxu_dt))
        o_lo = lo(q_, k_, v_)
        o_hi = hi(q_, k_, v_)
        return jnp.concatenate([o_lo, o_hi], axis=1)

    return fn


def _build_flash_mha_grouped(key, interpret: bool):
    """Whole-sequence attention, G heads per grid step (no online softmax
    needed: the full score row is resident)."""
    B, S, Skv, D = key.batch, key.seq, key.seq_kv, key.head_dim
    out_dtype = _jdt(key.out_dtype or key.dtype)
    dsize = 2 if key.dtype in ("bf16", "f16") else 4
    budget = current_target().vmem_bytes // 3
    G = 1
    for cand in (8, 4, 2):
        if B % cand == 0 and cand * (3 * S * D * dsize + 4 * S * Skv) \
                <= budget:
            G = cand
            break
    grid = (B // G,)
    in_specs = [pl.BlockSpec((G, S, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)] * 3
    out_spec = pl.BlockSpec((G, S, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for g in range(G):
            q = q_ref[g].astype(jnp.float32) * (key.scale * _LOG2E)
            sc = jax.lax.dot_general(
                q.astype(q_ref.dtype), k_ref[g],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if key.causal:
                rows = jax.lax.broadcasted_iota(jnp.int32, (S, Skv), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (S, Skv), 1)
                sc = jnp.where(rows >= cols, sc, -1e30)
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp2(sc - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o_ref[g] = (jnp.dot(p.astype(v_ref.dtype), v_ref[g],
                                preferred_element_type=jnp.float32)
                        / l).astype(out_dtype)

    cost = pl.CostEstimate(
        flops=4 * B * S * Skv * D,
        bytes_accessed=B * (S * D * 2 + 2 * Skv * D) * dsize,
        transcendentals=B * S * Skv)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=cost,
        interpret=interpret,
    )
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    return lambda q, k, v: call(q.astype(mxu_dt), k.astype(mxu_dt),
                                v.astype(mxu_dt))


def _build_conv_brgemm(key: ConvBrgemmKey, interpret: bool):
    """Channel-blocked conv as BRGEMM. Stride-1 (any R,S): the (r,s) filter
    tap slides a (P,Q) window over the resident (H,W) input block, so the
    reduction over (Cb,R,S) is the grid's innermost 'arbitrary' dimension —
    input blocks are DMA'd once per Cb, not once per tap."""
    N, H, W, Cb, c, Kb, k = (key.N, key.H, key.W, key.Cb, key.c, key.Kb, key.k)
    R, S, sh, sw = key.R, key.S, key.stride_h, key.stride_w
    if (sh, sw) != (1, 1):
        raise NotImplementedError(
            "stride>1 conv stays on the XLA conv path (reference also "
            "restricts conv-to-BRGEMM to stride 1, docs/ConvMapping.md)")
    P, Q = key.P, key.Q
    dtype = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    has_c = not key.beta0
    has_d = key.binary_kind is not None
    red_steps = Cb

    # The (R,S) tap loop is unrolled INSIDE the kernel with static window
    # slices: Mosaic requires dynamic sublane offsets to be 8-aligned, and
    # conv taps shift by 1 — static slices lower as cheap relayouts. The
    # grid reduction covers channel blocks only.
    grid = (N, Kb, red_steps)
    in_specs = [
        pl.BlockSpec((1, 1, H, W, c),
                     lambda n_, kb, r: (n_, r, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, R, S, c, k),
                     lambda n_, kb, r: (kb, r, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_c:
        in_specs.append(pl.BlockSpec((1, 1, P, Q, k),
                                     lambda n_, kb, r: (n_, kb, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    if has_d:
        # bias packed [Kb, k] passed flat (1, Kb*k), column-block per kb
        in_specs.append(pl.BlockSpec((1, k), lambda n_, kb, r: (0, kb),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, 1, P, Q, k),
                            lambda n_, kb, r: (n_, kb, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        idx = 0
        i_ref = refs[idx]; idx += 1
        w_ref = refs[idx]; idx += 1
        c_ref = refs[idx] if has_c else None
        idx += has_c
        d_ref = refs[idx] if has_d else None
        idx += has_d
        o_ref = refs[idx]
        acc_ref = refs[idx + 1]

        r = pl.program_id(2)

        @pl.when(r == 0)
        def _init():
            if has_c:
                acc_ref[:] = c_ref[0, 0].astype(jnp.float32)
            else:
                acc_ref[:] = jnp.zeros_like(acc_ref)

        update = jnp.zeros((P * Q, k), jnp.float32)
        for rr in range(R):
            for ss in range(S):
                win = i_ref[0, 0, rr:rr + P, ss:ss + Q, :]   # (P, Q, c)
                a = win.reshape(P * Q, c)
                w = w_ref[0, 0, rr, ss]                      # (c, k)
                update = update + jnp.dot(
                    a, w, preferred_element_type=jnp.float32)
        acc_ref[:] += update.reshape(P, Q, k)

        @pl.when(r == red_steps - 1)
        def _finish():
            res = acc_ref[:]
            d_blk = d_ref[:] if has_d else None
            res = _apply_epilogue(res, d_blk, key.binary_kind, key.unary_kind)
            o_ref[0, 0] = res.astype(out_dtype)

    cost = pl.CostEstimate(
        flops=2 * N * Kb * Cb * R * S * P * Q * c * k,
        bytes_accessed=(N * Cb * H * W * c + Kb * Cb * R * S * c * k
                        + N * Kb * P * Q * k) * jnp.dtype(dtype).itemsize,
        transcendentals=0)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((N, Kb, P, Q, k), out_dtype),
        scratch_shapes=[pltpu.VMEM((P, Q, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )

    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)

    def fn(i, w, cacc=None, d=None):
        args = [i.astype(mxu_dt), w.astype(mxu_dt)]
        if has_c:
            args.append(cacc)
        if has_d:
            args.append(d.reshape(1, -1))
        return call(*args)

    return fn


# ---------------------------------------------------------------------------
# Unary / binary (XLA-fused VPU path; see module docstring)
# ---------------------------------------------------------------------------

def _conv_nhwc_blocks(key) -> tuple[int, int, int]:
    """(G, cblk, kblk) heuristic for the NHWC conv kernel: lane-aligned
    channel blocks, then as many images per program as ~40% of VMEM allows
    (bigger G = longer MXU operands = less systolic fill per useful row)."""
    t = current_target()
    lane = 128
    dsize = 2 if key.dtype in ("bf16", "f16") else 4
    cblk = key.cblk or (_divisor_block(key.C, 512, lane)
                        if key.C % lane == 0 else key.C)
    kblk = key.kblk or (_divisor_block(key.K, 256, lane)
                        if key.K % lane == 0 else key.K)
    budget = int(t.vmem_bytes * 0.4)
    G = key.G
    if not G:
        G = 1
        per_img = (key.H * key.W * cblk * dsize          # input block
                   + key.P * key.Q * kblk * (4 + dsize))  # acc + out block
        fixed = key.R * key.S * cblk * kblk * dsize
        for cand in (8, 4, 2):
            if key.N % cand == 0 and fixed + cand * per_img <= budget:
                G = cand
                break
    return G, cblk, kblk


def _build_conv_nhwc(key, interpret: bool):
    """NHWC-native conv-BRGEMM: see ConvNhwcKey. Grid (N/G, Kb, Cb) with the
    channel-block reduction innermost ('arbitrary') so input blocks pipeline
    against compute; (R,S) taps unrolled with static slices (Mosaic requires
    8-aligned dynamic sublane offsets)."""
    from .flags import ConvNhwcKey
    assert isinstance(key, ConvNhwcKey)
    strategy = key.strategy
    if strategy == "auto":
        # Honest head-to-head on v5e (round 2 experiment, PERF.md): XLA's
        # native NHWC conv reaches 88-93% of the bf16 roofline on the
        # benchmark shapes while the hand Pallas strategies top out at
        # 28-59%. Delegate the contraction to the platform engine and keep
        # the fused epilogue in the same jit region; Pallas strategies stay
        # selectable where a custom schedule wins.
        strategy = "xla"
    if strategy == "xla":
        return _build_conv_nhwc_xla(key, interpret)
    if any(key.pad):
        # Pallas strategies take pre-padded inputs: pad outside the kernel
        # (one cheap XLA op) and run the unpadded-key kernel
        import dataclasses
        ikey = dataclasses.replace(
            key, pad=(0, 0, 0, 0),
            H=key.H + key.pad[0] + key.pad[1],
            W=key.W + key.pad[2] + key.pad[3])
        inner = _build_conv_nhwc(ikey, interpret)
        p = key.pad

        def fn_padded(i, w, cacc=None, d=None):
            i = jnp.pad(i, ((0, 0), (p[0], p[1]), (p[2], p[3]), (0, 0)))
            return inner(i, w, cacc, d)

        return fn_padded
    if (key.stride_h, key.stride_w) != (1, 1):
        raise NotImplementedError(
            "stride>1 conv runs via strategy='xla' (reference also "
            "restricts conv-to-BRGEMM to stride 1, docs/ConvMapping.md)")
    if strategy == "fullrow":
        return _build_conv_nhwc_fullrow(key, interpret)
    N, H, W, C, K = key.N, key.H, key.W, key.C, key.K
    R, S = key.R, key.S
    P, Q = key.P, key.Q
    dtype = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    G, cblk, kblk = _conv_nhwc_blocks(key)
    Cb, Kb = C // cblk, K // kblk
    has_c = not key.beta0
    has_d = key.binary_kind is not None
    full_d = has_d and key.binary_bcast == "none"   # residual-add operand

    grid = (N // G, Kb, Cb)
    in_specs = [
        pl.BlockSpec((G, H, W, cblk), lambda n_, kb, r: (n_, 0, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, S, cblk, kblk), lambda n_, kb, r: (0, 0, r, kb),
                     memory_space=pltpu.VMEM),
    ]
    if has_c:
        in_specs.append(pl.BlockSpec((G, P, Q, kblk),
                                     lambda n_, kb, r: (n_, 0, 0, kb),
                                     memory_space=pltpu.VMEM))
    if has_d:
        if full_d:
            in_specs.append(pl.BlockSpec((G, P, Q, kblk),
                                         lambda n_, kb, r: (n_, 0, 0, kb),
                                         memory_space=pltpu.VMEM))
        else:  # channel bias, flat (1, K), column block per kb
            in_specs.append(pl.BlockSpec((1, kblk),
                                         lambda n_, kb, r: (0, kb),
                                         memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((G, P, Q, kblk), lambda n_, kb, r: (n_, 0, 0, kb),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        idx = 0
        i_ref = refs[idx]; idx += 1
        w_ref = refs[idx]; idx += 1
        c_ref = refs[idx] if has_c else None
        idx += has_c
        d_ref = refs[idx] if has_d else None
        idx += has_d
        o_ref = refs[idx]
        acc_ref = refs[idx + 1]          # (G*P*Q, kblk) f32

        r = pl.program_id(2)

        @pl.when(r == 0)
        def _init():
            if has_c:
                acc_ref[:] = c_ref[:].reshape(G * P * Q, kblk) \
                    .astype(jnp.float32)
            else:
                acc_ref[:] = jnp.zeros_like(acc_ref)

        update = jnp.zeros((G * P * Q, kblk), jnp.float32)
        for rr in range(R):
            for ss in range(S):
                wins = [i_ref[g, rr:rr + P, ss:ss + Q, :]
                        .reshape(P * Q, cblk) for g in range(G)]
                a = wins[0] if G == 1 else jnp.concatenate(wins, axis=0)
                update = update + jnp.dot(
                    a, w_ref[rr, ss], preferred_element_type=jnp.float32)
        acc_ref[:] += update

        @pl.when(r == Cb - 1)
        def _finish():
            res = acc_ref[:]
            if has_d:
                d_blk = (d_ref[:].reshape(G * P * Q, kblk) if full_d
                         else d_ref[:])
                res = _apply_epilogue(res, d_blk, key.binary_kind, None)
            if key.unary_kind:
                res = _UNARY_FNS[key.unary_kind](res)
            o_ref[:] = res.reshape(G, P, Q, kblk).astype(out_dtype)

    dsize = jnp.dtype(dtype).itemsize
    cost = pl.CostEstimate(
        flops=2 * N * P * Q * C * K * R * S,
        bytes_accessed=(N * H * W * C + R * S * C * K
                        + N * P * Q * K) * dsize,
        transcendentals=0)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((N, P, Q, K), out_dtype),
        scratch_shapes=[pltpu.VMEM((G * P * Q, kblk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )

    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)

    def fn(i, w, cacc=None, d=None):
        args = [i.astype(mxu_dt), w.astype(mxu_dt)]
        if has_c:
            args.append(cacc)
        if has_d:
            args.append(d if full_d else d.reshape(1, -1))
        return call(*args)

    return fn


def _build_conv_nhwc_xla(key, interpret: bool):
    """NHWC conv via XLA's native convolution, with the fused epilogue
    (accumulator init / bias / residual add / activation) in the SAME jit
    region so XLA fuses it into the conv's output transform.

    This is the measured-best default (auto): on v5e XLA's conv hits 88-93%
    of the bf16 roofline on the reference's conv suite shapes
    (docs/ConvMapping.md is the reference's mapping; our value-add is the
    epilogue fusion the xsmm-combine pass recovered, which XLA cannot see
    across a call boundary but fuses perfectly inside one region). The
    Pallas strategies ("fullrow"/"window") remain for shapes where a custom
    schedule beats the platform conv. Unlike those, this path also handles
    stride>1."""
    from .flags import ConvNhwcKey
    assert isinstance(key, ConvNhwcKey)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    has_c = not key.beta0
    has_d = key.binary_kind is not None
    full_d = has_d and key.binary_bcast == "none"
    prec = (jax.lax.Precision.HIGHEST if key.precision == "highest"
            else jax.lax.Precision.DEFAULT)
    # Mirror the MXU input-dtype policy of the Pallas kernels so numerics
    # match across strategies: f32 at default precision runs as bf16 passes
    # on the MXU; interpret (CPU tests) keeps f32 exact.
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)

    padding = (((key.pad[0], key.pad[1]), (key.pad[2], key.pad[3]))
               if any(key.pad) else "VALID")

    def fn(i, w, cacc=None, d=None):
        out = jax.lax.conv_general_dilated(
            i.astype(mxu_dt), w.astype(mxu_dt),
            window_strides=(key.stride_h, key.stride_w),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=prec)
        if has_c:
            out = out + cacc.astype(jnp.float32)
        if has_d:
            d_b = d if full_d else d.reshape(1, 1, 1, key.K)
            out = _BINARY_FNS[key.binary_kind](out, d_b.astype(jnp.float32))
        if key.unary_kind:
            out = _UNARY_FNS[key.unary_kind](out)
        return out.astype(out_dtype)

    return fn


def _build_conv_nhwc_fullrow(key, interpret: bool):
    """NHWC conv-BRGEMM, fullrow strategy: per tap (rr,ss) ONE MXU pass over
    full 8-aligned rows — A_rr = I[g, rr:rr+P, :, :] reshaped (P*Wp, c) is a
    layout-preserving (free) reshape because the input width is padded to a
    sublane multiple OUTSIDE the kernel (an HBM-side pad, one cheap XLA op).
    The S column shifts that make windowed convs relayout-bound are deferred
    into S per-column accumulators combined ONCE per program:

        acc[ss][p, w] += sum_rr (I[p+rr, :] @ W[rr, ss])[w]
        out[p, q]      = sum_ss acc[ss][p, q+ss]

    so each (tap, channel-block) step is pure MXU work; the S-1 shifted adds
    happen once per output tile instead of once per tap per channel block
    (S*Cb times fewer Mosaic relayouts than the window strategy — the
    difference between 26% and ~2x that on v5e, see PERF.md)."""
    from .flags import ConvNhwcKey
    assert isinstance(key, ConvNhwcKey)
    N, H, W, C, K = key.N, key.H, key.W, key.C, key.K
    R, S = key.R, key.S
    P, Q = key.P, key.Q
    dtype = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    mxu_dt = _mxu_input_dtype(key.dtype, interpret, key.precision)
    # pad width so (P, Wp) merges are layout-preserving for the MXU dtype
    sub = 16 if jnp.dtype(mxu_dt).itemsize == 2 else 8
    Wp = W if W % sub == 0 else W + (sub - W % sub)
    G, cblk, kblk = _conv_nhwc_blocks(key)
    if not key.G:
        G = 1 if P * Wp >= 512 else (2 if N % 2 == 0 else 1)
    Cb, Kb = C // cblk, K // kblk
    has_c = not key.beta0
    has_d = key.binary_kind is not None
    full_d = has_d and key.binary_bcast == "none"
    rows = G * P * Wp

    grid = (N // G, Kb, Cb)
    in_specs = [
        pl.BlockSpec((G, H, Wp, cblk), lambda n_, kb, r: (n_, 0, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, S, cblk, kblk), lambda n_, kb, r: (0, 0, r, kb),
                     memory_space=pltpu.VMEM),
    ]
    if has_c:
        in_specs.append(pl.BlockSpec((G, P, Wp, kblk),
                                     lambda n_, kb, r: (n_, 0, 0, kb),
                                     memory_space=pltpu.VMEM))
    if has_d:
        if full_d:
            in_specs.append(pl.BlockSpec((G, P, Wp, kblk),
                                         lambda n_, kb, r: (n_, 0, 0, kb),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec((1, kblk),
                                         lambda n_, kb, r: (0, kb),
                                         memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((G, P, Wp, kblk),
                            lambda n_, kb, r: (n_, 0, 0, kb),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        idx = 0
        i_ref = refs[idx]; idx += 1
        w_ref = refs[idx]; idx += 1
        c_ref = refs[idx] if has_c else None
        idx += has_c
        d_ref = refs[idx] if has_d else None
        idx += has_d
        o_ref = refs[idx]
        acc_ref = refs[idx + 1]          # (S, rows + 8, kblk) f32

        r = pl.program_id(2)

        @pl.when(r == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for rr in range(R):
            if G == 1:
                a_rr = i_ref[0, rr:rr + P, :, :].reshape(P * Wp, cblk)
            else:
                a_rr = jnp.concatenate(
                    [i_ref[g, rr:rr + P, :, :].reshape(P * Wp, cblk)
                     for g in range(G)], axis=0)
            for ss in range(S):
                acc_ref[ss, :rows, :] += jnp.dot(
                    a_rr, w_ref[rr, ss],
                    preferred_element_type=jnp.float32)

        @pl.when(r == Cb - 1)
        def _finish():
            res = acc_ref[0, 0:rows, :]
            for ss in range(1, S):
                res = res + acc_ref[ss, ss:ss + rows, :]
            if has_c:
                res = res + c_ref[:].reshape(rows, kblk).astype(jnp.float32)
            if has_d:
                d_blk = (d_ref[:].reshape(rows, kblk) if full_d
                         else d_ref[:])
                res = _apply_epilogue(res, d_blk, key.binary_kind, None)
            if key.unary_kind:
                res = _UNARY_FNS[key.unary_kind](res)
            o_ref[:] = res.reshape(G, P, Wp, kblk).astype(out_dtype)

    dsize = jnp.dtype(dtype).itemsize
    cost = pl.CostEstimate(
        flops=2 * N * P * Wp * C * K * R * S,
        bytes_accessed=(N * H * Wp * C + R * S * C * K
                        + N * P * Wp * K) * dsize,
        transcendentals=0)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((N, P, Wp, K), out_dtype),
        scratch_shapes=[pltpu.VMEM((S, rows + 8, kblk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )

    def pad_w(x):
        if Wp == x.shape[2]:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, Wp - x.shape[2]), (0, 0)))

    def fn(i, w, cacc=None, d=None):
        args = [pad_w(i.astype(mxu_dt)), w.astype(mxu_dt)]
        if has_c:
            args.append(pad_w(cacc))
        if has_d:
            args.append(pad_w(d) if full_d else d.reshape(1, -1))
        out = call(*args)
        return out[:, :, :Q, :] if Wp != Q else out

    return fn


def _build_layer_norm(key, interpret: bool):
    """One-pass LayerNorm: grid over row blocks; per program load (bm, E),
    compute mean/var on the VPU in f32, normalize, apply gamma/beta from
    constant-index (resident) blocks, write once. Statistics use the
    biased variance like torch."""
    from .flags import LayerNormKey
    assert isinstance(key, LayerNormKey)
    M, E = key.m, key.n
    dt = _jdt(key.dtype)
    out_dtype = _jdt(key.out_dtype or key.dtype)
    sub, _ = current_target().min_tile(key.dtype)
    dsz = jnp.dtype(dt).itemsize
    budget = current_target().vmem_bytes // 2
    bm = _divisor_block(M, max(sub, budget // max(1, (2 * dsz + 8) * E)),
                        sub)
    grid = (pl.cdiv(M, bm),)
    in_specs = [pl.BlockSpec((bm, E), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if key.affine:
        in_specs += [pl.BlockSpec((1, E), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    out_spec = pl.BlockSpec((bm, E), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        x = refs[0][:].astype(jnp.float32)
        o_ref = refs[3 if key.affine else 1]
        mean = jnp.mean(x, axis=-1, keepdims=True)
        d = x - mean
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        y = d * jax.lax.rsqrt(var + key.eps)
        if key.affine:
            y = y * refs[1][:].astype(jnp.float32) \
                + refs[2][:].astype(jnp.float32)
        o_ref[:] = y.astype(out_dtype)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((M, E), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=8 * M * E, bytes_accessed=2 * M * E * dsz,
            transcendentals=M),
        interpret=interpret,
    )

    def fn(x, gamma=None, beta=None):
        if key.affine:
            return call(x, gamma.reshape(1, E), beta.reshape(1, E))
        return call(x)

    return fn


def _build_unary(key: UnaryKey, interpret: bool):
    out_dtype = _jdt(key.out_dtype or key.dtype)
    kind = key.kind
    if kind == "zero":
        shape = key.out_shape or key.shape
        return lambda x=None: jnp.zeros(shape, out_dtype)
    if kind == "identity":
        out_shape = key.out_shape or key.shape

        def identity(x):
            return jnp.broadcast_to(x, out_shape).astype(out_dtype)
        return identity
    if kind == "transpose":
        perm = key.perm or tuple(reversed(range(len(key.shape))))
        return lambda x: jnp.transpose(x, perm).astype(out_dtype)
    if kind in ("vnni2", "vnni"):
        vf = key.vnni

        def vnni_pack(x):
            # [..., K, N] -> [..., K/vf, N, vf] on any rank
            *lead, kdim, ndim = x.shape
            x = x.reshape(*lead, kdim // vf, vf, ndim)
            return jnp.moveaxis(x, -2, -1)
        return vnni_pack
    fn = _UNARY_FNS[kind]
    return lambda x: fn(x.astype(jnp.float32)).astype(out_dtype)


def _build_binary(key: BinaryKey, interpret: bool):
    fn = _BINARY_FNS[key.kind]
    out_dtype = _jdt(key.out_dtype or key.dtype)

    def prep(x, bcast):
        # bcast_row: the operand indexes the major dim — make the minor
        # axis explicit so NumPy broadcasting matches the indexing map
        if bcast == "bcast_row" and x.ndim == 1:
            return x.reshape(-1, 1)
        return x

    return lambda a, b: fn(prep(a, key.bcast_a).astype(jnp.float32),
                           prep(b, key.bcast_b).astype(jnp.float32)
                           ).astype(out_dtype)


def _force_highest(fn):
    """precision='highest' wrapper: Mosaic runs f32xf32 dots as SINGLE
    bf16-class MXU passes by default (measured r4: the 'highest' chain
    benched 190 TF — the bf16 rate — with f32 operands; true 3-pass f32
    is ~66 TF on v5e). The ambient matmul-precision config applies at
    TRACE time, which happens on the wrapped call — one choke point
    instead of threading precision= through every in-kernel dot."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped


def _is_f16(key) -> bool:
    return "f16" in (getattr(key, "dtype", None),
                     getattr(key, "out_dtype", None))


def build_kernel(key, interpret: bool | None = None):
    if interpret is None:
        interpret = interpret_default()
    if not interpret and _is_f16(key):
        # Mosaic has NO f16 type (measured r6 on v5e: "Unsupported type
        # in mosaic dialect: 'f16'") — the compiled path delegates f16
        # kernels to the straight-line jnp semantics (raw XLA, which
        # handles f16 natively), the same measured-delegation stance as
        # the conv and D<128-attention paths. Interpret mode still
        # exercises the Pallas kernel bodies (tests/xsmm f16 rows).
        from .reference import reference_kernel
        return reference_kernel(key)
    if getattr(key, "precision", "default") == "highest":
        return _force_highest(_build_dispatch(key, interpret))
    return _build_dispatch(key, interpret)


def _build_dispatch(key, interpret: bool):
    if isinstance(key, BrgemmKey):
        return _build_brgemm(key, interpret)
    if isinstance(key, BlockedMatmulKey):
        return _build_blocked_matmul(key, interpret)
    if isinstance(key, ConvBrgemmKey):
        return _build_conv_brgemm(key, interpret)
    from .flags import (BatchMatmulKey, ChainKey, ConvNhwcKey, FlashMhaKey,
                        GroupedGemmKey)
    if isinstance(key, ConvNhwcKey):
        return _build_conv_nhwc(key, interpret)
    if isinstance(key, GroupedGemmKey):
        return _build_grouped_gemm(key, interpret)
    from .flags import GroupedWgradKey
    if isinstance(key, GroupedWgradKey):
        return _build_grouped_wgrad(key, interpret)
    from .flags import Int8GemmKey
    if isinstance(key, Int8GemmKey):
        return _build_int8_gemm(key, interpret)
    if isinstance(key, ChainKey):
        return _build_chain(key, interpret)
    if isinstance(key, BatchMatmulKey):
        return _build_batch_matmul(key, interpret)
    if isinstance(key, FlashMhaKey):
        return _build_flash_mha(key, interpret)
    if isinstance(key, UnaryKey):
        return _build_unary(key, interpret)
    if isinstance(key, BinaryKey):
        return _build_binary(key, interpret)
    from .flags import LayerNormKey
    if isinstance(key, LayerNormKey):
        return _build_layer_norm(key, interpret)
    from .decode_attn import DecodeAttnKey, build_decode_attn
    if isinstance(key, DecodeAttnKey):
        return build_decode_attn(key, interpret)
    raise TypeError(f"unknown kernel key {key!r}")
