"""Benchmark timing — the perf dialect / MLIRBench timing-loop equivalent.

The reference wraps the kernel in `perf.bench` (a timed scf.for loop, mean =
deltas/iters; reference lib/TPP/Runner/MLIRBench.cpp:265-295). On TPU,
dispatch is asynchronous and (under the axon tunnel) a host round trip can
cost tens of milliseconds, so wall-timing individual calls measures the
tunnel, not the kernel. Instead the timed loop runs ON DEVICE as a
lax.scan over the compiled step (output fed back as input so iterations are
sequentially dependent, like the reference's iter_args), and the per-iteration
time is the slope between two loop lengths — fixed host/dispatch overhead
cancels exactly.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Sequence


@dataclass
class BenchResult:
    mean_seconds: float       # per-iteration device time (slope method)
    total_seconds: float      # wall time of the long run
    iters: int
    flops: int | None = None
    finals: tuple | None = None  # carried args after the long run's iters

    @property
    def gflops(self) -> float | None:
        if not self.flops:
            return None
        return self.flops / self.mean_seconds / 1e9


def _chain(step: Callable, n: int):
    """Build jit(fn) running `step` n times with a sequential dependency.

    If `step` came from executor.compile with hoisted literal constants
    (weights passed as trailing arguments so they don't embed in the HLO),
    those literals are threaded through the outer jit as arguments too —
    loop-invariant, so XLA LICM keeps their derived casts out of the scan
    body — instead of being re-captured as closure constants."""
    import jax
    import jax.numpy as jnp

    lits = tuple(getattr(step, "hoisted_literals", ()))
    inner = getattr(step, "raw_fn", step)

    def loop(*all_args):
        args, ls = (all_args[:len(all_args) - len(lits)],
                    all_args[len(all_args) - len(lits):])

        def step_fn(*a):
            return inner(*a, *ls)

        def body(carry, _):
            out = step_fn(*carry)
            outs = out if isinstance(out, tuple) else (out,)
            # feed outputs back into the matching leading args (same
            # shape/dtype) so iterations are sequentially dependent
            new_args = list(carry)
            fed_back = False
            taken = set()   # one slot per output: two same-shaped
            # outputs must not collapse into the same carry slot (the
            # second overwrote the first, whose producer XLA then DCE'd
            # out of the scan -> inflated rates)
            for o in outs:
                for i, a in enumerate(new_args):
                    if i not in taken and a.shape == o.shape \
                            and a.dtype == o.dtype:
                        new_args[i] = o
                        taken.add(i)
                        fed_back = True
                        break
            if not fed_back:
                # no output matches an input: poison one element of the
                # SMALLEST arg with a value derived from EVERY output
                # element. Two failure modes were measured before landing
                # here (both read as impossibly-fast XLA ops):
                #   * an output-derived zero (sum(out)*0.0) is folded by
                #     XLA algebraic simplification -> op hoisted;
                #   * a single-element value (out[0]) lets XLA DCE slice
                #     the op down to computing one element per iteration.
                # sum(out) forces the full computation; tanh bounds the
                # iterated values (numeric drift is irrelevant to timing).
                pi = min(range(len(new_args)),
                         key=lambda i: new_args[i].size)
                eps = jnp.tanh(jnp.sum(outs[0].astype(jnp.float32))) \
                    .astype(new_args[pi].dtype)
                idx = (0,) * new_args[pi].ndim
                new_args[pi] = new_args[pi].at[idx].set(eps)
            return tuple(new_args), None
        final, _ = jax.lax.scan(body, tuple(args), None, length=n)
        return final

    jitted = jax.jit(loop)
    if not lits:
        return jitted
    return lambda *args: jitted(*args, *lits)


def bench(step: Callable, args: Sequence, iters: int = 100,
          warmup: int = 2, flops: int | None = None,
          min_delta: float = 0.05, max_iters: int = 50_000) -> BenchResult:
    """Time `step(*args)` per-iteration using the two-length slope method.

    The loop length escalates until the long-vs-short wall-time difference
    exceeds `min_delta` seconds, so the slope is well above host/tunnel
    jitter even for microsecond kernels. Each length is timed min-of-N
    (the reference's warmup/mean discipline, MLIRBench.cpp:265-295, adapted
    to an async remote device).
    """
    import jax
    import jax.numpy as jnp

    def _force(r):
        # Completion barrier. Measured on the axon tunnel (r3):
        # jax.block_until_ready returned in 0.1 ms on a 256-step matmul
        # scan whose real device time was ~7 ms — it does NOT reliably
        # block. A scalar device->host read derived from the result
        # cannot return early. The extra sum+transfer is fixed overhead
        # that cancels in the two-length slope.
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))

    def timed(fn):
        # median (not min) of the reps: tunnel outliers are two-sided
        # (impossibly-fast single timings measured r3/r4)
        import statistics
        ts = []
        last = None
        for _ in range(max(2, warmup)):
            t0 = time.perf_counter()
            r = fn(*args)
            _force(r)
            ts.append(time.perf_counter() - t0)
            last = r
        return statistics.median(ts), last

    n_short = max(1, iters // 4)
    short = _chain(step, n_short)
    _force(short(*args))  # compile, excluded
    t_short, _ = timed(short)

    n_long = max(iters, n_short * 4)
    while True:
        long_ = _chain(step, n_long)
        _force(long_(*args))
        t_long, finals = timed(long_)
        if t_long - t_short >= min_delta or n_long >= max_iters:
            break
        n_long = min(n_long * 8, max_iters)

    # A transient tunnel stall in the SHORT point deflates every slope
    # computed from it (measured r4: warm fc rows at 210% of the compute
    # roof — the short timing is taken once and reused across all
    # escalations). Re-measure it after the long length settles and keep
    # the faster: stalls only ever inflate a wall timing.
    t_short2, _ = timed(short)
    t_short = min(t_short, t_short2)
    per_iter = max((t_long - t_short) / (n_long - n_short), 1e-12)
    return BenchResult(mean_seconds=per_iter, total_seconds=t_long,
                       iters=n_long, flops=flops, finals=finals)


def bench_warm(key, operands, r1: int = 200, r2: int = 4000,
               reps: int = 3, min_delta: float = 0.05,
               max_repeats: int = 500_000) -> float:
    """Per-iteration seconds of a ChainKey kernel using the in-kernel
    perf.bench region: two repeat counts, slope method. Weights stay warm in
    VMEM across iterations — the reference's hot-kernel timed loop. The long
    count escalates until the slope signal clears host/tunnel jitter."""
    import dataclasses
    import time as _time

    import jax
    import jax.numpy as jnp

    from ..xsmm.kernels import build_kernel

    def timed(repeats):
        fn = build_kernel(dataclasses.replace(key, repeats=repeats))
        float(jnp.sum(fn(*operands).astype(jnp.float32)))  # compile, excluded
        # MEDIAN, not min: tunnel outliers go BOTH ways (impossibly-fast
        # single timings were measured r3/r4 — min-of-reps bias produced
        # the r3 '111.9% of roofline' row); the median is robust to
        # two-sided noise
        import statistics
        ts = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            float(jnp.sum(fn(*operands).astype(jnp.float32)))
            ts.append(_time.perf_counter() - t0)
        return statistics.median(ts)

    t1 = timed(r1)
    while True:
        t2 = timed(r2)
        if t2 - t1 >= min_delta or r2 >= max_repeats:
            break
        r2 = min(r2 * 8, max_repeats)
    # re-measure the short point and keep the faster — a stall in the one
    # t1 sample poisons the slope at every escalation (see bench())
    t1 = min(t1, timed(r1))
    return max((t2 - t1) / (r2 - r1), 1e-12)


def model_flops(module) -> int | None:
    """BENCH_TOTAL_FLOPS equivalent: read the generator-recorded flop count
    (reference tools/mlir-gen/MLIRGen.cpp:300-334)."""
    return module.attrs.get("flops")
