"""Dispatch/invoke kernel cache.

Mirrors the reference's dispatch/invoke split (SURVEY.md 2.5): `dispatch(key)`
builds (and memoizes) a kernel for the key — the libxsmm JIT-and-cache step —
and returns a callable; invoking it executes the Pallas kernel. The cache key
contains everything that affects generated code (shapes, dtypes, layout,
fusion flags, block overrides); reusing a kernel across calls with matching
keys is exactly the reference's libxsmm in-process cache behavior, and
mis-keyed reuse is impossible because keys are total over the build inputs
(the hazard VerifyXsmmCalls guards in the reference,
lib/TPP/Dialect/Xsmm/XsmmVerify.cpp).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

from .flags import BinaryKey, BlockedMatmulKey, BrgemmKey, UnaryKey
from .kernels import build_kernel


@dataclass
class CacheStats:
    hits: int = 0
    misses: int = 0


class KernelCache:
    def __init__(self):
        self._lock = threading.Lock()
        self._kernels: dict = {}
        self.stats = CacheStats()
        # per-dispatched-kernel artifact capture (jaxpr + StableHLO incl.
        # the Mosaic custom-call payload) — the role of the reference's
        # -print-mlir=llvm kernel-artifact staging (DefaultPipeline.cpp:33-36)
        self.capture_artifacts = False
        self.artifacts: dict = {}
        # per-kernel call-shape capture (ShapeDtypeStructs of the first
        # invocation's args) — feeds per-kernel decomposition benches
        # (scripts/exp_vit.py): replay any program's kernels in isolation
        self.capture_calls = False
        self.calls: dict = {}

    def dispatch(self, key, interpret: bool | None = None):
        """interpret: None = interpret_default() heuristic, False = force
        Mosaic-compiled, True = force Pallas interpret, "reference" =
        straight-line jnp semantics (xsmm/reference.py) — no Pallas at
        all: the fast executor mode for pipeline-level differential
        fuzzing, where the kernels' own numerics are out of scope."""
        cache_key = (key, interpret)
        with self._lock:
            fn = self._kernels.get(cache_key)
            if fn is not None:
                self.stats.hits += 1
                return fn
            self.stats.misses += 1
        try:
            if interpret == "reference":
                from .reference import reference_kernel
                fn = reference_kernel(key)
            else:
                fn = build_kernel(key, interpret)
        except Exception as e:
            # dispatch-failure reporting with the full key, the role of the
            # reference runtime's shape-dump on dispatch failure
            # (XsmmRunnerUtils.cpp:132-137) — minus the exit(-1)
            raise type(e)(f"kernel dispatch failed for {key!r}: {e}") from e
        if self.capture_calls:
            fn = self._call_capturing(cache_key, fn)
        if self.capture_artifacts:
            # artifact key mirrors the kernel cache key: the
            # interpret and compiled variants of one kernel key
            # are different programs (interpret keeps f32)
            fn = self._capturing(cache_key, fn)
        with self._lock:
            return self._kernels.setdefault(cache_key, fn)

    def _call_capturing(self, key, fn):
        """Record the first invocation's arg shapes/dtypes (aval-only, so
        safe under an outer jit trace) and bump a call counter."""
        def wrapped(*args, **kwargs):
            import jax
            rec = self.calls.get(key)
            if rec is None:
                specs = tuple(
                    None if a is None else
                    jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args)
                self.calls[key] = {"specs": specs, "count": 1,
                                   "kwargs": sorted(kwargs)}
            else:
                rec["count"] += 1
            return fn(*args, **kwargs)
        return wrapped

    def _capturing(self, key, fn):
        """Wrap a kernel so its first invocation records jaxpr + StableHLO
        (shape-specialized exactly as dispatched; safe under an outer jit
        trace because only avals are read)."""
        def wrapped(*args, **kwargs):
            if key not in self.artifacts:
                import jax
                try:
                    specs = jax.tree_util.tree_map(
                        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                        args)
                    self.artifacts[key] = {
                        "jaxpr": str(jax.make_jaxpr(
                            lambda *xs: fn(*xs, **kwargs))(*specs)),
                        "stablehlo": jax.jit(
                            lambda *xs: fn(*xs, **kwargs)
                        ).lower(*specs).as_text(),
                    }
                except Exception as e:   # never break execution for a dump
                    self.artifacts[key] = {"error": f"{type(e).__name__}: {e}"}
            return fn(*args, **kwargs)
        return wrapped

    def clear(self):
        with self._lock:
            self._kernels.clear()
            self.stats = CacheStats()
            self.artifacts = {}
            self.calls = {}

    def __len__(self):
        return len(self._kernels)


_GLOBAL = KernelCache()


def global_cache() -> KernelCache:
    return _GLOBAL


# -- C-ABI-shaped convenience wrappers (runtime/Xsmm/XsmmRunnerUtils.cpp) ----

def gemm_dispatch(m, n, k, dtype="f32", beta0=False, transpose_b=False,
                  interpret=None, **kw):
    key = BrgemmKey(batch=1, m=m, n=n, k=k, dtype=dtype, beta0=beta0,
                    transpose_b=transpose_b, **kw)
    fn = _GLOBAL.dispatch(key, interpret)

    def gemm(a, b, c=None):
        # transpose_b is handled INSIDE the kernel (key.transpose_b)
        return fn(a[None], b[None], c)
    return gemm


def brgemm_dispatch(batch, m, n, k, dtype="f32", beta0=False, vnni=0,
                    interpret=None, **kw):
    key = BrgemmKey(batch=batch, m=m, n=n, k=k, dtype=dtype, beta0=beta0,
                    vnni=vnni, **kw)
    return _GLOBAL.dispatch(key, interpret)


def fused_brgemm_dispatch(batch, m, n, k, dtype="f32", beta0=False, vnni=0,
                          binary_kind="add", binary_bcast="bcast_col",
                          unary_kind="relu", interpret=None, **kw):
    key = BrgemmKey(batch=batch, m=m, n=n, k=k, dtype=dtype, beta0=beta0,
                    vnni=vnni, binary_kind=binary_kind,
                    binary_bcast=binary_bcast, unary_kind=unary_kind, **kw)
    return _GLOBAL.dispatch(key, interpret)


def blocked_matmul_dispatch(key: BlockedMatmulKey, interpret=None):
    return _GLOBAL.dispatch(key, interpret)


def unary_dispatch(kind, shape, dtype="f32", interpret=None, **kw):
    return _GLOBAL.dispatch(UnaryKey(kind=kind, shape=tuple(shape),
                                     dtype=dtype, **kw), interpret)


def binary_dispatch(kind, shape_a, shape_b, dtype="f32", interpret=None, **kw):
    return _GLOBAL.dispatch(BinaryKey(kind=kind, shape_a=tuple(shape_a),
                                      shape_b=tuple(shape_b), dtype=dtype,
                                      **kw), interpret)
