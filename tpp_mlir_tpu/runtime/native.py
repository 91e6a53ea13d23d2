"""ctypes bindings for the native runtime (tpp_mlir_tpu/native/tpp_rt.cpp).

Builds lazily via `make -C tpp_mlir_tpu/native` if the shared library is
missing and a toolchain exists; all callers have Python fallbacks, so an
unbuilt library degrades gracefully (matching the reference's optional
OneDNN/Sanitizer components being build-time opt-ins).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtpp_rt.so")


@lru_cache(maxsize=1)
def _load():
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # no toolchain / build failure -> fallback
            raise ImportError(f"native runtime unavailable: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tpp_fpcmp.restype = ctypes.c_int
    lib.tpp_fpcmp.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64)]
    lib.tpp_tensor_init.restype = ctypes.c_int
    lib.tpp_tensor_init.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_uint64, ctypes.c_float]
    lib.tpp_perf_start_timer.restype = ctypes.c_int64
    lib.tpp_perf_stop_timer.restype = ctypes.c_double
    lib.tpp_perf_stop_timer.argtypes = [ctypes.c_int64]
    return lib


def fpcmp_native(a, b, abs_tol: float, rel_tol: float):
    """Returns (rc, fail_index)."""
    import numpy as np

    lib = _load()
    aa = np.ascontiguousarray(a, dtype=np.float64)
    bb = np.ascontiguousarray(b, dtype=np.float64)
    idx = ctypes.c_int64(-1)
    rc = lib.tpp_fpcmp(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(aa), abs_tol, rel_tol, ctypes.byref(idx))
    return rc, idx.value


_KIND_CODES = {"zero": 0, "const": 1, "simple": 2, "cont": 3, "rand": 4,
               "normal": 5}


def tensor_init_native(kind: str, n: int, seed: int = 0, value: float = 1.0):
    import numpy as np

    lib = _load()
    out = np.empty(n, np.float32)
    rc = lib.tpp_tensor_init(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        _KIND_CODES[kind], seed, value)
    if rc != 0:
        raise ValueError(f"native init failed for kind {kind!r}")
    return out


def perf_start_timer() -> int:
    return _load().tpp_perf_start_timer()


def perf_stop_timer(start: int) -> float:
    return _load().tpp_perf_stop_timer(start)
