"""tpp-fpcmp: tolerance-based numeric diff of printed tensor files.

Python CLI over the native C++ core (tpp_mlir_tpu/native/fpcmp.cpp) with a
pure-Python fallback; semantics follow reference tools/fpcmp/fpcmp.c:
compare every float token in two files under -a (absolute) and -r (relative)
tolerances; exit 0 on match, 1 on mismatch (first offending pair reported).
"""

from __future__ import annotations

import argparse
import re
import sys

_FLOAT_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"
                       r"|nan|inf|-inf", re.IGNORECASE)


def extract_floats(text: str) -> list[float]:
    return [float(t) for t in _FLOAT_RE.findall(text)]


def compare_values(a: list[float], b: list[float], abs_tol: float,
                   rel_tol: float) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"token count mismatch: {len(a)} vs {len(b)}"
    try:
        from ..runtime.native import fpcmp_native
        rc, idx = fpcmp_native(a, b, abs_tol, rel_tol)
        if rc == 0:
            return True, ""
        return False, (f"value {idx}: {a[idx]} vs {b[idx]} exceeds "
                       f"tolerances (abs={abs_tol}, rel={rel_tol})")
    except ImportError:
        pass
    for i, (x, y) in enumerate(zip(a, b)):
        if x == y:             # exact match, incl. equal infinities
            continue           # (inf - inf = NaN fails both tolerances)
        if x != x and y != y:  # both NaN
            continue
        d = abs(x - y)
        if d <= abs_tol:
            continue
        denom = max(abs(x), abs(y))
        if denom > 0 and d / denom <= rel_tol:
            continue
        return False, (f"value {i}: {x} vs {y} exceeds tolerances "
                       f"(abs={abs_tol}, rel={rel_tol})")
    return True, ""


def compare_files(f1: str, f2: str, abs_tol: float = 1e-6,
                  rel_tol: float = 1e-4) -> tuple[bool, str]:
    a = extract_floats(open(f1).read())
    b = extract_floats(open(f2).read())
    return compare_values(a, b, abs_tol, rel_tol)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpp-fpcmp", description=__doc__)
    p.add_argument("file1")
    p.add_argument("file2")
    p.add_argument("-a", "--abs-tolerance", type=float, default=1e-6)
    p.add_argument("-r", "--rel-tolerance", type=float, default=1e-4)
    args = p.parse_args(argv)
    ok, msg = compare_files(args.file1, args.file2, args.abs_tolerance,
                            args.rel_tolerance)
    if not ok:
        print(f"fpcmp: {msg}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
