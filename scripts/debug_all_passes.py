#!/usr/bin/env python
"""Per-pass IR dump + diff workflow (reference scripts/debug/debug_all_passes.sh:
run with --mlir-print-ir-after-all, split per-pass IR into NNN.mlir files,
diff consecutive stages).

  python scripts/debug_all_passes.py model.ir -o /tmp/stages [-p pipeline]
  python scripts/debug_all_passes.py model.ir --diff
"""

from __future__ import annotations

import argparse
import difflib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpp_mlir_tpu.ir import parse_module, print_module  # noqa: E402
from tpp_mlir_tpu.passes import PassManager, expand_pipeline  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", nargs="?", default="-")
    p.add_argument("-p", "--pipeline", default="default-tpp-passes")
    p.add_argument("-o", "--outdir", default="")
    p.add_argument("--diff", action="store_true",
                   help="print unified diffs between consecutive stages")
    args = p.parse_args(argv)

    text = sys.stdin.read() if args.input == "-" else open(args.input).read()
    module = parse_module(text)
    module.verify()

    stages: list[tuple[str, str]] = [("input", print_module(module))]
    for ps in expand_pipeline(args.pipeline):
        ps.run(module)
        module.verify()
        stages.append((ps.name, print_module(module)))

    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
        for i, (name, ir) in enumerate(stages):
            path = os.path.join(args.outdir, f"{i:03d}-{name}.ir")
            open(path, "w").write(ir)
        print(f"wrote {len(stages)} stages to {args.outdir}")

    if args.diff:
        for (n1, s1), (n2, s2) in zip(stages, stages[1:]):
            if s1 == s2:
                continue
            print(f"===== {n1} -> {n2} =====")
            for line in difflib.unified_diff(s1.splitlines(), s2.splitlines(),
                                             lineterm="", n=1):
                print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
