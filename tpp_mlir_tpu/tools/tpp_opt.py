"""tpp-opt: run passes/pipelines on textual IR (the tpp-opt equivalent,
reference tools/tpp-opt). Reads a file or stdin, applies the requested
passes, prints the result.

  tpp-opt model.ir --default-tpp-passes
  tpp-opt model.ir -p pack-matmul,cleanup --print-after
"""

from __future__ import annotations

import argparse
import sys

from ..ir import parse_module, print_module
from ..passes import (PassManager, available_passes,
                      available_pipelines)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpp-opt", description=__doc__)
    p.add_argument("input", nargs="?", default="-")
    p.add_argument("-p", "--passes", default="",
                   help="comma-separated pass/pipeline names")
    p.add_argument("--print-after", action="store_true",
                   help="print IR after each pass (debug_all_passes analogue)")
    p.add_argument("--no-verify", action="store_true")
    p.add_argument("--list", action="store_true",
                   help="list registered passes and pipelines")
    p.add_argument("-o", "--output", default="-")
    # reference-style direct flags: tpp-opt --default-tpp-passes
    args, extra = p.parse_known_args(argv)

    if args.list:
        print("passes:", ", ".join(available_passes()))
        print("pipelines:", ", ".join(available_pipelines()))
        return 0

    names = [x for x in args.passes.split(",") if x]
    for e in extra:
        if e.startswith("--"):
            names.append(e[2:])
        else:
            print(f"unknown argument {e}", file=sys.stderr)
            return 2

    text = sys.stdin.read() if args.input == "-" else open(args.input).read()
    module = parse_module(text)
    module.verify()
    pm = PassManager(names, print_after=args.print_after,
                     verify_each=not args.no_verify)
    pm.run(module)
    out = print_module(module)
    if args.output == "-":
        sys.stdout.write(out)
    else:
        open(args.output, "w").write(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
