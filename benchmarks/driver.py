#!/usr/bin/env python
"""Shim: the harness lives in tpp_mlir_tpu.tools.bench_driver (also exposed
as the `tpp-bench` console script). Configs live in benchmarks/configs/."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpp_mlir_tpu.tools.bench_driver import main

if __name__ == "__main__":
    sys.exit(main())
