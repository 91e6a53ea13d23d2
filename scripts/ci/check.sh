#!/usr/bin/env bash
# CI entry point (role of reference scripts/ci/*.sh + the check-tpp target):
# build the native runtime, run the full test suite, smoke the tools.
set -euo pipefail
cd "$(dirname "$0")/../.."
make -C tpp_mlir_tpu/native
python -m pytest tests/ -q -m "slow or not slow"
python -m tpp_mlir_tpu.tools.mlir_gen --batch=8 --layers=16,16 --bias --relu | \
    python -m tpp_mlir_tpu.tools.tpp_opt - --default-tpp-passes > /dev/null
echo "CI OK"
