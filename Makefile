# Build/test/bench entry points (role of the reference's CMake targets:
# check-tpp, benchmarks, benchmarks-omp — CMakeLists.txt:79-140).

PY ?= python

.PHONY: all native check check-fast benchmarks benchmarks-mha benchmarks-conv bench clean

all: native

native:
	$(MAKE) -C tpp_mlir_tpu/native

# full tier (all tests, incl. slow long tail) — CI + before commits
check: native
	$(PY) -m pytest tests/ -q -m "slow or not slow"

# fast tier (= the bare `pytest -q` default via pyproject addopts)
check-fast: native
	$(PY) -m pytest tests/ -q -x

benchmarks:
	$(PY) benchmarks/driver.py -c benchmarks/configs/base.json

benchmarks-matmul:
	$(PY) benchmarks/driver.py -c benchmarks/configs/matmul.json

benchmarks-fc:
	$(PY) benchmarks/driver.py -c benchmarks/configs/fc.json

benchmarks-mha:
	$(PY) benchmarks/driver.py -c benchmarks/configs/mha.json

benchmarks-conv:
	$(PY) benchmarks/driver.py -c benchmarks/configs/conv.json

bench:
	$(PY) bench.py

clean:
	$(MAKE) -C tpp_mlir_tpu/native clean
