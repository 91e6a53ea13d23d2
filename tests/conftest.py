"""Test configuration.

All unit/integration tests run on CPU with 8 virtual devices so that
(a) Pallas kernels run in interpret mode (fast, no TPU round trips), and
(b) sharding tests exercise a real multi-device mesh without TPU hardware
(mirrors the reference's capability-gated lit suites, test/lit.cfg.py).
Benchmarks (bench.py, benchmarks/driver.py) run on the real TPU chip.

NOTE: under the axon tunnel, JAX_PLATFORMS is preset to 'axon' and the env
var alone does not switch platforms — jax.config.update is required.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Suite wall time is dominated by XLA:CPU compiles of interpret-mode
# kernels (first exec ~4 s, repeat ~25 ms); numerics are differential
# (vs jnp oracles), so compile-time optimizations buy nothing here.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0"
             " --xla_llvm_disable_expensive_passes=true").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
