"""Test configuration.

All unit/integration tests run on CPU with 8 virtual devices so that
sharding tests exercise a real multi-device mesh without TPU hardware
(mirrors the reference's capability-gated lit suites, test/lit.cfg.py).
Benchmarks (bench.py, benchmarks/driver.py) run on the real TPU chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
