"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual 8-device CPU mesh (the
driver separately dry-runs the multi-chip path); benchmarks run on the real
TPU chip via bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
