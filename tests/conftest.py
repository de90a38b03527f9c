"""Test harness config: CPU backend with 8 virtual devices + float64.

Multi-chip sharding tests run against a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver dry-runs the
multi-chip path.  float64 is enabled so oracle comparisons are meaningful.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
