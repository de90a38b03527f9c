"""Test harness config: CPU backend with 8 virtual devices + float64.

Multi-chip sharding tests run against a virtual 8-device CPU mesh, mirroring
how the driver dry-runs the multi-chip path.  float64 is enabled so oracle
comparisons are meaningful.

NOTE: in this environment the axon TPU plugin ignores the JAX_PLATFORMS
environment variable, so the platform must be forced through jax.config
*before* any backend is initialized.
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: CPU executables ARE served from it (unlike the
# tunneled-TPU ones), so repeat suite runs skip most XLA compilation —
# which dominates the slowest tests' wall time.
import grtrace  # noqa: E402

grtrace.enable_compilation_cache()

# Asset resolution is env-driven (io.artifacts.resolve_background); this
# build environment mounts the reference repo's panoramas at /root/reference.
os.environ.setdefault("GRTRACE_ASSET_PATH", "/root/reference")
