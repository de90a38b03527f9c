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

# Persistent compile cache: NOT enabled for the suite by default.  CPU
# executables are served from it and repeat runs would skip most XLA
# compilation, but XLA:CPU executable (de)serialization has segfaulted
# long-lived processes in both directions (foreign-host loads SIGILL;
# executable.serialize() crashed a full-suite run after a few hundred
# compiles) and a native crash cannot be caught — a correctness gate must
# never be killable by an optimization.  Opt in for fast local reruns:
#
#     GRTRACE_COMPILE_CACHE=~/.cache/grtrace-jax pytest tests -q
#
# (grtrace.enable_compilation_cache honors the env var and salts the
# directory per machine/toolchain so entries never cross hosts.)
import grtrace  # noqa: E402

grtrace.enable_compilation_cache()  # no-op on CPU unless env opt-in

# Asset resolution is env-driven (io.artifacts.resolve_background); this
# build environment mounts the reference repo's panoramas at /root/reference.
os.environ.setdefault("GRTRACE_ASSET_PATH", "/root/reference")

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers.  The default gate (`pytest tests -q`) deselects tests marked
# `slow` — the long interpret-mode kernel runs, property-fuzz sweeps and big
# sharded grids — so it finishes in minutes and actually gets run.  The full
# suite remains one flag away:
#
#     pytest tests --runslow          # everything
#     pytest tests -m slow            # only the slow tier
#     pytest tests -n 8 --runslow     # full suite, parallel (pytest-xdist)
#
# Tier assignment lives next to the tests (pytestmark / @pytest.mark.slow),
# chosen from measured --durations on an 8-vCPU box: everything over ~20 s
# single-process is slow-tier unless it is the only coverage of a
# correctness contract (those stay in the gate regardless of cost).
# ---------------------------------------------------------------------------


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (deselected by default)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or config.getoption("-m"):
        return  # explicit marker expressions override the default tiering
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
