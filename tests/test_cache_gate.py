"""Compile-cache gate: platform decisions must survive the cache setup.

Round-4 advisor finding: the gate called jax.default_backend(), which
initializes the JAX backends as a side effect — so grtrace.cli's
import-time cache call froze jax_platforms before CPU drivers
(cli/single_ray.py, cli/images.py, cli/exact.py) could set it, silently
pinning their documented CPU default to the accelerator on TPU hosts.

These tests run in SUBPROCESSES because the fix is precisely about what
happens before backend initialization — the suite's own process has
long since initialized the CPU backend (tests/conftest.py).
"""
import os
import subprocess
import sys

import pytest


def _run(code, env=None):
    e = dict(os.environ)
    e.pop("JAX_PLATFORMS", None)
    e.pop("GRTRACE_COMPILE_CACHE", None)
    if env:
        e.update(env)
    return subprocess.run([sys.executable, "-c", code], env=e,
                          capture_output=True, text=True, timeout=300)


def test_cli_import_does_not_initialize_backend():
    r = _run(
        "import grtrace.cli\n"
        "from jax._src import xla_bridge\n"
        "assert not getattr(xla_bridge, '_backends', None), "
        "'cli import initialized a backend'\n"
        "print('OK')\n")
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_cpu_driver_platform_decision_respected():
    """The exact driver flow the advisor flagged: import grtrace.cli,
    THEN set jax_platforms='cpu', then driver_startup().  The backend
    must come up as cpu and the cache must be off (CPU opt-in)."""
    r = _run(
        "import grtrace.cli\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "grtrace.cli.driver_startup()\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "assert jax.config.jax_compilation_cache_dir is None, "
        "jax.config.jax_compilation_cache_dir\n"
        "print('OK')\n")
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_jax_num_cpu_devices_still_settable_after_cli_import():
    """Setting device counts after backend init raises; the import-time
    cache call must leave that window open (second advisor sub-finding)."""
    r = _run(
        "import grtrace.cli\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 4)\n"
        "assert len(jax.devices()) == 4, jax.devices()\n"
        "print('OK')\n")
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_empty_cache_env_is_unset_not_cwd_optin():
    """GRTRACE_COMPILE_CACHE='' used to opt in with path '' (a bare
    fingerprint dir created under the cwd); it must mean 'unset'."""
    r = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import grtrace\n"
        "grtrace.enable_compilation_cache(allow_backend_init=True)\n"
        "assert jax.config.jax_compilation_cache_dir is None\n"
        "print('OK')\n",
        env={"GRTRACE_COMPILE_CACHE": ""})
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_explicit_cache_path_wins_on_cpu(tmp_path):
    """Explicit opt-in (path argument) still enables the cache on CPU,
    in a machine-fingerprinted subdirectory."""
    r = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import grtrace\n"
        f"grtrace.enable_compilation_cache(path={str(tmp_path)!r})\n"
        "d = jax.config.jax_compilation_cache_dir\n"
        f"assert d and d.startswith({str(tmp_path)!r}) and "
        f"d != {str(tmp_path)!r}, d\n"
        "print('OK')\n")
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
