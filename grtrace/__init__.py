"""grtrace — TPU-native Schwarzschild black-hole inverse ray tracer.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ryanchen2134/schwarzchild-einsteinpy-raytracing (reference mounted read-only
at /root/reference): FANTASY order-2 symplectic null-geodesic integration,
pinhole-camera inverse ray tracing of the black-hole shadow / photon ring /
lensed sky, flat-space reference rendering, scene diagnostics, and
multi-chip sharding over jax.sharding meshes.
"""
from .io.scene import (BlackHole, IntegratorConfig, Observer, PatchConfig,
                       Photon, SceneConfig, apply_relative_offsets)
from .engine.render import RenderResult, render, render_pixels
from .engine.integrate import SchwarzschildIntegrator
from .engine.disk import DiskConfig, render_disk

__version__ = "0.4.0"


def _cache_fingerprint():
    """Machine/toolchain fingerprint for the persistent compile cache.

    XLA:CPU writes ahead-of-time executables specialized to the build
    host's CPU features; loading one on a machine with different features
    is undefined behavior (XLA logs "machine type ... doesn't match ...
    could lead to SIGILL" and can crash the process outright).  JAX's
    cache key does NOT include the CPU feature set, so a cache directory
    shared between machines (network home dirs, container images, copied
    ~/.cache) can serve foreign executables.  Salting the directory with
    a (jaxlib version, arch, CPU-feature) digest confines every machine
    to entries it compiled itself — the cache stays an optimization that
    can never take the process down.
    """
    import hashlib
    import platform

    parts = [platform.machine(), platform.system()]
    try:
        import jaxlib
        parts.append(getattr(jaxlib, "__version__", "?"))
    except Exception:
        parts.append("nojaxlib")
    try:  # CPU feature flags (linux); absence just coarsens the salt
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1]
                                                 .split())))
                    break
    except OSError:
        parts.append(platform.processor() or "unknown-cpu")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _configured_platform():
    """Best-effort JAX platform name WITHOUT initializing any backend.

    jax.default_backend() initializes the backends as a side effect, which
    silently freezes jax_platforms / jax_num_cpu_devices for the rest of
    the process — a library must never do that at import time (CLI drivers
    set jax_platforms *after* importing grtrace.cli).  Order of preference:

    1. the already-initialized backend (xla_bridge's cache), if any —
       reading it is free and exact;
    2. the jax_platforms config / JAX_PLATFORMS env (first entry);
    3. None — unknowable without initializing; caller decides.
    """
    import os

    try:
        import jax
        from jax._src import xla_bridge
        if getattr(xla_bridge, "_backends", None):
            return jax.default_backend()
        plats = getattr(jax.config, "jax_platforms", None) \
            or os.environ.get("JAX_PLATFORMS", "")
        if plats:
            return plats.split(",")[0].strip().lower()
    except Exception:
        pass
    return None


def enable_compilation_cache(path=None, allow_backend_init=False):
    """Turn on JAX's persistent compilation cache for this process.

    The deeply-unrolled Pallas kernels cost minutes of Mosaic compilation
    on a cold process; the persistent cache makes that a one-time cost per
    machine instead of per process.  Every CLI driver and the benchmark
    call this at startup; library users opt in explicitly (a library must
    not write to disk on import).

    path defaults to $GRTRACE_COMPILE_CACHE or ~/.cache/grtrace-jax.
    Entries live in a per-machine subdirectory keyed by a CPU/toolchain
    fingerprint (_cache_fingerprint), so a cache written on one host is
    never loaded on another — XLA:CPU AOT executables are machine-coded
    and loading a foreign one can SIGILL/segfault the process.
    Safe to call repeatedly; failures (read-only filesystem, old jax) are
    silently ignored — the cache is an optimization, never a requirement.
    The call NEVER initializes a JAX backend unless allow_backend_init=True:
    when the platform cannot be determined without initialization (backends
    not yet up, jax_platforms/JAX_PLATFORMS unset) it simply defers — CLI
    driver main()s re-call with allow_backend_init=True after making their
    own platform decision (see grtrace/cli/__init__.py).

    On the CPU backend the cache is OPT-IN (set $GRTRACE_COMPILE_CACHE):
    XLA:CPU AOT executable (de)serialization has crashed the process in
    both directions — loading a foreign-host entry SIGILLs (XLA logs
    "machine type ... doesn't match" first), and executable.serialize()
    itself segfaulted inside a long-lived process that had compiled a few
    hundred CPU programs (observed at jax compilation_cache.py:265 during
    a full-suite run; not reproducible in a fresh process).  A segfault in
    native code cannot be caught from Python, so the only way the cache
    can never take a CPU process down is to not touch it unless the user
    explicitly asked.  Accelerator (TPU) executables serialize through a
    separate, proven path and keep the cache by default — that is where
    the minutes-long Mosaic compiles live anyway.
    """
    import os
    # An empty env value is "unset", not "opt in with path ''" (which would
    # create a bare fingerprint dir relative to the cwd).
    explicit = path is not None or bool(os.environ.get("GRTRACE_COMPILE_CACHE"))
    if path is None:
        path = os.environ.get("GRTRACE_COMPILE_CACHE") or \
            os.path.join(os.path.expanduser("~"), ".cache", "grtrace-jax")
    try:
        import jax
        if not explicit:
            plat = _configured_platform()
            if plat is None:
                # Unknowable without initializing a backend — which would
                # freeze jax_platforms for the process.  allow_backend_init
                # is passed by CLI driver main()s *after* their platform
                # decision (initializing there is harmless: they are about
                # to jit anyway); the import-time call defers instead.
                if not allow_backend_init:
                    return
                plat = jax.default_backend()
            if plat == "cpu":
                # Authoritative: a CPU driver calling after its
                # jax_platforms decision must also UNDO a cache enabled by
                # the import-time call on a host whose config named an
                # accelerator first (e.g. jax_platforms='axon,cpu').
                if jax.config.jax_compilation_cache_dir is not None:
                    jax.config.update("jax_compilation_cache_dir", None)
                return
        path = os.path.join(str(path), _cache_fingerprint())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes >1 s to compile, however small
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


__all__ = [
    "BlackHole", "Observer", "Photon", "PatchConfig", "IntegratorConfig",
    "SceneConfig", "apply_relative_offsets", "RenderResult", "render",
    "render_pixels", "SchwarzschildIntegrator", "DiskConfig", "render_disk",
    "enable_compilation_cache", "__version__",
]
