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


def enable_compilation_cache(path=None):
    """Turn on JAX's persistent compilation cache for this process.

    The deeply-unrolled Pallas kernels cost minutes of Mosaic compilation
    on a cold process; the persistent cache makes that a one-time cost per
    machine instead of per process.  Every CLI driver and the benchmark
    call this at startup; library users opt in explicitly (a library must
    not write to disk on import).

    path defaults to $GRTRACE_COMPILE_CACHE or ~/.cache/grtrace-jax.
    Safe to call repeatedly; failures (read-only filesystem, old jax) are
    silently ignored — the cache is an optimization, never a requirement.
    """
    import os
    if path is None:
        path = os.environ.get(
            "GRTRACE_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "grtrace-jax"))
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
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
