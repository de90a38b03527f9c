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

__version__ = "0.1.0"

__all__ = [
    "BlackHole", "Observer", "Photon", "PatchConfig", "IntegratorConfig",
    "SceneConfig", "apply_relative_offsets", "RenderResult", "render",
    "render_pixels", "SchwarzschildIntegrator", "__version__",
]
