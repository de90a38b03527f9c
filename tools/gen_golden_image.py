"""Generate the committed golden-image regression fixture.

The reference commits its rendered PNGs under images/ as de-facto visual
regression artifacts (SURVEY.md section 4); its own manual_output.png is an
unreadable LFS pointer, so the substitute is a self-golden: a small
deterministic render committed in-repo and asserted bit-exact on the CPU
float64 XLA path (tests/test_golden_image.py).

Run from the repo root (CPU, float64):

    python tools/gen_golden_image.py

Scene: 64x64, checker-texture sky, the reference's default geometry
(observer 30, boundary 31, fov 80 deg — config.py:6-8,17-18) at a reduced
4000-step budget so the CPU render stays fast.
"""
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                      "render_64_schwarzschild.npz")


def scene_and_texture():
    from grtrace import IntegratorConfig, PatchConfig, SceneConfig
    from grtrace.io.textures import checker

    scene = SceneConfig(
        size=64, fov_deg=80.0, background=None, bh_mass=1.0,
        boundary_radius=31.0, observer_distance=30.0,
        integrator=IntegratorConfig(steps=4000, delta=0.05, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)
    tex = checker(64, 64)
    return scene, tex


def main():
    from grtrace import render

    scene, tex = scene_and_texture()
    res = render(scene, bg_array=tex, dtype=np.float64)
    np.savez_compressed(
        os.path.abspath(GOLDEN),
        image=res.image.astype(np.uint8),
        cls=res.cls.astype(np.int8),
        counts=np.array([res.counts["captured"], res.counts["in_domain"],
                         res.counts["escaped"], res.counts["background"],
                         res.counts["numerical_error"]], np.int64))
    print(f"wrote {os.path.abspath(GOLDEN)}: counts={res.counts}")


if __name__ == "__main__":
    main()
