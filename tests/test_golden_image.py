"""Pixel-level golden-image regression.

The reference's committed scene PNGs under images/ are its informal visual
regression fixtures (SURVEY.md section 4); manual_output.png itself is an
unreadable LFS pointer, so the executable substitute is a committed
self-golden: tests/golden/render_64_schwarzschild.npz, produced by
tools/gen_golden_image.py on the CPU float64 XLA path.

float64/XLA must reproduce it bit-exact; float32 (the production dtype) is
held to a small pixel-disagreement budget — classification flips only at
patch seams / the shadow edge where a half-ulp moves a ray across a hard
threshold.
"""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "render_64_schwarzschild.npz")


@pytest.fixture(scope="module")
def golden():
    z = np.load(GOLDEN)
    return z["image"], z["cls"], z["counts"]


def _render(dtype_str):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_golden_image import scene_and_texture

    from grtrace import render
    scene, tex = scene_and_texture()
    scene.integrator.dtype = dtype_str
    dt = np.float64 if dtype_str == "float64" else np.float32
    return render(scene, bg_array=tex, dtype=dt)


def test_golden_image_f64_bit_exact(golden):
    img, cls, counts = golden
    res = _render("float64")
    assert np.array_equal(res.image, img), (
        f"{(res.image != img).any(axis=-1).sum()} pixels differ from golden")
    assert np.array_equal(res.cls, cls)
    got = np.array([res.counts["captured"], res.counts["in_domain"],
                    res.counts["escaped"], res.counts["background"],
                    res.counts["numerical_error"]])
    assert np.array_equal(got, counts)


def test_golden_image_f32_tolerance(golden):
    img, cls, counts = golden
    res = _render("float32")
    # classification counts: exact equality is not guaranteed in f32 (hard
    # thresholds), but no ray may fail numerically and the totals must be
    # within a handful of boundary-straddling pixels
    assert res.counts["numerical_error"] == 0
    assert abs(res.counts["captured"] - int(counts[0])) <= 4
    # pixel budget: <= 1% of pixels may differ (threshold flips at the
    # shadow edge and checker seams)
    frac = (res.image != img).any(axis=-1).mean()
    assert frac <= 0.01, f"{frac:.2%} of f32 pixels differ from f64 golden"
