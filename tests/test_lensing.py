"""Magnification maps (engine/lensing.py): normalization, parity, caustic.

The flat-normalized FD Jacobian must return EXACTLY +1 when gravity is
off (same pixels, same stopping rule up to step quantization), and for
Schwarzschild must show the three structural lensing features: smooth
near-unity far field, a fully parity-flipped (secondary-image) annulus
between the shadow edge and the first critical curve, and a
magnification divergence at that curve.
"""
import os

import numpy as np

from grtrace import IntegratorConfig, PatchConfig, SceneConfig
from grtrace.engine.lensing import inverse_magnification_map
from grtrace.engine.render_generic import render_generic


def _render(size, steps, delta, mass=1.0, spin=0.0):
    scene = SceneConfig(size=size, metric="kerr", spin=spin, bh_mass=mass,
                        n_samples=0,
                        integrator=IntegratorConfig(steps=steps,
                                                    delta=delta,
                                                    dtype="float64"),
                        patch=PatchConfig())
    return scene, render_generic(scene, spin=spin, metric="KerrSchild",
                                 bg_array=None)


def test_flat_limit_is_unity():
    """M -> 0: curved == straight, so mu == +1 up to the step-quantized
    stopping overshoot (a few % at delta = 0.1)."""
    scene, res = _render(24, 2000, 0.1, mass=1e-8)
    mu_inv, valid = inverse_magnification_map(res, scene.boundary_radius)
    assert valid.all()
    np.testing.assert_allclose(mu_inv[valid], 1.0, atol=0.05)


def test_schwarzschild_parity_annulus_and_caustic():
    scene, res = _render(64, 12_000, 0.05)
    mu_inv, valid = inverse_magnification_map(res, scene.boundary_radius)
    mu = np.where(valid, 1.0 / mu_inv, np.nan)

    yy, xx = np.indices(mu_inv.shape) - (64 - 1) / 2.0
    rr = np.hypot(xx, yy)

    far = valid & (rr > 24)
    assert np.isfinite(mu[far]).all()
    assert 0.5 < np.nanmedian(np.abs(mu[far])) < 1.5
    assert (mu_inv[far] > 0).all()                    # even parity outside

    inner = valid & (rr >= 8) & (rr < 10)             # secondary images
    assert inner.sum() > 50
    assert (mu_inv[inner] < 0).all()                  # mirror-flipped

    ring = valid & (rr >= 10) & (rr < 12)             # the critical curve
    assert np.nanmax(np.abs(mu[ring])) > \
        8.0 * np.nanmedian(np.abs(mu[far]))           # divergence

    # the shadow itself is excluded from the stencil
    assert not valid[28:36, 28:36].any()


def test_cli_artifacts(tmp_path):
    from grtrace.cli import magnify as cli

    out = str(tmp_path)
    m = cli.main(["--size", "48", "--steps", "6000", "--delta", "0.05",
                  "--metric", "kerr", "--spin", "0.9",
                  "--backend", "xla", "--out-dir", out])
    assert m["valid_pixels"] > 1000
    assert m["flipped_pixels"] > 20
    assert m["max_abs_magnification"] > 3.0
    assert os.path.exists(os.path.join(out, "magnification.png"))
    csv = np.genfromtxt(os.path.join(out, "magnification.csv"),
                        delimiter=",", names=True)
    assert (csv["inverse_magnification"] != 0).all()
