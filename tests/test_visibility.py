"""Visibility observables (engine/visibility.py): analytic anchors.

A thin ring and a Gaussian have closed-form visibilities — the FFT
pipeline must reproduce J0's first zero and the Gaussian's transform to
percent level, which pins the normalization, the frequency axes, the
azimuthal averaging and the null finder all at once.
"""
import os

import numpy as np

from grtrace.engine.visibility import (J01, first_null, radial_profile,
                                       ring_diameter_from_null,
                                       visibility_map)

PIX = 1e-6        # radians per pixel for the synthetic sources


def test_thin_ring_first_null_matches_bessel():
    n, r_px = 512, 40.0
    yy, xx = np.indices((n, n)) - (n - 1) / 2.0
    rr = np.hypot(xx, yy)
    img = np.exp(-0.5 * ((rr - r_px) / 0.6) ** 2)   # ~1 px wide ring

    amp, u, v = visibility_map(img, PIX)
    base, prof = radial_profile(amp, u, v, n_bins=300, b_max=3.0e4)
    b_null = first_null(base, prof)

    theta_d = 2.0 * r_px * PIX
    expected = J01 / (np.pi * theta_d)
    assert abs(b_null - expected) / expected < 0.03
    # and the estimator inverts back to the true diameter
    assert abs(ring_diameter_from_null(b_null) - theta_d) / theta_d < 0.03


def test_gaussian_visibility_is_gaussian():
    n, sigma_px = 256, 12.0
    yy, xx = np.indices((n, n)) - (n - 1) / 2.0
    img = np.exp(-0.5 * (xx ** 2 + yy ** 2) / sigma_px ** 2)

    amp, u, v = visibility_map(img, PIX)
    sigma_th = sigma_px * PIX
    # |V|(u, 0) = exp(-2 pi^2 sigma^2 u^2); sample along the u axis
    row = amp[np.argmin(np.abs(v))]
    for k in range(len(u) // 2 + 1, len(u) // 2 + 40, 7):
        expect = np.exp(-2.0 * np.pi ** 2 * sigma_th ** 2 * u[k] ** 2)
        if expect < 1e-6:
            break
        assert abs(row[k] - expect) < 2e-3 + 0.01 * expect

    base, prof = radial_profile(amp, u, v)
    assert np.isnan(first_null(base, prof))         # monotonic, no null
    assert amp.max() == amp[np.argmin(np.abs(v)), np.argmin(np.abs(u))]


def test_closure_phases_shift_invariant_and_symmetric():
    """Closure phases: exactly zero (mod pi sign conventions) for a
    point-symmetric source, and EXACTLY invariant under image
    translation (the shift phase telescopes around a closed triangle) —
    the property that makes them calibration-robust observables."""
    from grtrace.engine.visibility import closure_phases, complex_visibility

    n = 128
    yy, xx = np.indices((n, n)) - (n - 1) / 2.0
    rr = np.hypot(xx, yy)
    ring = np.exp(-0.5 * ((rr - 20.0) / 1.5) ** 2)
    asym = ring * (1.0 + 0.5 * np.tanh(xx / 10.0))   # break the symmetry

    vis, u, v = complex_visibility(asym, PIX, pad=2)
    du = u[1] - u[0]
    # grid-aligned closed triangles
    tris = []
    for (a, b) in [((6, 2), (-2, 5)), ((10, 0), (0, 7)), ((3, 9), (4, -4))]:
        l1 = (a[0] * du, a[1] * du)
        l2 = (b[0] * du, b[1] * du)
        l3 = (-(a[0] + b[0]) * du, -(a[1] + b[1]) * du)
        tris.append([l1, l2, l3])
    tris = np.array(tris)

    ph = closure_phases(vis, u, v, tris)
    assert np.abs(ph).max() > 1e-3                   # asymmetric: nonzero

    shifted = np.roll(np.roll(asym, 9, axis=0), -13, axis=1)
    vis_s, _, _ = complex_visibility(shifted, PIX, pad=2)
    ph_s = closure_phases(vis_s, u, v, tris)
    wrap = np.angle(np.exp(1j * (ph - ph_s)))
    np.testing.assert_allclose(wrap, 0.0, atol=1e-5)

    # point-symmetric source: V is real -> closure phases 0 or pi
    vis_r, _, _ = complex_visibility(ring, PIX, pad=2)
    ph_r = closure_phases(vis_r, u, v, tris)
    assert np.abs(np.sin(ph_r)).max() < 1e-5

    # non-closing triangle rejected
    import pytest
    bad = tris.copy()
    bad[0, 2, 0] += 3 * du
    with pytest.raises(ValueError, match="close"):
        closure_phases(vis, u, v, bad)


def test_cli_artifacts(tmp_path):
    from grtrace.cli import visibility as cli

    out = str(tmp_path)
    m = cli.main(["--size", "64", "--steps", "3000", "--delta", "0.1",
                  "--spin", "0.9", "--backend", "xla", "--out-dir", out])
    assert m["fov_uas"] > 0
    assert os.path.exists(os.path.join(out, "visibility_amp.png"))
    csv = np.genfromtxt(os.path.join(out, "visibility_radial.csv"),
                        delimiter=",", names=True)
    assert csv["visibility_amp"][0] > 0.5           # short-baseline ~ 1
    assert np.all(csv["visibility_amp"] <= 1.0 + 1e-9)
    cph = np.genfromtxt(os.path.join(out, "closure_phases.csv"),
                        delimiter=",", names=True)
    assert cph.size == 24
    assert "closure_rms_deg" in m
    # the inclined disk is NOT point-symmetric: closure phases nonzero
    assert np.abs(cph["closure_deg"]).max() > 0.5
