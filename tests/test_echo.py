"""Lamp-post reverberation mapping (engine/echo.py).

Anchors, strongest first:
  * |E| of every fan ray == sqrt(f(h)) EXACTLY in Schwarzschild — the
    static-tetrad unit-frequency normalization is the textbook
    gravitational redshift of a static emitter;
  * the static-receiver lamp->disk shift == sqrt(f(h)/f(r)) exactly;
  * L_z == 0 exactly (axis launch + axisymmetry);
  * the rest-frame emission angle alpha0 == the requested psi;
  * Newtonian far field: the geometric illumination |dcos psi/dA|
    reduces to the point-source plane formula h/(2 pi (h^2+r^2)^{3/2});
  * every source-leg light-travel time exceeds the flat-space straight
    line (Shapiro + bending are nonnegative).
"""
import numpy as np
import pytest

from grtrace.engine.echo import (emissivity_profile, trace_lamppost,
                                 transfer_function)

H = 10.0


@pytest.fixture(scope="module")
def schw_fan():
    return trace_lamppost(H, [1.0, 0.0, 0.0], n_rays=384, steps=30_000,
                          delta=0.05)


def test_fan_killing_charges_exact(schw_fan):
    fan = schw_fan
    assert fan["hit"].sum() > 100
    # unit lamp-frame frequency => |E| = sqrt(f(h)), every ray
    np.testing.assert_allclose(fan["energy"], np.sqrt(1.0 - 2.0 / H),
                               rtol=1e-12)
    # axis launch => exactly zero axial angular momentum
    assert np.abs(fan["l_z"]).max() == 0.0
    # the tetrad angle is the requested one
    np.testing.assert_allclose(fan["alpha0"], fan["psi"], atol=1e-10)


def test_static_receiver_shift_closed_form(schw_fan):
    """Schwarzschild static emitter -> static receiver: g = sqrt(f_em/f_re)
    with NO velocity terms — an exact end-to-end check through the
    tetrad, the integrator, and the crossing interpolation."""
    fan = schw_fan
    hit = fan["hit"]
    r = fan["r"][hit]
    g = fan["g_sd_static"][hit]
    np.testing.assert_allclose(g, np.sqrt((1.0 - 2.0 / H) / (1.0 - 2.0 / r)),
                               rtol=1e-10)


def test_source_times_exceed_flat(schw_fan):
    fan = schw_fan
    hit = fan["hit"]
    r = fan["r"][hit]
    t = fan["t_src"][hit]
    assert (t > np.sqrt(H * H + r * r)).all()


def test_newtonian_far_field_illumination(schw_fan):
    """Strip the g_sd^2 energy factor: the geometric illumination must
    approach the Newtonian point-source plane formula in the far field
    (corrections O(M/r, M/h) ~ 10% at h = 10, r > 30)."""
    fan = schw_fan
    r, eps, _, g_sd = emissivity_profile(fan, fan["params"])
    far = r > 30.0
    assert far.sum() > 20
    newt = H / (2.0 * np.pi * (H * H + r * r) ** 1.5)
    ratio = (eps[far] / g_sd[far] ** 2) / newt[far]
    assert 0.85 < ratio.min() and ratio.max() < 1.1
    # and the profile steepens inward of the Newtonian knee (GR focusing)
    assert eps[0] > eps[-1] * 10


def test_kerr_fan_runs_and_blueshifts_inner_disk():
    """a = 0.9: the fan must cross inside the Schwarzschild ISCO (the
    prograde disk extends to r ~ 2.32) and the lamp->disk shift must
    blueshift (g_sd > 1) at small radii (deep infall beats the receiver's
    orbital time dilation only part way — just require finiteness and the
    static-receiver monotonic trend)."""
    fan = trace_lamppost(H, [1.0, 0.9, 0.0], n_rays=256, steps=30_000,
                         delta=0.05)
    hit = fan["hit"]
    assert hit.sum() > 60
    r = fan["r"][hit]
    assert r.min() < 4.0
    g_static = fan["g_sd_static"][hit]
    assert np.isfinite(g_static).all()
    # static receivers deeper in the well receive bluer light
    order = np.argsort(r)
    assert g_static[order][0] > g_static[order][-1]


def test_transfer_function_from_render(tmp_path):
    """End-to-end: disk render + fan -> Psi(tau, g); all lags positive
    once the direct path is subtracted, response conserved, CLI artifacts
    written."""
    import json

    from grtrace.cli.echo import main

    metrics = main(["--size", "64", "--steps", "8000", "--delta", "0.2",
                    "--fan-rays", "192", "--height", str(H),
                    "--out-dir", str(tmp_path)])
    json.dumps(metrics)
    for f in ["echo_emissivity.csv", "echo_emissivity.png",
              "echo_transfer.png", "echo_lag_profile.csv",
              "echo_summary.json"]:
        assert (tmp_path / f).exists(), f
    assert metrics["pixels"] > 50
    assert metrics["response_total"] > 0
    # echo can't precede the continuum flash
    assert metrics["tau_peak_M"] > 0
    assert metrics["tau_centroid_M"] > 0
