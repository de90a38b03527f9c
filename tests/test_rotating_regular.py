"""Rotating regular black holes (Kerr-Schild mass-function families).

physics/rotating_regular.py generalizes the Cartesian Kerr-Schild chart
to any mass function m(r).  Oracles, all independent of the module:

  * the TESTED kerr_schild_g_inv: m(r) = M - Q^2/(2r) must reproduce the
    whole Kerr-Newman family to roundoff (the hand-inlined H in
    spacetime.py:132 IS this construction), and g = l = 0 must give Kerr;
  * the static families: at a = 0, Delta = r (r - 2 m(r)) vanishes
    exactly where f(r) = 1 - 2 m(r)/r does, so the bisected rotating
    horizon must match static_metrics.outer_horizon;
  * the closed-form Kerr horizon M + sqrt(M^2 - a^2) at zero deformation
    and the closed-form critical charge sqrt(16/27) M at zero spin;
  * full renders cross-checked against the Kerr-Schild Kerr render of
    the same scene at zero deformation.

No reference counterpart (Schwarzschild-only reference,
simulation/cuda_geodesic.py:432-447).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from grtrace.engine.render import render
from grtrace.io.scene import IntegratorConfig, SceneConfig
from grtrace.physics import rotating_regular as rr
from grtrace.physics.spacetime import (COORDS, METRICS, horizon_radius,
                                       kerr_schild_g_inv)

M = 1.0


def _rand_points(n, seed=3):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-12.0, 12.0, size=(n, 3))
    keep = np.linalg.norm(pts, axis=1) > 2.5
    pts = pts[keep]
    t = rng.uniform(0, 10, size=(pts.shape[0], 1))
    return jnp.asarray(np.hstack([t, pts]))


def test_factory_reproduces_kerr_newman_exactly():
    """m(r) = M - Q^2/(2r) through the factory == the hand-inlined
    Kerr-Newman Kerr-Schild metric, to float64 roundoff."""
    def kn_mass(r, params):
        return params[0] - 0.5 * params[2] ** 2 / r

    g_inv_kn = rr.make_rotating_ks_g_inv(kn_mass)
    params = jnp.array([M, 0.7, 0.4])
    for q in _rand_points(20):
        a = np.asarray(g_inv_kn(q, params))
        b = np.asarray(kerr_schild_g_inv(q, params))
        np.testing.assert_allclose(a, b, rtol=1e-13, atol=1e-15)


def test_kerr_limit_zero_deformation():
    params = jnp.array([M, 0.9, 0.0])
    for q in _rand_points(20, seed=5):
        a = np.asarray(rr.rotating_bardeen_g_inv(q, params))
        h = np.asarray(rr.rotating_hayward_g_inv(q, params))
        b = np.asarray(kerr_schild_g_inv(q, params))
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(h, b, rtol=1e-12, atol=1e-14)


def test_registry_entries():
    for name in ("RotatingBardeen", "RotatingHayward"):
        assert name in METRICS and COORDS[name] == "cartesian"


def test_horizon_kerr_closed_form():
    for a in (0.0, 0.5, 0.9, 0.99):
        r = float(rr.rotating_horizon("RotatingBardeen",
                                      jnp.array([M, a, 0.0])))
        assert r == pytest.approx(M + np.sqrt(M * M - a * a), abs=1e-8)


def test_horizon_static_limit_matches_outer_horizon():
    from grtrace.physics.static_metrics import STATIC_F, outer_horizon

    for fam, p1 in (("Bardeen", 0.5), ("Hayward", 0.65)):
        r_rot = float(rr.rotating_horizon(f"Rotating{fam}",
                                          jnp.array([M, 0.0, p1])))
        r_sta = float(outer_horizon(STATIC_F[fam], jnp.array([M, p1])))
        assert r_rot == pytest.approx(r_sta, abs=1e-6)


def test_horizon_radius_registry_dispatch():
    r = float(horizon_radius("RotatingBardeen", M, 0.6, 0.3))
    assert 1.0 < r < 2.0
    # super-critical: spin + charge jointly kill the horizon
    assert np.isnan(float(horizon_radius("RotatingBardeen", M, 0.9, 0.6)))


def test_critical_parameter_curve():
    """a = 0 reproduces the static critical charge sqrt(16/27) M; spin
    monotonically shrinks the allowed deformation."""
    g0 = float(rr.critical_parameter("RotatingBardeen", 0.0))
    assert g0 == pytest.approx(np.sqrt(16.0 / 27.0), abs=1e-3)
    g5 = float(rr.critical_parameter("RotatingBardeen", 0.5))
    g9 = float(rr.critical_parameter("RotatingBardeen", 0.9))
    assert g0 > g5 > g9 > 0.0
    l0 = float(rr.critical_parameter("RotatingHayward", 0.0))
    assert l0 == pytest.approx(np.sqrt(16.0 / 27.0), abs=1e-3)


def _render(metric, spin, p1, size=32):
    scene = SceneConfig(size=size, metric=metric, spin=spin,
                        metric_param=p1, n_samples=0,
                        integrator=IntegratorConfig(steps=2000, delta=0.06,
                                                    dtype="float64"))
    bg = np.full((16, 16, 3), 100, np.uint8)
    return render(scene, bg_array=bg)


def test_render_matches_kerr_at_zero_deformation():
    """Full render parity at the shared Kerr point: same camera, same
    engine, only the g_inv callable differs (algebraically identical;
    jnp.power introduces ~ulp noise, so statuses may flicker on at most
    a few boundary pixels)."""
    res_rot = _render("rotating-bardeen", 0.9, 0.0)
    res_kerr = _render("kerr", 0.9, 0.0)
    s_rot = np.asarray(res_rot.device("status"))
    s_kerr = np.asarray(res_kerr.device("status"))
    assert (s_rot != s_kerr).mean() < 0.01
    assert res_rot.counts["numerical_error"] == 0
    assert abs(res_rot.counts["captured"]
               - res_kerr.counts["captured"]) <= 5


@pytest.mark.parametrize("metric,p1", [("rotating-bardeen", 0.2),
                                       ("rotating-hayward", 0.3)])
def test_render_rotating_regular_shadow(metric, p1):
    """Spinning regular hole: the D-shaped shadow survives the
    deformation (pixel-level it is indistinguishable from Kerr at these
    moderate parameters — the shrink is sub-pixel, pinned by the
    bisection test below), and the frame-dragging asymmetry matches
    Kerr's direction."""
    spin = 0.9
    res = _render(metric, spin, p1)
    res_kerr = _render("kerr", spin, 0.0)
    assert res.counts["numerical_error"] == 0
    assert 0 < res.counts["captured"] <= res_kerr.counts["captured"]
    # frame dragging displaces the shadow the same way as in Kerr
    cap = np.asarray(res.device("status")).reshape(32, 32) == 1
    cap_k = np.asarray(res_kerr.device("status")).reshape(32, 32) == 1
    cj = np.nonzero(cap)[1].mean() - (32 - 1) / 2
    cj_k = np.nonzero(cap_k)[1].mean() - (32 - 1) / 2
    assert abs(cj_k) > 0.2           # Kerr asymmetry is resolved
    assert np.sign(cj) == np.sign(cj_k)


def _equatorial_fan(metric_name, params, side, n=340):
    d = 30.0
    alphas = np.linspace(0.02, 0.36, n)
    # pinhole pixel positions: image plane at 0.2 d, offset 0.2 d tan(a)
    # (physics.camera.pixel_grid geometry, reference raytracing.py:60-88)
    from grtrace.physics.camera import cartesian_ics_from_pixels
    pix = np.zeros((n, 3))
    pix[:, 0] = d - 0.2 * d
    pix[:, 1] = side * 0.2 * d * np.tan(alphas)
    q0, p0, _ = cartesian_ics_from_pixels(
        jnp.array([d, 0.0, 0.0]), jnp.asarray(pix),
        params=params, g_inv_fn=METRICS[metric_name])
    return alphas, q0, p0


def _capture_boundary_alphas(metric_name, params, side, n=340):
    """Largest camera angle alpha (one side of the equatorial image line)
    whose ray is captured — the shadow's equatorial limb, resolved to the
    fan spacing (~0.001 rad << a pixel) through the real integrator."""
    from grtrace.engine.integrate_generic import integrate_batch_generic

    alphas, q0, p0 = _equatorial_fan(metric_name, params, side, n)
    _, _, status, _ = integrate_batch_generic(
        q0, p0, 2500, 0.05, params, 31.0, 1.0, order=2,
        metric=metric_name)
    cap = np.asarray(status) == 1
    assert cap[0] and not cap[-1]
    return alphas[np.nonzero(cap)[0].max()]


def test_escape_pred_matches_kerr_predicate_at_zero_deformation():
    """The generalized (golden-section) min-R predicate must agree with
    the Kerr-Newman quartic predicate ray-for-ray when m(r) = M."""
    from grtrace.engine.integrate_ks import bardeen_escape_pred

    params = jnp.array([M, 0.9, 0.0], jnp.float64)
    for side in (+1.0, -1.0):
        _, q0, p0 = _equatorial_fan("RotatingBardeen", params, side)
        pred_rot = np.asarray(rr.escape_pred_rotating(
            "RotatingBardeen", q0, p0, params))
        pred_kerr = np.asarray(bardeen_escape_pred(
            q0, p0, params[0], params[1], jnp.zeros(())))
        np.testing.assert_array_equal(pred_rot, pred_kerr)


def test_integrated_boundary_matches_exact_predicate():
    """Theory closure: the integrated capture boundary of the deformed
    hole must land within a few fan steps of the EXACT conserved-quantity
    boundary (escape_pred_rotating evaluated on the identical rays) —
    the integrator and the Hamilton-Jacobi separation agree about where
    the shadow ends."""
    params = jnp.array([M, 0.9, 0.26], jnp.float64)
    for side in (+1.0, -1.0):
        alphas, q0, p0 = _equatorial_fan("RotatingBardeen", params, side)
        pred = np.asarray(rr.escape_pred_rotating(
            "RotatingBardeen", q0, p0, params))
        a_theory = alphas[np.nonzero(~pred)[0].max()]
        a_num = _capture_boundary_alphas("RotatingBardeen", params, side)
        assert abs(a_num - a_theory) <= 3.5 * (alphas[1] - alphas[0])


def test_shadow_boundary_shrinks_with_deformation():
    """The regular core weakens gravity: at fixed spin, turning on the
    deformation SHRINKS the equatorial shadow limb on both the prograde
    and retrograde sides — a sub-pixel effect at render resolution,
    resolved here by a 0.001-rad camera fan through the identical
    engine.  (Kerr-Newman charge shrinks the Kerr shadow the same way —
    the long-standing phenomenology this family generalizes.)"""
    spin = 0.9
    kerr = jnp.array([1.0, spin, 0.0], jnp.float64)
    deformed = jnp.array([1.0, spin, 0.26], jnp.float64)
    for side in (+1.0, -1.0):
        a_kerr = _capture_boundary_alphas("KerrSchild", kerr, side)
        a_rot = _capture_boundary_alphas("RotatingBardeen", deformed, side)
        assert a_rot < a_kerr - 5e-4, (side, a_rot, a_kerr)


def test_render_horizonless_supercritical():
    """Past the joint criticality curve the hole has no horizon.  The
    deep shadow is replaced by core transits; rays that reach the r = 0
    disc (x^2 + y^2 < a^2, z = 0 — where the chart's l_z = z/r is
    indeterminate) are retired by the Hamiltonian guard as captured at
    the interior floor, the conservative verdict for rays a fixed step
    cannot resolve.  The captured count must therefore COLLAPSE relative
    to the same-spin Kerr shadow, but need not reach zero."""
    res = _render("rotating-bardeen", 0.6, 0.75)
    res_kerr = _render("kerr", 0.6, 0.0)
    assert res.counts["numerical_error"] == 0
    assert res.counts["captured"] < 0.7 * res_kerr.counts["captured"]


def test_cli_scene_roundtrip():
    from grtrace.cli.args import parse_args, scene_from_args

    args = parse_args(["--metric", "rotating-bardeen", "--spin", "0.8",
                       "--metric-param", "0.25"])
    scene = scene_from_args(args)
    assert scene.metric == "rotating-bardeen"
    assert scene.spin == 0.8 and scene.metric_param == 0.25

    with pytest.raises(SystemExit):
        scene_from_args(parse_args(
            ["--metric", "rotating-bardeen", "--charge", "0.3"]))
    with pytest.raises(SystemExit):
        scene_from_args(parse_args(
            ["--metric", "rotating-bardeen", "--spin", "1.2"]))
    # plain kerr still rejects a spin above M (unchanged behavior)
    with pytest.raises(SystemExit):
        scene_from_args(parse_args(["--metric", "kerr", "--spin", "1.2"]))


def test_rotating_boundary_matches_kerr_curve_at_zero_param():
    """The predicate-based critical curve reduces to the closed-form
    Bardeen curve at zero deformation (different bisection brackets, so
    agreement to the sub-pixel bisection resolution)."""
    from grtrace.engine.shadow import (analytic_boundary,
                                       analytic_boundary_rotating)

    _, rho_kerr = analytic_boundary(0.9, 0.0, n_psi=16, rounds=8)
    _, rho_rot = analytic_boundary_rotating(0.9, 0.0, "RotatingBardeen",
                                            n_psi=16, rounds=8)
    np.testing.assert_allclose(rho_rot, rho_kerr, atol=0.05)


def test_shadow_cli_rotating_family(tmp_path):
    """Shadow analysis for a spinning regular hole: the D-shaped curve
    survives (finite circularity deviation), the mean radius shrinks
    against Kerr at the same spin, and horizonless points are refused."""
    from grtrace.cli.shadow import main

    m_rot = main(["--metric", "rotating-bardeen", "--spin", "0.9",
                  "--metric-param", "0.26", "--azimuths", "32",
                  "--out-dir", str(tmp_path / "rot")])
    m_kerr = main(["--spin", "0.9", "--azimuths", "32",
                   "--out-dir", str(tmp_path / "kerr")])
    assert m_rot["mean_radius_px"] < m_kerr["mean_radius_px"]
    assert m_rot["circularity_deviation"] > 0.005   # still D-shaped
    import os
    assert os.path.exists(str(tmp_path / "rot" / "shadow_boundary.csv"))

    with pytest.raises(SystemExit, match="horizonless"):
        main(["--metric", "rotating-bardeen", "--spin", "0.9",
              "--metric-param", "0.4", "--azimuths", "8",
              "--out-dir", str(tmp_path / "bad")])
