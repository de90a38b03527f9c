"""Stepping-free exact null geodesics for the static beyond-Kerr families.

physics/static_exact.py reduces every planar orbit to 1-D root finds and
quadratures of (du/dphi)^2 = 1/b^2 - u^2 f(1/u) — no integrator, no
truncation.  These tests close the loop in both directions:

  * closed forms: in the M -> 0 flat limit the sweep is exactly
    pi - 2 asin(b u_obs); the turning point of Schwarzschild b = b_c
    rays is the photon sphere;
  * the fixed-step FANTASY engine at (delta = 0.01, order 4) must land
    on the quadrature to ~1e-5: deflections of escaped rays AND the
    planar-fold disk renderer's crossing radii (measured: 2.5e-6 rad /
    1.4e-5 M max over a camera fan through Bardeen g = 0.5).

This extends the repo's strongest-oracle pattern (physics/geodesic_exact
for Kerr) to the beyond-Kerr static families.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from grtrace.engine.disk import STATUS_DISK
from grtrace.engine.disk_static import integrate_batch_disk_static
from grtrace.engine.integrate_generic import integrate_batch_generic
from grtrace.physics.camera import camera_rays_folded_static
from grtrace.physics.spacetime import METRICS
from grtrace.physics.static_exact import (_phi_leg, deflection_static,
                                          disk_crossing_exact,
                                          turning_point_static,
                                          u_at_phi_static)
from grtrace.physics.static_metrics import (b_critical, bardeen_f,
                                            kottler_f, photon_sphere)

M = 1.0
R_OBS = 30.0


def test_flat_limit_closed_form():
    """M -> 0: straight lines sweep exactly pi - 2 asin(b/r_obs)."""
    p0 = jnp.array([1e-12, 0.0, 0.0])
    for b in (5.0, 12.0, 25.0):
        swept = float(deflection_static(jnp.asarray(b), kottler_f, p0,
                                        R_OBS))
        expect = np.pi - 2.0 * np.arcsin(b / R_OBS)
        # 384-node midpoint quadrature truncates at a few 1e-6
        assert swept == pytest.approx(expect, abs=1e-5)


def test_turning_point_critical_limit():
    """b slightly above b_c: the periapsis hugs the photon sphere."""
    p = jnp.array([M, 0.0, 0.0])
    b_c = float(b_critical(kottler_f, p))
    r_ph = float(photon_sphere(kottler_f, p))
    u_t = float(turning_point_static(jnp.asarray(b_c * 1.0001), kottler_f,
                                     p, 1.0 / R_OBS, 1.0))
    assert 1.0 / u_t == pytest.approx(r_ph, rel=0.02)
    # below b_c: captured, no turning point
    u_t = float(turning_point_static(jnp.asarray(b_c * 0.99), kottler_f,
                                     p, 1.0 / R_OBS, 1.0))
    assert np.isnan(u_t)


def _folded_fan(p, size=10):
    obs = jnp.array([R_OBS, 0.0, 0.0])
    q0, p0, _, beta = camera_rays_folded_static(
        obs, jnp.radians(60.0), size, size, params=p,
        g_inv_fn=METRICS["Bardeen"], dtype=jnp.float64)
    n = size * size
    return q0.reshape(n, 4), p0.reshape(n, 4), beta.reshape(n)


def test_integrator_deflections_match_quadrature():
    """Escaped folded rays: the FANTASY engine's swept fold azimuth at
    its own exit radius == the quadrature, to integrator truncation
    (~2.5e-6 rad at delta = 0.01, order 4)."""
    p = jnp.array([M, 0.5, 0.0])
    q0f, p0f, _ = _folded_fan(p)
    fq, _, status, _ = integrate_batch_generic(
        q0f, p0f, 40000, 0.01, p, 31.0, 1.0, order=4, metric="Bardeen")
    esc = np.asarray(status) == 2
    assert esc.sum() > 20
    E = -np.asarray(p0f[:, 0])
    b = np.abs(np.asarray(p0f[:, 3]) / E)
    u_obs = 1.0 / R_OBS
    checked = 0
    for i in np.nonzero(esc)[0][:24]:
        r_f = float(fq[i, 1])
        swept_num = abs(float(fq[i, 3]))
        u_t = turning_point_static(jnp.asarray(b[i]), bardeen_f, p,
                                   u_obs, 1.0)
        phi_t = float(_phi_leg(u_obs, u_t, u_t, jnp.asarray(b[i]),
                               bardeen_f, p))
        extra = float(_phi_leg(1.0 / r_f, u_obs, u_t, jnp.asarray(b[i]),
                               bardeen_f, p))
        assert swept_num == pytest.approx(2.0 * phi_t + extra, abs=2e-5)
        checked += 1
    assert checked >= 20


def test_disk_crossings_match_quadrature():
    """The planar-fold disk renderer's interpolated crossing radii land
    on the EXACT quadrature crossings to the in-step lerp tolerance
    (~1e-5 M at delta = 0.01, order 4): for every hit, SOME node
    crossing k of the same ray sits at that radius."""
    p = jnp.array([M, 0.5, 0.0])
    q0f, p0f, beta = _folded_fan(p)
    elev = jnp.radians(12.0)
    c1 = jnp.full(beta.shape, jnp.sin(elev))
    c2 = jnp.sin(beta) * jnp.cos(elev)
    _, _, status, _, hq, _ = integrate_batch_disk_static(
        q0f, p0f, c1, c2, 40000, 0.01, p, 31.0, 1.0, 4.0, 14.0,
        order=4, metric="Bardeen")
    hit = np.asarray(status) == STATUS_DISK
    assert hit.sum() > 10
    for i in np.nonzero(hit)[0]:
        r_num = float(hq[i, 1])
        cands = []
        for k in range(5):
            r_ex, _ = disk_crossing_exact(p0f[i], beta[i], elev,
                                          "Bardeen", p, R_OBS, k)
            if np.isfinite(float(r_ex)):
                cands.append(float(r_ex))
        assert cands, f"ray {i}: no finite exact crossings"
        assert min(abs(c - r_num) for c in cands) < 5e-4, (
            f"ray {i}: r_num {r_num} vs candidates {cands}")


def test_u_at_phi_roundtrip():
    """phi -> u -> phi closes on both legs."""
    p = jnp.array([M, 0.5, 0.0])
    b = jnp.asarray(8.0)
    u_obs = 1.0 / R_OBS
    u_t = turning_point_static(b, bardeen_f, p, u_obs, 1.0)
    phi_t = float(_phi_leg(u_obs, u_t, u_t, b, bardeen_f, p))
    for frac in (0.3, 0.8, 1.4, 1.9):
        phi = frac * phi_t
        u = u_at_phi_static(jnp.asarray(phi), b, bardeen_f, p, R_OBS)
        phi_in = float(_phi_leg(u_obs, u, u_t, b, bardeen_f, p))
        phi_back = phi_in if frac <= 1.0 else 2.0 * phi_t - phi_in
        assert phi_back == pytest.approx(phi, abs=1e-8)
    # beyond the total sweep: NaN
    u = u_at_phi_static(jnp.asarray(2.1 * phi_t), b, bardeen_f, p, R_OBS)
    assert np.isnan(float(u))


def test_exact_static_render_matches_integrator():
    """Full-frame oracle: the stepping-free static render agrees with
    the FANTASY folded render pixel-for-pixel away from the shadow
    boundary (where the integrator's finite delta owns the error), and
    the escape azimuths match to the boundary-overshoot tolerance."""
    from grtrace.engine.render import render
    from grtrace.engine.render_exact import (
        render_pixels_background_exact_static)
    from grtrace.io.scene import IntegratorConfig, PatchConfig, SceneConfig

    size = 32
    rng = np.random.default_rng(11)
    bg = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    p1 = 0.5

    out = render_pixels_background_exact_static(
        jnp.asarray(bg), jnp.asarray(30.0, jnp.float64),
        jnp.asarray(np.radians(80.0), jnp.float64),
        jnp.asarray(1.0, jnp.float64), jnp.asarray(p1, jnp.float64),
        jnp.asarray(31.0, jnp.float64),
        jnp.asarray(np.pi / 2, jnp.float64),
        jnp.asarray(np.pi, jnp.float64),
        jnp.asarray(np.pi, jnp.float64),
        jnp.asarray(2 * np.pi, jnp.float64),
        height=size, width=size, metric="Bardeen")

    scene = SceneConfig(size=size, fov_deg=80.0, metric="bardeen",
                        metric_param=p1, n_samples=0,
                        integrator=IntegratorConfig(steps=30000,
                                                    delta=0.02,
                                                    dtype="float64",
                                                    order=4),
                        patch=PatchConfig())
    res = render(scene, bg_array=bg)

    cls_exact = np.asarray(out["cls"])
    cls_num = np.asarray(res.cls)
    # no step budget, no guards: these classes cannot occur
    assert not (cls_exact == 1).any() and not (cls_exact == 4).any()
    mismatch = (cls_exact != cls_num).mean()
    assert mismatch < 0.02, f"cls mismatch {mismatch:.1%}"

    # matched escaped pixels: the classifier azimuths agree to the
    # integrator's one-step boundary overshoot (~5e-3 rad at delta=0.02)
    esc = (np.asarray(out["status"]) == 2) & (np.asarray(res.status) == 2)
    ph_e = np.asarray(out["final_ph"])[esc]
    ph_n = np.asarray(res.final_ph)[esc]
    dph = np.abs(np.angle(np.exp(1j * (ph_e - ph_n))))
    assert np.median(dph) < 2e-3
    assert np.quantile(dph, 0.95) < 2e-2
    # photon summary counts agree to the boundary-pixel flicker
    cv = np.asarray(out["count_vec"])
    assert abs(int(cv[0]) - res.counts["captured"]) <= 3
