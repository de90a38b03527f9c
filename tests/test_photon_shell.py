"""Photon-shell critical parameters vs closed forms AND the production
integrator.

Three tiers, from cheapest to strongest:

  1. internal consistency — the Mino-time split W = W_r + W_th really is
     separable (r-independence of W_th), and the critical pair (xi, K)
     is a genuine double root of the *independent* textbook radial
     potential R(r) = ((r^2 + a^2) - a xi)^2 - Delta (eta + (xi - a)^2)
     (Bardeen 1973 form, restated here in the test only);
  2. closed forms — Kerr's xi_c(r~), eta_c(r~) and the equatorial
     photon-orbit radii r_ph(a) = 2M(1 + cos(2/3 arccos(∓a/M))), plus
     the Schwarzschild exact triple gamma = pi, delta_t = pi sqrt(27) M,
     delta_phi = 0 on the polar orbit;
  3. the production Kerr-Schild integrator at a = 0.9, face-on: rays on
     the spin axis carry L_z = 0 exactly, so they shadow the POLAR shell
     orbit — the measured geometric shrink rate of the image-order bands
     must be e^{gamma(polar)} and the BL-time gaps between consecutive
     equatorial crossings must be delta_t(polar), with gamma/delta_t
     PREDICTED by physics/photon_shell.py, not fitted.

Tier 3 reuses the single-jitted-ray bisection methodology proven in
tests/test_subring_anchors.py (order 4 / delta 0.02 resolves ~5 clean
crossings in float64; see DESIGN.md #19).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.engine.hotspot import bl_time_azimuth_offsets
from grtrace.engine.subring import integrate_batch_subrings
from grtrace.physics.camera import cartesian_ics_from_pixels
from grtrace.physics.photon_shell import (critical_orbit,
                                          critical_parameters,
                                          shell_radius_range, w_polar,
                                          w_radial)
from grtrace.physics.polarization import bl_from_ks
from grtrace.physics.spacetime import METRICS

KERR = jnp.array([1.0, 0.7, 0.0])
KERR_FAST = jnp.array([1.0, 0.9, 0.0])
KERR_NEWMAN = jnp.array([1.0, 0.6, 0.5])
SCHW = jnp.array([1.0, 0.0, 0.0])


# ---------------------------------------------------------------- tier 1

def test_polar_potential_is_r_independent():
    """Separability: W_th(th) = W(r, th) - W(r, pi/2) must not depend on
    the r it is evaluated at — for Kerr AND Kerr-Newman."""
    ths = jnp.linspace(0.15, jnp.pi / 2, 9)
    for params in (KERR_FAST, KERR_NEWMAN):
        for xi in (-3.0, 0.0, 2.5):
            vals = jnp.stack([
                jax.vmap(lambda t: w_polar(t, xi, params, r_ref=rr))(ths)
                for rr in (3.0, 10.0, 80.0)])
            spread = jnp.max(jnp.abs(vals - vals[0]))
            assert float(spread) < 1e-11, (params, xi, float(spread))


def _bardeen_radial(r, xi, eta, params):
    """Independent restatement of the BL radial potential (Bardeen 1973,
    extended to Kerr-Newman through Delta only)."""
    mass, a, qc = params[0], params[1], params[2]
    delta = r * r - 2.0 * mass * r + a * a + qc * qc
    return (r * r + a * a - a * xi) ** 2 - delta * (eta + (xi - a) ** 2)


@pytest.mark.parametrize("params", [KERR, KERR_FAST, KERR_NEWMAN],
                         ids=["a0.7", "a0.9", "a0.6q0.5"])
def test_critical_orbit_is_double_root_of_bardeen_potential(params):
    """R(r~) = 0 and R'(r~) = 0 for the module's (xi, K) — against the
    textbook polynomial, which shares no code with photon_shell.

    The module's potential is -Delta (K + W_r); Bardeen's differs by the
    positive factor E^2 (here 1) only, so double roots must transfer."""
    r_lo, r_hi = shell_radius_range(params)
    for r_t in np.linspace(float(r_lo) + 0.05, float(r_hi) - 0.05, 7):
        xi, k_const = critical_orbit(jnp.float64(r_t), params)
        rad = lambda rr: _bardeen_radial(rr, xi, k_const, params)
        val = float(rad(jnp.float64(r_t)))
        slope = float(jax.grad(rad)(jnp.float64(r_t)))
        # scale by r^4 (the potential's natural size at the shell)
        assert abs(val) / r_t ** 4 < 1e-10
        assert abs(slope) / r_t ** 3 < 1e-9


# ---------------------------------------------------------------- tier 2

def test_kerr_closed_form_critical_impact_parameters():
    """xi_c = (M(r^2 - a^2) - r Delta)/(a (r - M)),
    eta_c = r^3 (4 M Delta - r (r - M)^2)/(a^2 (r - M)^2)."""
    mass, a = 1.0, float(KERR[1])
    r_lo, r_hi = shell_radius_range(KERR)
    for r_t in np.linspace(float(r_lo) + 0.05, float(r_hi) - 0.05, 9):
        delta = r_t * r_t - 2.0 * mass * r_t + a * a
        xi_ref = (mass * (r_t * r_t - a * a) - r_t * delta) / (
            a * (r_t - mass))
        eta_ref = r_t ** 3 * (4.0 * mass * delta
                              - r_t * (r_t - mass) ** 2) / (
            a * (r_t - mass)) ** 2
        xi, k_const = critical_orbit(jnp.float64(r_t), KERR)
        assert abs(float(xi) - xi_ref) < 1e-9 * max(1.0, abs(xi_ref))
        assert abs(float(k_const) - eta_ref) < 1e-8 * max(1.0, eta_ref)


def test_shell_range_hits_equatorial_photon_orbits():
    """r_ph(a) = 2M(1 + cos((2/3) arccos(-/+ a/M))) — prograde inner,
    retrograde outer edge of the shell (eta = 0 there; Bardeen-Press-
    Teukolsky 1972 eq. 2.18)."""
    a = float(KERR_FAST[1])
    r_pro = 2.0 * (1.0 + np.cos((2.0 / 3.0) * np.arccos(-a)))
    r_ret = 2.0 * (1.0 + np.cos((2.0 / 3.0) * np.arccos(a)))
    r_lo, r_hi = shell_radius_range(KERR_FAST)
    assert abs(float(r_lo) - r_pro) < 1e-8
    assert abs(float(r_hi) - r_ret) < 1e-8


def test_schwarzschild_exact_triple():
    """gamma = pi, delta_t = pi sqrt(27) M, delta_phi = 0 on the (polar,
    like every) critical orbit at r~ = 3M."""
    gam, dt, dphi, xi, k_const = critical_parameters(jnp.float64(3.0),
                                                     SCHW)
    assert abs(float(xi)) < 1e-12
    assert abs(float(k_const) - 27.0) < 1e-10
    # the polar turning-point bisection floors at 1e-9, truncating the
    # (finite) integrand there — an O(1e-9) relative error, not exact-0
    assert abs(float(gam) - np.pi) < 1e-8
    assert abs(float(dt) - np.pi * np.sqrt(27.0)) < 1e-7
    assert abs(float(dphi)) < 1e-8


def test_lyapunov_monotone_and_finite_across_shell():
    """gamma stays positive and finite over the open shell for a = 0.9 —
    the quadrature and turning-point machinery hold at every radius."""
    r_lo, r_hi = shell_radius_range(KERR_FAST)
    rs = jnp.linspace(float(r_lo) + 0.02, float(r_hi) - 0.02, 11)
    gams = np.array([float(critical_parameters(r, KERR_FAST)[0])
                     for r in rs])
    assert np.all(np.isfinite(gams)) and np.all(gams > 0.5)
    assert np.all(gams < 2.0 * np.pi)


def test_critical_curve_schwarzschild_circle():
    """a = 0: the curve is the sqrt(27)M circle with gamma = pi and
    delta_t = pi sqrt(27) at EVERY point, any inclination."""
    from grtrace.physics.photon_shell import critical_curve_observables
    curve = critical_curve_observables(SCHW, jnp.float64(0.7), n=16)
    rho = np.hypot(np.asarray(curve["alpha"]), np.asarray(curve["beta"]))
    assert np.max(np.abs(rho - np.sqrt(27.0))) < 1e-8
    assert np.max(np.abs(np.asarray(curve["gamma"]) - np.pi)) < 1e-8
    assert np.max(np.abs(np.asarray(curve["delta_t"])
                         - np.pi * np.sqrt(27.0))) < 1e-7
    assert np.max(np.abs(np.asarray(curve["r"]) - 3.0)) < 1e-9


def test_visible_range_edge_on_is_full_shell():
    """theta_obs = pi/2 sees the whole shell (Theta = K > 0 throughout)."""
    from grtrace.physics.photon_shell import shell_visible_range
    r_lo, r_hi = shell_visible_range(KERR_FAST, jnp.float64(0.5 * jnp.pi))
    R_lo, R_hi = shell_radius_range(KERR_FAST)
    assert abs(float(r_lo) - float(R_lo)) < 1e-4
    assert abs(float(r_hi) - float(R_hi)) < 1e-4


def test_critical_curve_face_on_limit_is_polar_circle():
    """theta_obs -> 0: only the polar (xi = 0) orbit is visible and the
    curve tends to the circle of radius sqrt(eta_polar + a^2)."""
    from grtrace.physics.photon_shell import critical_curve_observables
    th = jnp.float64(1e-3)
    curve = critical_curve_observables(KERR_FAST, th, n=8)
    r_polar = _polar_shell_radius(KERR_FAST)
    # visible band collapses onto the polar radius ...
    assert np.max(np.abs(np.asarray(curve["r"]) - r_polar)) < 2e-3
    # ... the curve satisfies the closed-form Bardeen screen identity
    # rho^2 = eta + a^2 cos^2(th) + xi^2 (1/sin^2 - cot^2)(th) pointwise
    a2 = float(KERR_FAST[1]) ** 2
    xi = np.asarray(curve["xi"])
    eta = np.asarray(curve["eta"])
    c, s = np.cos(float(th)), np.sin(float(th))
    rho2_ref = eta + a2 * c * c + xi * xi * (1.0 / s ** 2 - (c / s) ** 2)
    rho = np.hypot(np.asarray(curve["alpha"]), np.asarray(curve["beta"]))
    assert np.max(np.abs(rho ** 2 - rho2_ref)) < 1e-8
    # ... and tends to the polar circle sqrt(eta_polar + a^2)
    _, _, _, _, eta_p = critical_parameters(jnp.float64(r_polar),
                                            KERR_FAST)
    rho_expect = np.sqrt(float(eta_p) + a2)
    assert np.max(np.abs(rho - rho_expect)) < 5e-3


def test_critical_curve_kerr_edge_on_anchors():
    """Edge-on a = 0.9: the curve's alpha extremes are the equatorial
    photon orbits' impact parameters xi(r_ph+-) (beta = 0 there), and
    gamma stays in the physical band along the curve."""
    from grtrace.physics.photon_shell import critical_curve_observables
    curve = critical_curve_observables(KERR_FAST, jnp.float64(0.5 * jnp.pi),
                                       n=96)
    al = np.asarray(curve["alpha"])
    # prograde (inner r~) end: alpha = -xi_pro; retrograde: -xi_ret
    a = float(KERR_FAST[1])
    r_pro = 2.0 * (1.0 + np.cos((2.0 / 3.0) * np.arccos(-a)))
    r_ret = 2.0 * (1.0 + np.cos((2.0 / 3.0) * np.arccos(a)))
    xi_pro = float(critical_orbit(jnp.float64(r_pro + 1e-9),
                                  KERR_FAST)[0])
    xi_ret = float(critical_orbit(jnp.float64(r_ret - 1e-9),
                                  KERR_FAST)[0])
    assert abs(al[0] + xi_pro) < 5e-3
    assert abs(al[-1] + xi_ret) < 5e-3
    gam = np.asarray(curve["gamma"])
    assert np.all(np.isfinite(gam)) and np.all((gam > 0.5)
                                               & (gam < 2 * np.pi))


# ---------------------------------------------------------------- tier 3

def _polar_shell_radius(params):
    """Bisect xi_c(r~) = 0: the shell orbit with L_z = 0 — the one that
    face-on (on-axis) rays shadow.  xi_c falls monotonically from the
    prograde (+) to the retrograde (-) edge."""
    r_lo, r_hi = shell_radius_range(params)
    lo, hi = float(r_lo) + 1e-6, float(r_hi) - 1e-6
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if float(critical_orbit(jnp.float64(mid), params)[0]) > 0.0:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


@jax.jit
def _run_kerr(u):
    """One face-on (on-axis camera) ray at image-plane offset u for
    a = 0.9: status, crossing count, and the (t, r_bl) of its first 10
    equatorial crossings.  On-axis rays have L_z = x p_y - y p_x = 0
    exactly, so the near-critical ones wind onto the polar shell orbit."""
    obs = jnp.array([0.0, 0.0, 30.0])
    pix = jnp.stack([jnp.atleast_1d(u), jnp.zeros(1),
                     jnp.full((1,), 24.0)], axis=-1)
    q0, p0, _ = cartesian_ics_from_pixels(obs, pix, params=KERR_FAST,
                                          g_inv_fn=METRICS["KerrSchild"])
    _, _, status, _, hq, hp, count = integrate_batch_subrings(
        q0, p0, 300_000, 0.02, KERR_FAST, 31.0, 0.0, n_orders=10,
        order=4)
    q_bl = jax.vmap(lambda qq, pp: bl_from_ks(qq, pp, KERR_FAST)[0])(
        hq[:, 0], hp[:, 0])
    t_off = jax.vmap(
        lambda rr: bl_time_azimuth_offsets(rr, KERR_FAST)[0])(q_bl[:, 1])
    return status[0], count[0], q_bl[:, 0] - t_off, q_bl[:, 1]


@pytest.fixture(scope="module")
def kerr_pred():
    r_polar = _polar_shell_radius(KERR_FAST)
    gam, dt, dphi, xi, k_const = critical_parameters(
        jnp.float64(r_polar), KERR_FAST)
    assert abs(float(xi)) < 1e-10
    return {"r": r_polar, "gamma": float(gam), "dt": float(dt),
            "eta": float(k_const)}


@pytest.fixture(scope="module")
def u_crit_kerr():
    """Bisected capture/escape boundary of the face-on a = 0.9 fan."""
    lo, hi = 0.80, 0.92
    s_lo, _, _, _ = _run_kerr(jnp.float64(lo))
    s_hi, _, _, _ = _run_kerr(jnp.float64(hi))
    # STATUS: 0 alive / 1 captured / 2 escaped (engine/integrate.py)
    assert int(s_lo) == 1 and int(s_hi) == 2, "bracket invalid"
    for _ in range(45):
        mid = 0.5 * (lo + hi)
        s, _, _, _ = _run_kerr(jnp.float64(mid))
        if int(s) == 2:
            hi = mid
        else:
            lo = mid
    return hi


def test_kerr_crossing_gaps_match_predicted_delay(kerr_pred,
                                                  u_crit_kerr):
    """BL-time gaps between deep consecutive crossings = delta_t of the
    polar shell orbit, and the deep crossings sit AT its BL radius."""
    s, c, t_bl, r_bl = _run_kerr(jnp.float64(u_crit_kerr + 1e-10))
    assert int(c) >= 5, f"expected >= 5 crossings, got {int(c)}"
    t_bl, r_bl = np.asarray(t_bl), np.asarray(r_bl)
    # crossings converge onto the shell at rate e^{-gamma} per half
    # orbit; [1] is still approaching (~0.06 out), [2] and [3] are deep
    assert abs(r_bl[2] - kerr_pred["r"]) < 0.02
    assert abs(r_bl[3] - kerr_pred["r"]) < 0.02
    gap23 = t_bl[2] - t_bl[3]
    gap34 = t_bl[3] - t_bl[4]
    assert abs(gap23 / kerr_pred["dt"] - 1.0) < 5e-3
    assert abs(gap34 / kerr_pred["dt"] - 1.0) < 5e-3


def test_kerr_order_bands_shrink_by_predicted_lyapunov(kerr_pred,
                                                       u_crit_kerr):
    """Outer edges of the count >= n image-order bands shrink
    geometrically with ratio e^{gamma(polar)} — gamma measured by the
    production KS integrator, predicted by three AD evaluations."""
    def count_at(u):
        _, c, _, _ = _run_kerr(jnp.float64(u))
        return int(c)

    edges = {}
    for n in (3, 4, 5):
        lo, hi = u_crit_kerr, 1.10
        for _ in range(50):
            mid = 0.5 * (lo + hi)
            if count_at(mid) >= n:
                lo = mid
            else:
                hi = mid
        edges[n] = lo - u_crit_kerr
    ratio_pred = float(np.exp(kerr_pred["gamma"]))
    r34 = edges[3] / edges[4]
    r45 = edges[4] / edges[5]
    # both deep ratios in the asymptotic window around e^gamma
    assert abs(r34 / ratio_pred - 1.0) < 0.2, (r34, ratio_pred)
    assert abs(r45 / ratio_pred - 1.0) < 0.35, (r45, ratio_pred)
