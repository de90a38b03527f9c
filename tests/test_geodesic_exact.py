"""Semi-analytic geodesics vs closed forms, the production integrator,
and the photon-shell theory.

Four independent anchors:

  1. the t/phi Mino-speed splits really separate (their sum rebuilds
     Sigma p^t / Sigma p^phi at arbitrary (r, theta) — Kerr AND KN);
  2. the Schwarzschild radial turning point satisfies its closed form
     r^3/(r - 2M) = b^2;
  3. full-record parity with the production Kerr-Schild integrator at
     a = 0.9 and (a, Q) = (0.6, 0.5): every equatorial-crossing (r, t,
     phi) agrees to the integrator's truncation floor (~1e-5), with the
     tracer's backward-time momenta mapped through e_sign and the
     lambda = 0 pole-passage pi-jump asserted explicitly as the
     documented limitation;
  4. integrator-free consistency with physics/photon_shell.py: the
     exact solver's deep crossings of a bisected near-critical ray
     converge onto the shell radius geometrically at the PREDICTED
     e^{-gamma}, and its per-half-orbit (tau, t, phi) leg triple at the
     critical parameters equals critical_parameters' quadrature to
     1e-9 — two different integral paths, one theory (Gralla &
     Lupsasca 2020 closed forms are what both replace).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.engine.hotspot import bl_time_azimuth_offsets
from grtrace.engine.subring import integrate_batch_subrings
from grtrace.physics.camera import (cartesian_ics_from_pixels,
                                    pixel_grid_lookat)
from grtrace.physics.geodesic_exact import (_leg_r, _leg_theta,
                                            _sigma_pt_pphi,
                                            crossing_table,
                                            radial_potential,
                                            radial_turning,
                                            t_phi_r_parts,
                                            t_phi_theta_parts)
from grtrace.physics.photon_shell import (_theta_turning, critical_orbit,
                                          critical_parameters)
from grtrace.physics.polarization import bl_from_ks
from grtrace.physics.spacetime import METRICS

KERR = jnp.array([1.0, 0.9, 0.0])
KERR_NEWMAN = jnp.array([1.0, 0.6, 0.5])
SCHW = jnp.array([1.0, 0.0, 0.0])


# ----------------------------------------------------------- anchors 1-2

@pytest.mark.parametrize("params", [KERR, KERR_NEWMAN],
                         ids=["a0.9", "a0.6q0.5"])
def test_t_phi_splits_separate(params):
    rs = jnp.array([2.1, 3.7, 8.0, 25.0])
    ths = jnp.array([0.3, 0.9, 1.3, 0.5 * jnp.pi])
    lam = 2.7
    for r in rs:
        for th in ths:
            t_full, p_full = _sigma_pt_pphi(r, th, lam, params)
            t_r, p_r = t_phi_r_parts(r, lam, params)
            t_th, p_th = t_phi_theta_parts(th, lam, params)
            assert abs(float(t_full - (t_r + t_th))) < 1e-10
            assert abs(float(p_full - (p_r + p_th))) < 1e-10
            # r_ref independence of the theta halves
            t2, p2 = t_phi_theta_parts(th, lam, params, r_ref=47.0)
            assert abs(float(t_th - t2)) < 1e-10
            assert abs(float(p_th - p2)) < 1e-10


def test_schwarzschild_turning_closed_form():
    """r4^3 / (r4 - 2M) = b^2 = lam^2 + eta (the photon effective
    potential's textbook turning condition)."""
    for b2 in (30.0, 50.0, 200.0):
        has, r4 = radial_turning(jnp.float64(1.0),
                                 jnp.float64(b2 - 1.0), SCHW, 30.0)
        assert bool(has)
        lhs = float(r4) ** 3 / (float(r4) - 2.0)
        assert abs(lhs - b2) < 1e-7 * b2
    # below the critical b^2 = 27: plunging, no turning point
    has, _ = radial_turning(jnp.float64(1.0), jnp.float64(25.0), SCHW,
                            30.0)
    assert not bool(has)


# ------------------------------------------------------------- anchor 3

def _camera_rays(params, idx, elev=0.4, size=7):
    obs = jnp.array([30.0 * np.cos(elev), 0.0, 30.0 * np.sin(elev)])
    pix = pixel_grid_lookat(obs, jnp.float64(np.deg2rad(40.0)), size,
                            size, dtype=jnp.float64)
    q0, p0, _ = cartesian_ics_from_pixels(obs, pix.reshape(-1, 3),
                                          params=params,
                                          g_inv_fn=METRICS["KerrSchild"])
    return q0[idx], p0[idx]


@pytest.mark.parametrize("params", [KERR, KERR_NEWMAN],
                         ids=["a0.9", "a0.6q0.5"])
def test_crossing_parity_with_integrator(params):
    """Every valid exact crossing record matches the 300k-step order-4
    KS integrator's: r to 1e-4, t to 1e-4, phi to 1e-5 (lam != 0) /
    exactly pi apart (lam = 0 pole passage — BL-chart winding the
    Cartesian integrator sees and the 1-D quadrature cannot)."""
    idx = jnp.array([10, 30, 16, 38])
    q0, p0 = _camera_rays(params, idx)
    _, _, _, _, hq, hp, count = integrate_batch_subrings(
        q0, p0, 300_000, 0.02, params, 31.0, 0.0, n_orders=6, order=4)
    tab = crossing_table(q0, p0, params, n_orders=3)

    t_of = lambda rr: bl_time_azimuth_offsets(rr, params)[0]
    phi_of = lambda rr: bl_time_azimuth_offsets(rr, params)[1]
    qb0 = jax.vmap(lambda qq, pp: bl_from_ks(qq, pp, params)[0])(q0, p0)

    checked = 0
    for i in range(len(idx)):
        n = min(int(count[i]), 3)
        if n == 0:
            continue
        qb = jax.vmap(lambda qq, pp: bl_from_ks(qq, pp, params)[0])(
            hq[:n, i], hp[:n, i])
        r_int = np.asarray(qb[:, 1])
        t_int = (np.asarray(qb[:, 0])
                 - np.asarray(jax.vmap(t_of)(qb[:, 1]))
                 + float(t_of(qb0[i, 1])))
        phi_int = (np.asarray(qb[:, 3])
                   - np.asarray(jax.vmap(phi_of)(qb[:, 1]))
                   + float(phi_of(qb0[i, 1])) - float(qb0[i, 3]))
        es = float(np.asarray(tab["e_sign"])[i])
        lam = float(np.asarray(tab["lam"])[i])
        valid = np.asarray(tab["valid"])[i][:n]
        assert valid.all(), (i, valid)
        dr = np.abs(np.asarray(tab["r"])[i][:n] - r_int)
        dt = np.abs(es * np.asarray(tab["t"])[i][:n] - t_int)
        dphi = np.asarray(es * np.asarray(tab["phi"])[i][:n] - phi_int)
        dphi = np.abs(np.mod(dphi + np.pi, 2.0 * np.pi) - np.pi)
        assert dr.max() < 1e-4, (i, dr)
        assert dt.max() < 1e-4, (i, dt)
        if abs(lam) > 1e-12:
            assert dphi.max() < 1e-5, (i, dphi)
        else:
            # pole passage: every crossing alternates hemispheres of
            # the orbital plane — exactly pi off, or exactly aligned
            off = np.minimum(dphi, np.abs(dphi - np.pi))
            assert off.max() < 1e-5, (i, dphi)
        checked += n
    assert checked >= 5


@pytest.mark.parametrize("params", [KERR, KERR_NEWMAN],
                         ids=["a0.9", "a0.6q0.5"])
def test_escape_state_parity_with_integrator(params):
    """Boundary-sphere escape records vs the order-4 KS integrator,
    meeting it at ITS recorded stop radius: BL (theta, phi, t) agree to
    the integrator's truncation floor.  Covers both polar senses and a
    near-diagonal ray (lam != 0)."""
    from grtrace.engine.hotspot import bl_time_azimuth_offsets
    from grtrace.engine.integrate_generic import integrate_batch_generic
    from grtrace.physics.geodesic_exact import escape_state

    idx = jnp.array([3, 12, 38, 44])
    q0, p0 = _camera_rays(params, idx)
    fq, fp, status, _ = integrate_batch_generic(
        q0, p0, 300_000, 0.005, params, 31.0, 0.0, order=4,
        metric="KerrSchild")
    assert (np.asarray(status) == 2).all()   # all escaped
    qb1 = jax.vmap(lambda qq, pp: bl_from_ks(qq, pp, params)[0])(fq, fp)
    qb0 = jax.vmap(lambda qq, pp: bl_from_ks(qq, pp, params)[0])(q0, p0)
    es = escape_state(q0, p0, params, np.asarray(qb1[:, 1]))
    assert np.asarray(es["escaped"]).all()
    e_sign = np.asarray(es["e_sign"])

    # bl_from_ks keeps the KS time/azimuth (they differ from BL by the
    # pure-r offsets T, Phi — polarization._ks_chart_geometry): the
    # tracer's recorded gains are KS-chart, the exact solver's BL
    offs = jax.vmap(
        lambda r: jnp.stack(bl_time_azimuth_offsets(r, params)))
    (t1_o, p1_o), (t0_o, p0_o) = (np.asarray(offs(qb1[:, 1])).T,
                                  np.asarray(offs(qb0[:, 1])).T)
    dth = np.abs(np.asarray(es["theta"]) - np.asarray(qb1[:, 2]))
    dphi = (e_sign * np.asarray(es["phi"]) + (p1_o - p0_o)
            - np.asarray(qb1[:, 3] - qb0[:, 3]))
    dphi = np.abs(np.mod(dphi + np.pi, 2.0 * np.pi) - np.pi)
    dt = np.abs(e_sign * np.asarray(es["t"]) + (t1_o - t0_o)
                - np.asarray(qb1[:, 0] - qb0[:, 0]))
    assert dth.max() < 1e-6, dth
    assert dphi.max() < 1e-6, dphi
    assert dt.max() < 1e-5, dt


def test_escape_state_shadow_verdict_is_bardeen():
    """escaped/captured from the radial potential must reproduce the
    closed-form Bardeen critical impact parameter along one image row:
    bisect the escape boundary with escape_state and compare to the
    analytic shadow edge (engine.shadow's gauge study pins the KS
    camera's apparent-size convention; here both sides ARE the same
    solver family, so the match is tight)."""
    from grtrace.physics.geodesic_exact import (escape_state,
                                                radial_turning)

    # equatorial Schwarzschild: capture iff b < 3 sqrt(3) M
    for b2, want in ((26.9, False), (27.1, True)):
        has, _ = radial_turning(jnp.float64(0.0), jnp.float64(b2),
                                SCHW, 30.0)
        assert bool(has) is want


# ------------------------------------------------------------- anchor 4

def test_half_orbit_triple_matches_photon_shell():
    """At the critical (xi, eta) of shell radius r~, the exact solver's
    leg quadratures reproduce critical_parameters' (T_half, delta_t,
    delta_phi): theta legs give the polar parts, T_r/P_r(r~) times the
    Mino half-period give the radial parts (r frozen at r~ on the
    shell).  Different substitutions, same integrals."""
    r_t = jnp.float64(2.8)
    xi, eta = critical_orbit(r_t, KERR)
    gam, dt_ref, dphi_ref, _, _ = critical_parameters(r_t, KERR)
    th_minus = _theta_turning(xi, eta, KERR)
    g_half, t_th, phi_th = [2.0 * v for v in _leg_theta(
        th_minus, 0.5 * jnp.pi, th_minus, xi, eta, KERR)]
    t_r, p_r = t_phi_r_parts(r_t, xi, KERR)
    assert abs(float(t_th + t_r * g_half) - float(dt_ref)) < 1e-9
    assert abs(float(phi_th + p_r * g_half) - float(dphi_ref)) < 1e-9


def test_deep_crossings_converge_at_predicted_lyapunov():
    """Bisect the capture boundary on one image-plane column with the
    EXACT solver only (no stepping), then watch its deep crossing radii
    converge onto the shell geometrically: |r_k - r~| ratios must hit
    e^{-gamma} of the matching shell orbit.  Everything here is
    quadrature — depth the integrator's truncation floor can't reach.
    """
    params = KERR
    elev = 0.4
    obs = jnp.array([30.0 * np.cos(elev), 0.0, 30.0 * np.sin(elev)])

    @jax.jit
    def table_at(u):
        pix = jnp.stack([jnp.atleast_1d(24.0 * jnp.cos(elev) - u *
                                        jnp.sin(elev) * 0.0),
                         jnp.atleast_1d(u),
                         jnp.atleast_1d(24.0 * jnp.sin(elev))], axis=-1)
        # column through the camera axis, offset u along +y (so lam
        # varies and stays off zero)
        q0, p0, _ = cartesian_ics_from_pixels(
            obs, pix, params=params, g_inv_fn=METRICS["KerrSchild"])
        return crossing_table(q0, p0, params, n_orders=8)

    lo, hi = 0.3, 6.0   # lo off-center: u = 0 is the radial eta = 0 ray
    t_lo = table_at(jnp.float64(lo))
    t_hi = table_at(jnp.float64(hi))
    assert bool(np.asarray(t_lo["captured"])[0])
    assert not bool(np.asarray(t_hi["captured"])[0])
    for _ in range(48):
        mid = 0.5 * (lo + hi)
        if bool(np.asarray(table_at(jnp.float64(mid))["captured"])[0]):
            lo = mid
        else:
            hi = mid

    tab = table_at(jnp.float64(hi))           # just-escaping ray
    lam = float(np.asarray(tab["lam"])[0])
    # shell radius shadowed: xi(r~) = lam
    from grtrace.physics.photon_shell import shell_radius_range
    r_lo_s, r_hi_s = shell_radius_range(params)
    slo, shi = float(r_lo_s) + 1e-9, float(r_hi_s) - 1e-9
    for _ in range(60):
        smid = 0.5 * (slo + shi)
        if float(critical_orbit(jnp.float64(smid), params)[0]) > lam:
            slo = smid
        else:
            shi = smid
    r_shell = 0.5 * (slo + shi)
    gam = float(critical_parameters(jnp.float64(r_shell), params)[0])

    valid = np.asarray(tab["valid"])[0]
    r_k = np.asarray(tab["r"])[0]
    depth = np.abs(r_k - r_shell)
    # orders 2..4: asymptotic yet above the ~3e-14 r-bisection floor
    # (depth[5] ~ 1e-13 already sits ON the floor — measured)
    assert valid[:5].all()
    ratios = depth[2:4] / depth[3:5]
    assert np.all(np.abs(np.log(ratios) - gam) < 1e-2), (ratios,
                                                         np.exp(gam))
