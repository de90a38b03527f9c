"""Equatorial circular orbits in Kerr-like metrics with a mass function.

Rotating-regular twin of physics/orbits.py (which inverts the tested
``kerr_g_inv``): every quantity here is derived from the covariant
Boyer-Lindquist metric block of the mass-function family

    g_tt   = -(1 - 2 m(r)/r)            (equatorial Sigma = r^2)
    g_tph  = -2 a m(r)/r
    g_phph = r^2 + a^2 + 2 a^2 m(r)/r

by AUTODIFF of the standard circular-geodesic formulas — no per-family
closed forms:

    Omega = (-g_tph,r +- sqrt(g_tph,r^2 - g_tt,r g_phph,r)) / g_phph,r
    u^t   = 1/sqrt(-(g_tt + 2 Omega g_tph + Omega^2 g_phph))
    E     = -(g_tt + Omega g_tph) u^t,   L = (g_tph + Omega g_phph) u^t

The ISCO is the minimum of E(r) on the circular branch (equivalently of
L; both are stationary exactly at marginal stability), located by the
same scan+bisection pattern as physics/static_orbits.isco_static.

Oracle chain (tests/test_rotating_disk.py): with m(r) = M - Q^2/(2r)
these formulas must reproduce the INDEPENDENT Kerr-Newman layer
(physics/orbits.py) exactly — Omega, E, L, redshift and the ISCO; with
m = M they reduce to Kerr (Bardeen-Press-Teukolsky ISCO closed form);
at a = 0 they match physics/static_orbits on the shared static family.

This module powers thin-disk rendering around the rotating regular
families (engine/disk.py with metric='RotatingBardeen'/'RotatingHayward').
No reference counterpart (Schwarzschild-only reference).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotating_regular import MASS_FN


def bl_equatorial_metric(r, params, m_fn):
    """(g_tt, g_tph, g_phph) of the equatorial BL block."""
    a = params[1]
    m = m_fn(r, params)
    return (-(1.0 - 2.0 * m / r),
            -2.0 * a * m / r,
            r * r + a * a + 2.0 * a * a * m / r)


def keplerian_omega_rotating(r, params, m_fn, prograde=True):
    """Coordinate angular velocity of the circular equatorial geodesic,
    from the metric-derivative quadratic (prograde = the + branch for
    a >= 0)."""
    d_tt, d_tph, d_phph = [
        jax.grad(lambda rr, i=i: bl_equatorial_metric(rr, params,
                                                      m_fn)[i])(r)
        for i in range(3)]
    disc = jnp.sqrt(jnp.maximum(d_tph * d_tph - d_tt * d_phph, 0.0))
    sign = 1.0 if prograde else -1.0
    return (-d_tph + sign * disc) / d_phph


def circular_u_t_rotating(r, params, m_fn, prograde=True):
    """(u^t, Omega) of the circular geodesic at BL radius r."""
    omega = keplerian_omega_rotating(r, params, m_fn, prograde)
    g_tt, g_tph, g_phph = bl_equatorial_metric(r, params, m_fn)
    norm = -(g_tt + 2.0 * omega * g_tph + omega * omega * g_phph)
    return 1.0 / jnp.sqrt(norm), omega


def circular_e_l_rotating(r, params, m_fn, prograde=True):
    """Killing charges (E = -u_t, L = u_phi) of the circular geodesic."""
    u_t, omega = circular_u_t_rotating(r, params, m_fn, prograde)
    g_tt, g_tph, g_phph = bl_equatorial_metric(r, params, m_fn)
    energy = -(g_tt + omega * g_tph) * u_t
    l_z = (g_tph + omega * g_phph) * u_t
    return energy, l_z


def _photon_orbit_radius(params, m_fn, prograde=True, iters=60):
    """Equatorial circular photon orbit: where the circular-geodesic
    normalization -(g_tt + 2 W g_tph + W^2 g_phph) crosses zero (u^t
    diverges).  Bisection on an inward scan from 4M."""
    mass = params[0]

    def norm(r):
        omega = keplerian_omega_rotating(r, params, m_fn, prograde)
        g_tt, g_tph, g_phph = bl_equatorial_metric(r, params, m_fn)
        return -(g_tt + 2.0 * omega * g_tph + omega * omega * g_phph)

    rs = jnp.linspace(4.0 * mass, 0.3 * mass, 256)
    vals = jax.vmap(norm)(rs)
    neg = ~(vals > 0.0)                       # inside/at the photon orbit
    has = jnp.any(neg)
    idx = jnp.argmax(neg)
    lo = rs[idx]
    hi = rs[jnp.maximum(idx - 1, 0)]

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        inside = ~(norm(mid) > 0.0)
        return jnp.where(inside, mid, lo), jnp.where(inside, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo, hi))
    return jnp.where(has, 0.5 * (lo + hi), 0.3 * mass)


def isco_rotating(params, m_fn, prograde=True, n_scan=512, iters=60):
    """ISCO of the mass-function family: the minimum of E(r) outside the
    circular photon orbit, by geometric scan + fixed-count bisection on
    dE/dr (same robust pattern as static_orbits.isco_static; Newton's
    basin collapses near the joint criticality curve).  NaN when no
    stable circular orbit exists."""
    mass = params[0]
    r_ph = _photon_orbit_radius(params, m_fn, prograde)
    de = jax.grad(lambda r: circular_e_l_rotating(r, params, m_fn,
                                                  prograde)[0])

    u = jnp.linspace(0.0, 1.0, n_scan)
    r_lo = r_ph * 1.02
    rs = r_lo * (40.0 * mass / r_lo) ** u
    sl = jax.vmap(de)(rs)
    want = (sl[:-1] < 0.0) & (sl[1:] > 0.0)
    has = jnp.any(want)
    idx = jnp.argmax(want)
    lo, hi = rs[idx], rs[idx + 1]

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        neg = de(mid) < 0.0
        return jnp.where(neg, mid, lo), jnp.where(neg, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo, hi))
    return jnp.where(has, 0.5 * (lo + hi), jnp.nan)


def static_observer_u_t_rotating(r, theta, params, m_fn):
    """u^t of the static observer at BL (r, theta): 1/sqrt(-g_tt) with
    g_tt = -(1 - 2 m(r) r / Sigma)."""
    a = params[1]
    m = m_fn(r, params)
    sigma = r * r + a * a * jnp.cos(theta) ** 2
    return 1.0 / jnp.sqrt(1.0 - 2.0 * m * r / sigma)


def redshift_factor_rotating(energy, l_z, r_em, r_obs, params, m_fn,
                             prograde=True, theta_obs=jnp.pi / 2):
    """g = nu_obs/nu_em for a photon with Killing charges (E, L_z)
    emitted by the circular equatorial geodesic at r_em, received by a
    static observer at (r_obs, theta_obs) — the mass-function twin of
    orbits.redshift_factor (static receiver leg)."""
    u_t_em, omega = circular_u_t_rotating(r_em, params, m_fn, prograde)
    u_t_obs = static_observer_u_t_rotating(r_obs, theta_obs, params, m_fn)
    return (energy * u_t_obs) / (u_t_em * (energy - omega * l_z))


def page_thorne_flux_rotating(r_grid, params, m_fn, prograde=True):
    """Novikov-Thorne flux for the mass-function family — the Page &
    Thorne (1974) eq. (11b) quadrature with the autodiff circular-orbit
    quantities above and the proper-area measure
    sqrt(-det g3) = sqrt(g_rr (g_tt g_phph - g_tph^2)) computed from the
    covariant block (g_rr = r^2/Delta equatorially)."""
    a = params[1]

    def eol(r):
        e, l = circular_e_l_rotating(r, params, m_fn, prograde)
        return e, l, keplerian_omega_rotating(r, params, m_fn, prograde)

    e, l, omega = jax.vmap(eol)(r_grid)
    dl_dr = jax.vmap(jax.grad(
        lambda r: circular_e_l_rotating(r, params, m_fn, prograde)[1]))(
        r_grid)
    domega_dr = jax.vmap(jax.grad(
        lambda r: keplerian_omega_rotating(r, params, m_fn, prograde)))(
        r_grid)

    def sqrt_g3(r):
        g_tt, g_tph, g_phph = bl_equatorial_metric(r, params, m_fn)
        delta = r * r - 2.0 * m_fn(r, params) * r + a * a
        g_rr = r * r / delta
        return jnp.sqrt(jnp.maximum(
            -g_rr * (g_tt * g_phph - g_tph * g_tph), 1e-30))

    integrand = (e - omega * l) * dl_dr
    dr = jnp.diff(r_grid)
    segments = 0.5 * (integrand[1:] + integrand[:-1]) * dr
    cumulative = jnp.concatenate([jnp.zeros((1,), r_grid.dtype),
                                  jnp.cumsum(segments)])
    g3 = jax.vmap(sqrt_g3)(r_grid)
    flux = (-domega_dr * cumulative
            / ((e - omega * l) ** 2 * 4.0 * jnp.pi * g3))
    return jnp.maximum(flux, 0.0)


def rotating_disk_inner_edge(metric, mass, spin, p1, prograde=True):
    """Host-side ISCO for DiskConfig routing; raises when the family has
    no stable circular orbits at these parameters."""
    import numpy as np
    params = jnp.array([mass, spin, p1], jnp.result_type(float))
    r = float(isco_rotating(params, MASS_FN[metric], prograde))
    if not np.isfinite(r):
        raise ValueError(
            f"{metric} at (a, p) = ({spin:g}, {p1:g}) has no stable "
            "circular orbits — pass an explicit disk r_in")
    return r


def rotating_bl_g_inv(q, params, m_fn):
    """Contravariant Boyer-Lindquist metric of the mass-function family
    at q = (t, r, theta, phi) — spacetime.kerr_g_inv with
    Delta = r^2 - 2 m(r) r + a^2 and the identity
    r^2 + a^2 - Delta = 2 m(r) r in the frame-dragging cross term.
    Used by the epicyclic observables (the ray tracer itself runs the
    horizon-regular Kerr-Schild chart, physics/rotating_regular.py)."""
    a = params[1]
    r, th = q[1], q[2]
    m = m_fn(r, params)
    sin_th = jnp.sin(th)
    cos_th = jnp.cos(th)
    sin2 = sin_th * sin_th
    sigma = r * r + a * a * cos_th * cos_th
    delta = r * r - 2.0 * m * r + a * a
    r2a2 = r * r + a * a

    inv_sd = 1.0 / (sigma * delta)
    g_tt = -(r2a2 * r2a2 - a * a * delta * sin2) * inv_sd
    g_tp = -(r2a2 - delta) * a * inv_sd
    g_rr = delta / sigma
    g_thth = 1.0 / sigma
    g_pp = (delta - a * a * sin2) * inv_sd / sin2

    return jnp.array([
        [g_tt, 0.0, 0.0, g_tp],
        [0.0, g_rr, 0.0, 0.0],
        [0.0, 0.0, g_thth, 0.0],
        [g_tp, 0.0, 0.0, g_pp],
    ])


def epicyclic_rotating(r, params, m_fn, prograde=True):
    """(Omega_phi, kappa, Omega_theta) of the mass-function family —
    physics/epicyclic.epicyclic_frequencies generalized: the same
    radial/polar-potential second derivatives by jax.grad, with the
    circular-orbit Killing charges from this module's autodiff algebra
    and the BL g_inv above.  Unlike the static families, rotation keeps
    Omega_theta != Omega_phi (Lense-Thirring nodal precession survives
    the regular core — its magnitude is the discriminator between a
    spinning regular hole and Kerr)."""
    r = jnp.asarray(r)
    half_pi = jnp.full_like(r, 0.5 * jnp.pi)
    energy, l_z = circular_e_l_rotating(r, params, m_fn, prograde)
    u_t, omega = circular_u_t_rotating(r, params, m_fn, prograde)

    def w_quad(rr, th):
        zero = jnp.zeros_like(rr)
        g = rotating_bl_g_inv(jnp.stack([zero, rr, th, zero]), params,
                              m_fn)
        return (g[0, 0] * energy * energy
                - 2.0 * g[0, 3] * energy * l_z
                + g[3, 3] * l_z * l_z)

    def rad_pot(rr):
        zero = jnp.zeros_like(rr)
        g = rotating_bl_g_inv(jnp.stack([zero, rr, 0.5 * jnp.pi + zero,
                                         zero]), params, m_fn)
        return -g[1, 1] * (1.0 + w_quad(rr, 0.5 * jnp.pi + zero))

    def pol_pot(th):
        g = rotating_bl_g_inv(jnp.stack([jnp.zeros_like(th), r + 0.0 * th,
                                         th, jnp.zeros_like(th)]), params,
                              m_fn)
        return -g[2, 2] * (1.0 + w_quad(r + 0.0 * th, th))

    kappa2 = -0.5 * jax.grad(jax.grad(rad_pot))(r) / (u_t * u_t)
    vert2 = -0.5 * jax.grad(jax.grad(pol_pot))(half_pi) / (u_t * u_t)
    return (jnp.abs(omega), jnp.sqrt(jnp.maximum(kappa2, 0.0)),
            jnp.sqrt(jnp.maximum(vert2, 0.0)))
