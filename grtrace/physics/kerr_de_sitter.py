"""Kerr-de Sitter: a spinning black hole in an expanding universe.

Completes the model-family matrix (spin x charge x cosmological constant
x regular cores): the Carter (1968) solution with both rotation and
Lambda, in Boyer-Lindquist-like coordinates,

    Delta_r  = (r^2 + a^2)(1 - Lambda r^2/3) - 2 M r
    Delta_th = 1 + (Lambda a^2/3) cos^2(theta)
    chi      = 1 + Lambda a^2/3
    Sigma    = r^2 + a^2 cos^2(theta)

with the contravariant metric read off the separated Hamiltonian

    g^{ab} p_a p_b = (1/Sigma) [ -chi^2/Delta_r ((r^2+a^2) p_t + a p_phi)^2
                     + chi^2/(Delta_th sin^2 th) (a sin^2 th p_t + p_phi)^2
                     + Delta_r p_r^2 + Delta_th p_th^2 ].

Exact limits (pinned in tests/test_kerr_de_sitter.py): Lambda -> 0
reduces to spacetime.kerr_g_inv component-for-component; a -> 0 to
static_metrics.kottler_g_inv.  Delta_r is a QUARTIC with (for
sub-critical parameters) three positive roots r_- < r_+ < r_c: inner /
outer black-hole horizons and the cosmological horizon.  The capture
surface is r_+ (the -/+ sign change of Delta_r going outward); scenes
must keep their boundary sphere well inside r_c, where the static
coordinates freeze (same constraint as Kottler, cli/args.py).

Rides the generic autodiff engine on the spherical chart with the
standard BL blow-up guard — no new kernels, no hand-derived Christoffel
symbols anywhere.  No reference counterpart (Schwarzschild-only
reference, simulation/cuda_geodesic.py:432-447).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kds_functions(r, th, params):
    """(Delta_r, Delta_th, chi, Sigma) at (r, theta);
    params = (M, a, Lambda)."""
    mass, a, lam = params[0], params[1], params[2]
    cos2 = jnp.cos(th) ** 2
    sigma = r * r + a * a * cos2
    delta_r = (r * r + a * a) * (1.0 - lam * r * r / 3.0) - 2.0 * mass * r
    delta_th = 1.0 + (lam * a * a / 3.0) * cos2
    chi = 1.0 + lam * a * a / 3.0
    return delta_r, delta_th, chi, sigma


def kerr_de_sitter_g_inv(q, params):
    """Contravariant Kerr-de Sitter metric at q = (t, r, theta, phi);
    params = (M, a, Lambda)."""
    r, th = q[1], q[2]
    a = params[1]
    delta_r, delta_th, chi, sigma = kds_functions(r, th, params)
    sin2 = jnp.sin(th) ** 2
    r2a2 = r * r + a * a
    chi2 = chi * chi

    # quadratic-form coefficients of the separated Hamiltonian
    g_tt = chi2 * (-r2a2 * r2a2 / delta_r + a * a * sin2 / delta_th) / sigma
    g_tp = chi2 * a * (-r2a2 / delta_r + 1.0 / delta_th) / sigma
    g_pp = chi2 * (-a * a / delta_r + 1.0 / (delta_th * sin2)) / sigma
    g_rr = delta_r / sigma
    g_thth = delta_th / sigma

    zero = jnp.zeros_like(r)
    return jnp.array([
        [g_tt, zero, zero, g_tp],
        [zero, g_rr, zero, zero],
        [zero, zero, g_thth, zero],
        [g_tp, zero, zero, g_pp],
    ])


def _delta_r(r, params):
    mass, a, lam = params[0], params[1], params[2]
    return (r * r + a * a) * (1.0 - lam * r * r / 3.0) - 2.0 * mass * r


def kds_outer_horizon(params, n_scan=1024, iters=60):
    """Outer BLACK-HOLE horizon r_+: the -/+ sign change of Delta_r on
    the way out (Delta_r > 0 near r = 0 thanks to the a^2 term, negative
    between r_- and r_+, positive again out to the cosmological horizon).
    Scan + fixed-count bisection; NaN when Delta_r never dips negative
    (no black-hole horizon: over-spun or Lambda-merged)."""
    mass = params[0]
    rs = jnp.linspace(1e-3 * mass, 2.5 * mass, n_scan)
    dv = jax.vmap(lambda r: _delta_r(r, params))(rs)
    neg = dv < 0.0
    has = jnp.any(neg)
    # LAST negative scan point: its right neighbour is outside r_+
    idx = (n_scan - 1) - jnp.argmax(neg[::-1])
    lo = rs[idx]                                # Delta_r(lo) < 0
    hi = rs[jnp.minimum(idx + 1, n_scan - 1)]   # Delta_r(hi) > 0

    def bisect(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        inside = _delta_r(mid, params) < 0.0
        return jnp.where(inside, mid, lo), jnp.where(inside, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo, hi))
    return jnp.where(has, 0.5 * (lo + hi), jnp.nan)


def kds_cosmological_horizon(params, iters=60):
    """Cosmological horizon r_c: the outermost positive root of Delta_r
    (+/- sign change beyond r_+); NaN for Lambda <= 0."""
    mass, a, lam = params[0], params[1], params[2]
    lam_safe = jnp.maximum(lam, 1e-30)
    hi0 = 2.0 * jnp.sqrt(3.0 / lam_safe)       # Delta_r < 0 far out
    lo0 = 3.0 * mass                           # outside r_+, inside r_c

    def bisect(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        pos = _delta_r(mid, jnp.stack([mass, a, lam_safe])) > 0.0
        return jnp.where(pos, mid, lo), jnp.where(pos, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo0, hi0))
    return jnp.where(lam > 0.0, 0.5 * (lo + hi), jnp.nan)


def kds_capture_radius(params):
    """Capture shell for the generic integrator: the BL-chart 1.1 factor
    over r_+ (cf. integrate_generic._capture_radius for 'Kerr'), or a
    small floor when no black-hole horizon exists."""
    r_h = kds_outer_horizon(params)
    return jnp.where(jnp.isnan(r_h), 1e-2 * params[0], 1.1 * r_h)


def kds_escape_pred(q0s, p0s, params, n_grid=192, iters=30):
    """Exact conserved-quantity escape predicate for Kerr-de Sitter —
    the BL-chart Bardeen rescue generalized to Lambda != 0.

    The separated Hamiltonian (module docstring) gives the Carter
    bracket at the camera event,

        K = Delta_th p_th^2 + chi^2 (a sin(th) p_t + p_phi/sin(th))^2
            / Delta_th,

    and the radial potential (Delta_r p_r)^2 = R(r) =
    chi^2 ((r^2+a^2) p_t + a p_phi)^2 - Delta_r K.  A backward camera
    ray escapes iff R has a turning point in (r_+, r0): coarse grid +
    golden-section refinement, exactly the mass-function rescue's
    pattern (physics/rotating_regular.escape_pred_rotating).  Reduces to
    the Kerr-Newman quartic predicate at Lambda = 0 (chi = Delta_th = 1),
    settling the BL polar-stripe explosions identically.  Returns False
    everywhere when no black-hole horizon exists."""
    a = params[1]
    r0 = q0s[:, 1]
    th = q0s[:, 2]
    p_t, p_th, p_ph = p0s[:, 0], p0s[:, 2], p0s[:, 3]
    _, delta_th, chi, _ = kds_functions(r0, th, params)
    sin_th = jnp.sin(th)
    K = (delta_th * p_th * p_th
         + chi * chi * (a * sin_th * p_t + p_ph / sin_th) ** 2 / delta_th)

    r_h = kds_outer_horizon(params)
    has_horizon = jnp.isfinite(r_h)
    r_lo = jnp.where(has_horizon, r_h, 0.5 * params[0]) + 1e-3

    A_ = (p_t[:, None], p_ph[:, None], K[:, None])
    chi2 = chi * chi

    def R(r):
        pt, pp, K_ = A_
        quad = (r * r + a * a) * pt + a * pp
        return chi2 * quad * quad - _delta_r(r, params) * K_

    lo = (r_lo + jnp.zeros_like(r0))[:, None]
    hi = r0[:, None]
    ts = jnp.linspace(0.0, 1.0, n_grid, dtype=p_t.dtype)
    grid = lo + (hi - lo) * ts[None, :]
    Rg = R(grid)
    jmin = jnp.argmin(Rg, axis=1)
    R_grid_min = jnp.take_along_axis(Rg, jmin[:, None], axis=1)[:, 0]
    j_lo = jnp.maximum(jmin - 1, 0)
    j_hi = jnp.minimum(jmin + 1, n_grid - 1)
    gl = jnp.take_along_axis(grid, j_lo[:, None], axis=1)
    gh = jnp.take_along_axis(grid, j_hi[:, None], axis=1)
    inv_phi = 0.6180339887498949

    def golden(_, lohi):
        gl, gh = lohi
        x1 = gh - inv_phi * (gh - gl)
        x2 = gl + inv_phi * (gh - gl)
        keep_lo = R(x1)[:, 0] < R(x2)[:, 0]
        return (jnp.where(keep_lo[:, None], gl, x1),
                jnp.where(keep_lo[:, None], x2, gh))

    gl, gh = jax.lax.fori_loop(0, iters, golden, (gl, gh))
    R_min = jnp.minimum(R_grid_min, R(0.5 * (gl + gh))[:, 0])
    return has_horizon & (R_min <= 0.0)


# ---------------------------------------------------------------------------
# Equatorial circular orbits / QPO observables
# ---------------------------------------------------------------------------

def kds_equatorial_cov(r, params):
    """(g_tt, g_tph, g_phph) of the covariant equatorial block, from the
    Carter line element at theta = pi/2 (Sigma = r^2, Delta_th = 1):

        ds^2|_eq = -Delta_r/(chi^2 r^2) (dt - a dphi)^2
                   + 1/(chi^2 r^2) (a dt - (r^2+a^2) dphi)^2 + ...
    """
    a = params[1]
    delta_r = _delta_r(r, params)
    chi = 1.0 + params[2] * a * a / 3.0
    r2a2 = r * r + a * a
    inv = 1.0 / (chi * chi * r * r)
    g_tt = (-delta_r + a * a) * inv
    g_tph = (delta_r * a - a * r2a2) * inv
    g_phph = (-delta_r * a * a + r2a2 * r2a2) * inv
    return g_tt, g_tph, g_phph


def keplerian_omega_kds(r, params, prograde=True):
    """Circular-geodesic angular velocity from the metric-derivative
    quadratic (the same construction as physics/rotating_orbits — valid
    for any stationary axisymmetric metric):
    Omega = (-g_tph,r +- sqrt(g_tph,r^2 - g_tt,r g_phph,r))/g_phph,r.
    Kottler limit: Omega^2 = M/r^3 - Lambda/3 (the cosmological term
    brakes distant orbits — and kills them at the static radius)."""
    d_tt, d_tph, d_phph = [
        jax.grad(lambda rr, i=i: kds_equatorial_cov(rr, params)[i])(r)
        for i in range(3)]
    disc = jnp.sqrt(jnp.maximum(d_tph * d_tph - d_tt * d_phph, 0.0))
    sign = 1.0 if prograde else -1.0
    return (-d_tph + sign * disc) / d_phph


def circular_u_t_kds(r, params, prograde=True):
    omega = keplerian_omega_kds(r, params, prograde)
    g_tt, g_tph, g_phph = kds_equatorial_cov(r, params)
    norm = -(g_tt + 2.0 * omega * g_tph + omega * omega * g_phph)
    return 1.0 / jnp.sqrt(norm), omega


def circular_e_l_kds(r, params, prograde=True):
    u_t, omega = circular_u_t_kds(r, params, prograde)
    g_tt, g_tph, g_phph = kds_equatorial_cov(r, params)
    return (-(g_tt + omega * g_tph) * u_t,
            (g_tph + omega * g_phph) * u_t)


def _stability_scan_kds(params, prograde, rising, r_lo, r_hi,
                        n_scan=512, iters=60):
    de = jax.grad(lambda r: circular_e_l_kds(r, params, prograde)[0])
    u = jnp.linspace(0.0, 1.0, n_scan)
    rs = r_lo * (r_hi / r_lo) ** u
    sl = jax.vmap(de)(rs)
    want = ((sl[:-1] < 0.0) & (sl[1:] > 0.0) if rising
            else (sl[:-1] > 0.0) & (sl[1:] < 0.0))
    has = jnp.any(want)
    idx = jnp.argmax(want)
    lo, hi = rs[idx], rs[idx + 1]

    def bisect(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        neg = (de(mid) < 0.0) == rising
        return jnp.where(neg, mid, lo), jnp.where(neg, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo, hi))
    return jnp.where(has, 0.5 * (lo + hi), jnp.nan)


def isco_kds(params, prograde=True):
    """ISCO: the inner minimum of E(r) — scan+bisection on dE/dr between
    just outside r_+ and the static-radius ballpark.  NaN when Lambda is
    strong enough to erase all stable orbits (ISCO/OSCO merged)."""
    mass, lam = params[0], params[2]
    r_hi = jnp.where(lam > 0.0,
                     0.9 * (3.0 * mass / jnp.maximum(lam, 1e-30))
                     ** (1.0 / 3.0), 40.0 * mass)
    r_lo = 1.02 * kds_outer_horizon(params)
    return _stability_scan_kds(params, prograde, True, r_lo, r_hi)


def osco_kds(params, prograde=True):
    """OUTERMOST stable circular orbit (the cosmological tide's outer
    stability edge, as in Kottler); NaN for Lambda = 0."""
    mass, lam = params[0], params[2]
    r_hi = jnp.where(lam > 0.0,
                     0.98 * (3.0 * mass / jnp.maximum(lam, 1e-30))
                     ** (1.0 / 3.0), 40.0 * mass)
    r_lo = 1.02 * kds_outer_horizon(params)
    return _stability_scan_kds(params, prograde, False, r_lo, r_hi)


def epicyclic_kds(r, params, prograde=True):
    """(Omega_phi, kappa, Omega_theta) — physics/epicyclic's potential
    construction with the Kerr-de Sitter g_inv and this module's
    circular-orbit Killing charges.  Lambda = 0 reduces to the Kerr
    epicyclic layer; a = 0 to the static Kottler one."""
    r = jnp.asarray(r)
    half_pi = jnp.full_like(r, 0.5 * jnp.pi)
    energy, l_z = circular_e_l_kds(r, params, prograde)
    u_t, omega = circular_u_t_kds(r, params, prograde)

    def w_quad(rr, th):
        zero = jnp.zeros_like(rr)
        g = kerr_de_sitter_g_inv(jnp.stack([zero, rr, th, zero]), params)
        return (g[0, 0] * energy * energy
                - 2.0 * g[0, 3] * energy * l_z
                + g[3, 3] * l_z * l_z)

    def rad_pot(rr):
        zero = jnp.zeros_like(rr)
        g = kerr_de_sitter_g_inv(jnp.stack([zero, rr,
                                            0.5 * jnp.pi + zero, zero]),
                                 params)
        return -g[1, 1] * (1.0 + w_quad(rr, 0.5 * jnp.pi + zero))

    def pol_pot(th):
        g = kerr_de_sitter_g_inv(jnp.stack([jnp.zeros_like(th),
                                            r + 0.0 * th, th,
                                            jnp.zeros_like(th)]), params)
        return -g[2, 2] * (1.0 + w_quad(r + 0.0 * th, th))

    kappa2 = -0.5 * jax.grad(jax.grad(rad_pot))(r) / (u_t * u_t)
    vert2 = -0.5 * jax.grad(jax.grad(pol_pot))(half_pi) / (u_t * u_t)
    return (jnp.abs(omega), jnp.sqrt(jnp.maximum(kappa2, 0.0)),
            jnp.sqrt(jnp.maximum(vert2, 0.0)))
