"""Timelike geodesics: massive test particles on the SAME integrator.

The FANTASY flows (spacetime.make_flows) integrate H = 1/2 g^ab p_a p_b
for ANY covector p — the mass shell is a property of the initial
condition, not of the integrator.  Photons satisfy H = 0; a particle of
mass mu satisfies g^ab p_a p_b = -mu^2 (p_a = mu u_a, affine parameter
= proper time / mu).  So massive-particle dynamics — bound orbits,
periastron precession, ISCO (in)stability, plunges — come from the
exact same symplectic kernels the renderer runs, with only the p_t
solve changed.

This module builds the ICs and the independent anchors:

- `timelike_p_t` / `build_timelike_4momentum`: mass-shell p_t solve
  (the mu != 0 generalization of spacetime.null_p_t), future-directed
  (u^t > 0, E = -p_t > 0 — particle convention, NOT the renderer's
  backward-ray root).
- `equatorial_ics`: (E, L_z) -> (q0, p0) on the equator of the
  Boyer-Lindquist chart, p_r from the mass shell.
- `bound_orbit_e_lz`: (r_peri, r_apo) -> (E, L_z).  Schwarzschild is a
  LINEAR solve in (E^2, L^2); Kerr/Kerr-Newman polishes that seed with
  a fixed-iteration Newton on the exact turning-point residual (the
  cross term g^tph E L breaks the linearity).
- `periapsis_advance_quadrature`: the exact GR periastron advance as a
  midpoint quadrature of d(phi)/dr between the turning points — an
  integrator-independent anchor valid in the strong field (the
  sqrt((r - r_p)(r_a - r)) endpoint singularity is integrable; midpoint
  nodes never touch the endpoints).
- `weak_field_precession`: the classic 6 pi M / (a (1 - e^2)) leading
  term (Mercury's 43"/century), the far-field limit both the quadrature
  and the integrator must approach.

No reference counterpart: the reference (and EinsteinPy's `Nulllike`
path it uses) traces photons only — it has no massive-particle IC
builder, no bound-orbit solver and no precession observables.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .spacetime import _charge, kerr_g_inv


def timelike_p_t(p_sph, q, params, g_inv_fn, mu=1.0, future=True):
    """Solve g^ab p_a p_b = -mu^2 for p_t with general cross terms.

    Quadratic A p_t^2 + B p_t + (C + mu^2) = 0 with A = g^tt,
    B = 2 g^{t i} p_i, C = g^{ij} p_i p_j.  future=True picks the root
    with u^t = g^tt p_t + g^{t i} p_i > 0 (forward proper time): outside
    the ergosphere A < 0, so that is (-B + disc)/(2A) — the OPPOSITE
    branch from the renderer's backward-ray convention
    (spacetime.null_p_t), and it carries E = -p_t > 0.
    """
    q4 = jnp.asarray(q)
    p_sph = jnp.asarray(p_sph)
    g = g_inv_fn(q4, params)
    a_c = g[0, 0]
    b_c = 2.0 * g[0, 1:] @ p_sph
    c_c = p_sph @ g[1:, 1:] @ p_sph + mu * mu
    disc = jnp.sqrt(jnp.maximum(b_c * b_c - 4.0 * a_c * c_c, 0.0))
    root = (-b_c + disc) / (2.0 * a_c) if future \
        else (-b_c - disc) / (2.0 * a_c)
    return root


def build_timelike_4momentum(p_sph, pos_sph, params, g_inv_fn, mu=1.0,
                             future=True):
    """(3,) spatial covector + (r, th, ph) -> (4,) timelike covector."""
    pos_sph = jnp.asarray(pos_sph)
    q4 = jnp.concatenate([jnp.zeros((1,), dtype=pos_sph.dtype), pos_sph])
    p_t = timelike_p_t(jnp.asarray(p_sph), q4, params, g_inv_fn, mu=mu,
                       future=future)
    return jnp.concatenate([p_t[None], jnp.asarray(p_sph)])


def pr2_of_r(r, energy, l_z, params, mu=1.0):
    """Squared radial covector p_r^2(r) on the BL equator from the mass
    shell with Killing charges (E, L_z):

        g^rr p_r^2 = -mu^2 - (g^tt E^2 - 2 g^tph E L + g^phph L^2),

    positive exactly where the orbit is allowed; its simple roots are
    the turning points.  (p_t = -E, p_ph = L_z, p_th = 0.)
    """
    zero = jnp.zeros_like(r)
    q = jnp.stack([zero, r, jnp.full_like(r, jnp.pi / 2), zero])
    g = kerr_g_inv(q, params)
    quad = (g[0, 0] * energy * energy - 2.0 * g[0, 3] * energy * l_z
            + g[3, 3] * l_z * l_z)
    return (-mu * mu - quad) / g[1, 1]


def equatorial_ics(r0, energy, l_z, params, sign_ur=-1.0, mu=1.0,
                   dtype=jnp.float64):
    """(E, L_z) at BL radius r0 -> (q0, p0) for the FANTASY state.

    p_r = sign_ur * sqrt(p_r^2(r0)) (clamped at 0 so a turning point
    itself is a valid start).  Equatorial is exact under the flow:
    dH/d(theta) = 0 at theta = pi/2 by reflection symmetry, so p_theta
    stays identically zero.
    """
    r0 = jnp.asarray(r0, dtype)
    q0 = jnp.stack([jnp.zeros_like(r0), r0,
                    jnp.full_like(r0, jnp.pi / 2), jnp.zeros_like(r0)])
    pr2 = pr2_of_r(r0, energy, l_z, jnp.asarray(params, dtype), mu)
    p_r = jnp.asarray(sign_ur, dtype) * jnp.sqrt(jnp.maximum(pr2, 0.0))
    p0 = jnp.stack([-jnp.asarray(energy, dtype), p_r, jnp.zeros_like(r0),
                    jnp.asarray(l_z, dtype)])
    return q0, p0


def bound_orbit_e_lz(r_peri, r_apo, params, prograde=True, mu=1.0,
                     newton_iters=12):
    """(E, L_z) of the equatorial bound orbit with turning points
    (r_peri, r_apo).

    Schwarzschild seed (exact there): p_r^2 = 0 at both radii is linear
    in (E^2, L^2),

        E^2 = (1 - 2M/r) (mu^2 + L^2 / r^2)   at r = r_peri, r_apo.

    Kerr/Kerr-Newman: Newton iterations on the exact residual
    [p_r^2(r_p), p_r^2(r_a)] via jax.jacfwd — the autodiff Jacobian of
    the same tested metric the integrator runs, no hand-derived
    closed forms to transcribe wrongly.
    """
    params = jnp.asarray(params)
    dtype = params.dtype
    r_p = jnp.asarray(r_peri, dtype)
    r_a = jnp.asarray(r_apo, dtype)
    m = params[0]

    # Schwarzschild linear solve in (E^2, L^2)
    fp = 1.0 - 2.0 * m / r_p
    fa = 1.0 - 2.0 * m / r_a
    l2 = (mu * mu * (fp - fa)) / (fa / (r_a * r_a) - fp / (r_p * r_p))
    e2 = fp * (mu * mu + l2 / (r_p * r_p))
    sgn = 1.0 if prograde else -1.0
    seed = jnp.stack([jnp.sqrt(jnp.maximum(e2, 0.0)),
                      sgn * jnp.sqrt(jnp.maximum(l2, 0.0))])

    def residual(el):
        return jnp.stack([pr2_of_r(r_p, el[0], el[1], params, mu),
                          pr2_of_r(r_a, el[0], el[1], params, mu)])

    def newton(el, _):
        jac = jax.jacfwd(residual)(el)
        step = jnp.linalg.solve(jac, residual(el))
        return el - step, None

    el, _ = jax.lax.scan(newton, seed, None, length=newton_iters)
    return el[0], el[1]


def radial_potential_factored(r, r_peri, r_apo, energy, l_z, params,
                              mu=1.0):
    """R(r) = r^4 (u^r)^2 on the BL equator, evaluated cancellation-free.

    Exact quartic (Kerr-Newman, uncharged particle; x = L_z - a E):

        R(r) = [E (r^2 + a^2) - a L_z]^2 - Delta (mu^2 r^2 + x^2)
             = c4 r^4 + c3 r^3 + c2 r^2 + c1 r + c0,
        c4 = E^2 - mu^2        c3 = 2 M mu^2
        c2 = -(x^2 + 2 a E x + (a^2 + Q^2) mu^2)
        c1 = 2 M x^2           c0 = -Q^2 x^2.

    Direct evaluation of R (or of pr2_of_r) near a turning point sums
    O(1)-magnitude terms to a near-zero result — f64 roundoff exceeds the
    true value there, which biases sqrt(R) quadratures by ~1e-2 and flips
    signs.  Instead, the two KNOWN roots (r_peri, r_apo) are deflated via
    Vieta: r3 + r4 = -c3/c4 - r_p - r_a and r3 r4 = c0 / (c4 r_p r_a),

        R(r) = c4 (r - r_p)(r - r_a)(r^2 - (r3 + r4) r + r3 r4),

    a product of well-separated factors with no cancellation anywhere in
    [r_p, r_a].  (p_r^2 = R / Delta^2; u^r = sqrt(R) / r^2.)
    """
    params = jnp.asarray(params)
    m, a = params[0], params[1]
    qq = _charge(params)
    x = l_z - a * energy
    c4 = energy * energy - mu * mu
    c3 = 2.0 * m * mu * mu
    c0 = -(qq * qq) * x * x
    root_sum = -c3 / c4 - r_peri - r_apo
    root_prod = c0 / (c4 * r_peri * r_apo)
    quad = r * r - root_sum * r + root_prod
    return c4 * (r - r_peri) * (r - r_apo) * quad


def periapsis_advance_quadrature(r_peri, r_apo, params, prograde=True,
                                 mu=1.0, n=20001):
    """Exact periastron advance per radial period, by quadrature:

        Delta phi = 2 * integral_{r_p}^{r_a} (u^phi / |u^r|) dr  -  2 pi,

    with u^phi = g^tph p_t + g^phph p_ph from the inverse metric and
    u^r = sqrt(R(r)) / r^2 from the FACTORED radial potential
    (radial_potential_factored) — the direct quadratic-form evaluation
    is roundoff-dominated near the turning points and biases the
    integral at the 1e-2 level.  Substituting
    r = r_p + (r_a - r_p) sin^2(chi) with midpoint nodes keeps every
    evaluation strictly inside the turning points, where the integrable
    1/sqrt endpoint singularity is tamed by the sin(2 chi) Jacobian.
    Integrator-independent strong-field anchor (matches 6 pi M / p only
    as r -> infinity).
    """
    params = jnp.asarray(params)
    dtype = params.dtype
    r_p = jnp.asarray(r_peri, dtype)
    r_a = jnp.asarray(r_apo, dtype)
    energy, l_z = bound_orbit_e_lz(r_p, r_a, params, prograde, mu)

    chi = (jnp.arange(n, dtype=dtype) + 0.5) * (0.5 * jnp.pi / n)
    s = jnp.sin(chi)
    r = r_p + (r_a - r_p) * s * s
    dr_dchi = (r_a - r_p) * jnp.sin(2.0 * chi)

    zero = jnp.zeros_like(r)
    q = jnp.stack([zero, r, jnp.full_like(r, jnp.pi / 2), zero], -1)
    g = jax.vmap(lambda qq: kerr_g_inv(qq, params))(q)
    u_phi = -g[:, 0, 3] * energy + g[:, 3, 3] * l_z
    big_r = radial_potential_factored(r, r_p, r_a, energy, l_z, params, mu)
    u_r = jnp.sqrt(jnp.maximum(big_r, 0.0)) / (r * r)
    u_r_safe = jnp.where(big_r > 0.0, u_r, 1.0)
    integrand = jnp.where(big_r > 0.0, u_phi / u_r_safe * dr_dchi, 0.0)
    dphi = 2.0 * jnp.sum(integrand) * (0.5 * jnp.pi / n)
    sgn = 1.0 if prograde else -1.0
    return sgn * dphi - 2.0 * jnp.pi


def weak_field_precession(r_peri, r_apo, mass=1.0):
    """Leading-order periastron advance 6 pi M / (a (1 - e^2)) for the
    ellipse with the given turning points (a = semi-latus/focal form:
    a = (r_p + r_a)/2, e = (r_a - r_p)/(r_a + r_p))."""
    a_sl = 0.5 * (r_peri + r_apo)
    ecc = (r_apo - r_peri) / (r_apo + r_peri)
    return 6.0 * jnp.pi * mass / (a_sl * (1.0 - ecc * ecc))
