"""Beyond-Kerr model families: static spherically-symmetric spacetimes.

The reference is Schwarzschild-only (simulation/cuda_geodesic.py:432-447
hardcodes the metric); grtrace's generic autodiff engine
(physics/spacetime.py, engine/render_generic.py) renders any metric that
can be written as ``g_inv(q, params)``.  This module plugs three
astrophysically interesting static families into that engine:

  Kottler (Schwarzschild-de Sitter)   f = 1 - 2M/r - (Lambda/3) r^2
      params = (M, Lambda, 0).  A black hole in an expanding universe;
      Lambda > 0 adds a cosmological horizon at r ~ sqrt(3/Lambda) and
      rescales the shadow seen by a static observer.
  Bardeen regular black hole          f = 1 - 2M r^2 / (r^2 + g^2)^{3/2}
      params = (M, g, 0).  The classic singularity-free hole (magnetic
      monopole charge g of nonlinear electrodynamics); horizons exist for
      g <= sqrt(16/27) M ~ 0.7698 M.
  Hayward regular black hole          f = 1 - 2M r^2 / (r^3 + 2 M l^2)
      params = (M, l, 0).  Regular core of width l; horizons exist for
      l <= sqrt(16/27) M (same critical ratio as Bardeen).

All three share one chart and one engine: areal-radius coordinates
q = (t, r, theta, phi) with

    ds^2 = -f(r) dt^2 + dr^2 / f(r) + r^2 dOmega^2
    g_inv = diag(-1/f, f, 1/r^2, 1/(r^2 sin^2 theta)).

The theory layer (photon sphere, critical impact parameter, shadow
angle, horizons) has no closed form for the regular holes, so it is
computed by Newton/bisection on AUTODIFF derivatives of f — exact to
roundoff at convergence, with no hand-derived formulas to get wrong.
Tests cross-check every quantity against an independent SciPy root
oracle and, for Kottler/Hayward, exact cubic roots
(tests/test_static_metrics.py).

Conventions (match physics/spacetime.py): geometrized units G = c = 1,
p is the COVECTOR p_mu, the Hamiltonian is H = (1/2) g^{ab} p_a p_b.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Lapse functions f(r).  params = (M, p1[, unused]) — the second slot is the
# family's own parameter (Lambda, g, or l); the third is ignored (it exists
# so the whole metric library shares the (mass, p1, p2) params layout of
# spacetime.METRICS).
# ---------------------------------------------------------------------------

def kottler_f(r, params):
    """Schwarzschild-de Sitter lapse; params[1] = Lambda (cosmological
    constant, units 1/M^2).  Lambda = 0 reduces to Schwarzschild."""
    mass, lam = params[0], params[1]
    return 1.0 - 2.0 * mass / r - (lam / 3.0) * r * r


def bardeen_f(r, params):
    """Bardeen regular-black-hole lapse; params[1] = g (magnetic charge).
    g = 0 reduces to Schwarzschild; the core r -> 0 is de Sitter-like
    (f -> 1 - 2M r^2/g^3), hence no curvature singularity."""
    mass, g = params[0], params[1]
    r2 = r * r
    return 1.0 - 2.0 * mass * r2 / jnp.power(r2 + g * g, 1.5)


def hayward_f(r, params):
    """Hayward regular-black-hole lapse; params[1] = l (core length).
    l = 0 reduces to Schwarzschild."""
    mass, ell = params[0], params[1]
    r3 = r * r * r
    return 1.0 - 2.0 * mass * r * r / (r3 + 2.0 * mass * ell * ell)


STATIC_F = {
    "Kottler": kottler_f,
    "Bardeen": bardeen_f,
    "Hayward": hayward_f,
}


def make_static_g_inv(f_fn):
    """g_inv(q, params) for ds^2 = -f dt^2 + dr^2/f + r^2 dOmega^2.

    Plugs directly into spacetime.METRICS / the generic autodiff engine
    (chart 'spherical', same layout as schwarzschild_g_inv)."""
    def g_inv(q, params):
        r, th = q[1], q[2]
        f = f_fn(r, params)
        sin_th = jnp.sin(th)
        zero = jnp.zeros_like(r)
        inv_r2 = 1.0 / (r * r)
        return jnp.array([
            [-1.0 / f, zero, zero, zero],
            [zero, f, zero, zero],
            [zero, zero, inv_r2, zero],
            [zero, zero, zero, inv_r2 / (sin_th * sin_th)],
        ])
    return g_inv


kottler_g_inv = make_static_g_inv(kottler_f)
bardeen_g_inv = make_static_g_inv(bardeen_f)
hayward_g_inv = make_static_g_inv(hayward_f)


# ---------------------------------------------------------------------------
# Theory layer: photon sphere, critical impact parameter, shadow, horizons.
# All jit-friendly (fixed-iteration Newton/bisection, no Python control
# flow on traced values) and exact-to-roundoff at convergence.
# ---------------------------------------------------------------------------

def photon_sphere(f_fn, params, r0=None, iters=40):
    """Circular-photon-orbit radius: the root of h(r) = 2 f(r) - r f'(r).

    (Effective potential V = f/r^2; V'(r_ph) = 0 <=> h(r_ph) = 0.)  Newton
    with autodiff h and h', seeded at the Schwarzschild value 3M — correct
    for Kottler EXACTLY (h is Lambda-independent: 2f - r f' = 2 - 6M/r)
    and within the Newton basin for the regular holes at any sub-critical
    parameter."""
    mass = params[0]
    if r0 is None:
        r0 = 3.0 * mass
    fp = jax.grad(f_fn, argnums=0)

    def h(r):
        return 2.0 * f_fn(r, params) - r * fp(r, params)

    hp = jax.grad(h)

    def newton(_, r):
        return r - h(r) / hp(r)

    return jax.lax.fori_loop(0, iters, newton, jnp.asarray(r0, jnp.result_type(float)))


def b_critical(f_fn, params, **kw):
    """Critical impact parameter b_c = r_ph / sqrt(f(r_ph)).

    Rays with b < b_c fall in; b = b_c asymptotes to the photon sphere.
    Schwarzschild limit: 3 sqrt(3) M (the reference's capture shortcut
    uses 3 sqrt(3) r_s — a documented factor-2 quirk, raytracing.py:205)."""
    r_ph = photon_sphere(f_fn, params, **kw)
    return r_ph / jnp.sqrt(f_fn(r_ph, params))


def shadow_angle(f_fn, params, r_obs, **kw):
    """Apparent shadow angular radius for a STATIC observer at r_obs:
    sin(alpha) = b_c sqrt(f(r_obs)) / r_obs  (Synge 1966).

    In Kottler the sqrt(f(r_obs)) factor carries the whole Lambda
    dependence — the photon sphere and b_c never move, but the shadow
    grows as the observer's clock slows toward the cosmological horizon."""
    b_c = b_critical(f_fn, params, **kw)
    s = b_c * jnp.sqrt(f_fn(r_obs, params)) / r_obs
    return jnp.arcsin(jnp.clip(s, -1.0, 1.0))


def outer_horizon(f_fn, params, n_scan=256, iters=60):
    """Outermost BLACK-HOLE horizon: the largest root of f below the
    photon sphere (Kottler's cosmological horizon sits far outside and is
    deliberately not this function's answer — the capture surface is the
    BH horizon).

    Inward scan from r_ph finds the first sign change, then fixed-count
    bisection.  Returns NaN when no horizon exists (super-critical regular
    holes: g or l > sqrt(16/27) M — the render still works, there is just
    nothing to capture on; rays wind through the regular core instead)."""
    r_ph = photon_sphere(f_fn, params)
    rs = jnp.linspace(r_ph, 1e-3 * params[0], n_scan)
    fv = jax.vmap(lambda r: f_fn(r, params))(rs)
    neg = fv < 0.0
    has = jnp.any(neg)
    idx = jnp.argmax(neg)                      # first scan point inside f<0
    lo = rs[idx]                               # f(lo) < 0 (inner)
    hi = rs[jnp.maximum(idx - 1, 0)]           # f(hi) > 0 (outer)

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        inside = f_fn(mid, params) < 0.0
        return jnp.where(inside, mid, lo), jnp.where(inside, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo, hi))
    root = 0.5 * (lo + hi)
    return jnp.where(has, root, jnp.nan)


def cosmological_horizon(params, iters=60):
    """Kottler's outer (cosmological) horizon: the largest positive root
    of 1 - 2M/r - Lambda r^2/3.  Bisection on [r_ph, 2 sqrt(3/Lambda)];
    NaN for Lambda <= 0 (no cosmological horizon)."""
    mass, lam = params[0], params[1]
    lam_safe = jnp.maximum(lam, 1e-30)
    hi0 = 2.0 * jnp.sqrt(3.0 / lam_safe)       # f(hi0) < 0 for lam > 0
    lo0 = 3.0 * mass                           # f(3M) > 0 below criticality

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        pos = kottler_f(mid, (mass, lam_safe)) > 0.0
        return jnp.where(pos, mid, lo), jnp.where(pos, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo0, hi0))
    return jnp.where(lam > 0.0, 0.5 * (lo + hi), jnp.nan)


def impact_parameter_cam(alpha_cam, f_fn, params, r_obs):
    """Conserved impact parameter b = L/E of the camera ray at camera
    angle alpha_cam off the optical axis, through the ACTUAL camera
    convention of the unfolded spherical chart
    (physics.camera.unfolded_ics_from_pixels): the radial direction
    cosine is scaled by the SCHWARZSCHILD sqrt(1 - 2M/r_obs) — the
    reference's normalization (simulation/utils.py:179-186), kept for
    every spherical-chart metric so pixels mean the same thing across
    charts — while p_t solves the null condition in the real metric f.

    Equatorial ray: p = (p_t, -cos(a) f_s, 0, sin(a) r_obs) with
    f_s = sqrt(1 - 2M/r_obs), p_t^2 = f (f f_s^2 cos^2 a + sin^2 a), so

        b(a) = r_obs sin(a) / sqrt(f (f f_s^2 cos^2 a + sin^2 a)).

    In the Schwarzschild limit this reduces to the closed form the
    validation harness uses (engine/validate.schwarzschild_analytic_rho:
    sin(a_phys) = b sqrt(f)/r_obs with tan(a_cam) = f tan(a_phys)).
    The ray escapes iff b(a) > b_critical — the analytic shadow-boundary
    predicate for the whole static family."""
    mass = params[0]
    f = f_fn(r_obs, params)
    fs2 = 1.0 - 2.0 * mass / r_obs
    s, c = jnp.sin(alpha_cam), jnp.cos(alpha_cam)
    return r_obs * s / jnp.sqrt(f * (f * fs2 * c * c + s * s))


def static_capture_radius(metric, params):
    """Capture-shell radius for the generic integrator: 1.1 r_+ like the
    reference's Schwarzschild test (cuda_geodesic.py:598), or a deep small
    floor when the spacetime has no horizon (super-critical regular holes
    — rays traverse the core and escape, nothing is captured; the floor
    only guards the r = 0 coordinate center)."""
    r_h = outer_horizon(STATIC_F[metric], params)
    return jnp.where(jnp.isnan(r_h), 1e-2 * params[0], 1.1 * r_h)


def lyapunov_static(f_fn, params, **kw):
    """Lyapunov exponent gamma of the unstable circular photon orbit, per
    RADIAN of azimuthal winding — the photon-ring demagnification rate:
    consecutive image orders (half-orbits) dim by e^(pi gamma).

    With u = 1/r the orbital equation is (du/dphi)^2 = P(u) =
    1/b_c^2 - u^2 f(1/u); at the unstable orbit P = P' = 0 and
    perturbations grow as e^(gamma phi) with gamma = sqrt(P''(u_ph)/2),
    computed here by AUTODIFF of the same lapse everything else uses.

    Exact facts pinned in tests/test_static_disk.py: Schwarzschild gives
    gamma = 1 exactly (P'' = -2 + 12 M u = 2 at u = 1/3M — the classic
    e^pi ~ 23x per-order dimming), and Kottler's gamma is
    Lambda-INDEPENDENT (u^2 f = u^2 - 2 M u^3 - Lambda/3: the
    cosmological term is a constant in u, invisible to P'').  The
    regular families wind faster (smaller gamma -> brighter subrings) as
    the deformation grows — a photon-ring observable of the core.
    """
    r_ph = photon_sphere(f_fn, params, **kw)
    b_c = b_critical(f_fn, params, **kw)
    u_ph = 1.0 / r_ph

    def p_of_u(u):
        return 1.0 / (b_c * b_c) - u * u * f_fn(1.0 / u, params)

    p2 = jax.grad(jax.grad(p_of_u))(u_ph)
    return jnp.sqrt(jnp.maximum(0.5 * p2, 0.0))
