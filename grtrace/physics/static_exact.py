"""Semi-analytic (stepping-free) planar null geodesics for static metrics.

Static-family twin of physics/geodesic_exact.py (which quadratures the
separated Kerr Hamiltonian): in a spherically-symmetric metric every null
geodesic is PLANAR, and in its own plane the orbit is one first-order
equation in u = 1/r,

    (du/dphi)^2 = P(u) = 1/b^2 - u^2 f(1/u),      b = L/E,

so exact trajectories need only 1-D root finds and quadratures of
1/sqrt(P) — no integrator, no steps, no truncation.  This makes the
strongest oracle in the tree available for the beyond-Kerr static
families (Kottler/Bardeen/Hayward): the fixed-step FANTASY engine's
deflections and disk-crossing radii are pinned against machine-accurate
quadrature in tests/test_static_exact.py.

Quadrature design (jit-friendly, fixed shapes):
  * the turning point u_t is the smallest root of P above 0, by scan +
    fixed-count bisection (P > 0 on [0, u_t), escape rays only);
  * integrals to the turning point substitute u = u0 + (u_t - u0) sin^2
    theta, which cancels the 1/sqrt(u_t - u) endpoint singularity
    exactly (the integrand tends to a finite limit ~ 1/sqrt(P'(u_t)));
    midpoint rule in theta then converges fast and has no endpoint
    evaluations;
  * phi -> u inversion is fixed-count bisection on the monotone leg.

Conventions: the backward camera ray starts at u_obs = 1/r_obs moving
INWARD (u increasing) toward the turning point, then back out; the total
azimuth swept from the camera to radius u on the inbound leg is
phi_in(u), on the outbound leg phi_out(u) = 2 phi_t - phi_in(u) with
phi_t the azimuth at the turning point.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_N_QUAD = 384          # midpoint nodes per quadrature leg
_N_SCAN = 512          # turning-point scan resolution


def radial_potential_static(u, b, f_fn, params):
    """P(u) = 1/b^2 - u^2 f(1/u); orbits live where P >= 0."""
    return 1.0 / (b * b) - u * u * f_fn(1.0 / u, params)


def turning_point_static(b, f_fn, params, u_obs, u_max, iters=60):
    """Smallest root of P(u) in (u_obs, u_max): the periapsis of an
    escaping ray (b > b_critical).  NaN when P has no root there (a
    captured ray: P > 0 all the way to u_max)."""
    us = jnp.linspace(u_obs, u_max, _N_SCAN)
    pv = jax.vmap(lambda u: radial_potential_static(u, b, f_fn,
                                                    params))(us)
    neg = pv <= 0.0
    has = jnp.any(neg)
    idx = jnp.argmax(neg)                       # first scan point past u_t
    lo = us[jnp.maximum(idx - 1, 0)]            # P(lo) > 0
    hi = us[idx]                                # P(hi) <= 0

    def bisect(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        pos = radial_potential_static(mid, b, f_fn, params) > 0.0
        return jnp.where(pos, mid, lo), jnp.where(pos, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo, hi))
    return jnp.where(has, 0.5 * (lo + hi), jnp.nan)


def _phi_leg(u_a, u_b, u_t, b, f_fn, params):
    """Azimuth swept between u_a and u_b on one monotone leg, with the
    turning point u_t as the (possible) endpoint singularity of
    1/sqrt(P):  substitute u = u_a + (u_b - u_a) sin^2(th) — exact
    cancellation when u_b == u_t, harmless otherwise."""
    th = (jnp.arange(_N_QUAD) + 0.5) * (0.5 * jnp.pi / _N_QUAD)
    s, c = jnp.sin(th), jnp.cos(th)
    du = u_b - u_a
    u = u_a + du * s * s
    p = radial_potential_static(u, b, f_fn, params)
    # at u == u_t, P ~ |P'(u_t)| (u_t - u) = |P'| du c^2 s^2-ish; the
    # 2 s c Jacobian over sqrt(...) stays finite
    integrand = 2.0 * du * s * c / jnp.sqrt(jnp.maximum(p, 1e-300))
    return jnp.sum(integrand) * (0.5 * jnp.pi / _N_QUAD)


def deflection_static(b, f_fn, params, r_obs, r_exit=None):
    """Total azimuth swept by an escaping ray from the camera at r_obs
    to periapsis and back out to r_exit (default: r_obs) — the exact
    bending angle of the static family at impact parameter b."""
    u_obs = 1.0 / r_obs
    u_t = turning_point_static(b, f_fn, params, u_obs, 1.0)
    phi_in = _phi_leg(u_obs, u_t, u_t, b, f_fn, params)
    u_exit = u_obs if r_exit is None else 1.0 / r_exit
    phi_out = _phi_leg(u_exit, u_t, u_t, b, f_fn, params)
    return phi_in + phi_out


def u_at_phi_static(phi_target, b, f_fn, params, r_obs, iters=60):
    """Invert the orbit: the u = 1/r at which the ray (launched inward
    from r_obs) has swept azimuth `phi_target`.  Handles both legs: if
    phi_target exceeds the inbound sweep phi_t, the remainder runs back
    out from the turning point.  NaN when phi_target exceeds the total
    sweep back out to the observer radius (the ray has left the r <
    r_obs region) or when the ray has no turning point (captured)."""
    u_obs = 1.0 / r_obs
    u_t = turning_point_static(b, f_fn, params, u_obs, 1.0)
    has_t = jnp.isfinite(u_t)
    # PLUNGING rays (b < b_critical: no turning point) still sweep
    # azimuth on their one-way inbound leg — the integral is smooth all
    # the way down (P > 0, no root), bounded here at u = 1/M, far inside
    # any disk annulus
    u_end = jnp.where(has_t, u_t, 1.0)
    phi_t = _phi_leg(u_obs, u_end, u_end, b, f_fn, params)
    inbound = phi_target <= phi_t
    # the swept azimuth at radius u is phi_in(u) on the inbound leg and
    # 2 phi_t - phi_in(u) on the outbound leg (the out integral from u_t
    # back to u equals phi_t - phi_in(u)); both legs therefore invert
    # through the SAME monotone phi_in.  Plungers have no outbound leg.
    target = jnp.where(inbound, phi_target, 2.0 * phi_t - phi_target)

    def phi_in_of(u):
        return _phi_leg(u_obs, u, u_end, b, f_fn, params)

    def step(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        below = phi_in_of(mid) < target
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, step, (u_obs, u_end))
    u = 0.5 * (lo + hi)
    valid = jnp.where(has_t, phi_target <= 2.0 * phi_t,
                      phi_target <= phi_t)
    return jnp.where(valid, u, jnp.nan)


@partial(jax.jit, static_argnames=("metric",))
def disk_crossing_exact(p0, beta, elevation, metric, params, r_obs, k=0):
    """EXACT first-crossing radius of a folded camera ray with the
    tilted disk plane — the quadrature oracle for
    engine.disk_static.integrate_batch_disk_static.

    The fold-frame trajectory crosses the tilted plane where the linear
    form c1 cos(phi) + c2 sin(phi) vanishes: at fold azimuths
    phi* = phi0 + k pi with phi0 = atan2(-c1, c2).  The ray launches at
    fold azimuth phi_cam = 0 sweeping d(phi) with the sign of p_phi, so
    the k-th crossing lies at swept angle
    |Delta phi_k| = mod(sign * (phi0 + k pi), pi) + k' pi ... — i.e. the
    first crossing is at the smallest positive solution of
    sign(p_phi) * Delta = phi0 mod pi.  The crossing RADIUS follows from
    the orbit inversion u_at_phi_static, with NO integration anywhere.

    Returns (r_cross, swept): the exact radius of the k-th plane
    crossing (k = 0 the first; successive crossings sit pi apart in fold
    azimuth — the disk annulus test walks k upward) and the swept fold
    azimuth there; NaN when the ray is captured or has left the
    r < r_obs region before that crossing.  `p0` is the folded camera
    covector (p_t, p_r, 0, p_phi); `beta` the fold angle; `elevation`
    the disk tilt.
    """
    from .static_metrics import STATIC_F
    f_fn = STATIC_F[metric]

    # |b| = |L/E| as a ratio of covector components — sign-proof against
    # the backward-ray convention (the folded camera stores p_t > 0; the
    # radial potential is even in b anyway)
    b = jnp.abs(p0[3] / p0[0])

    c1 = jnp.sin(elevation)
    c2 = jnp.sin(beta) * jnp.cos(elevation)
    # fold azimuth of the plane's node line, in [0, pi)
    phi0 = jnp.arctan2(-c1, c2)
    sgn = jnp.sign(p0[3])
    # swept angle (positive) to the first node passage in the travel
    # direction: smallest positive solution of sgn*swept == phi0 (mod pi)
    swept = jnp.mod(sgn * phi0, jnp.pi)
    swept = jnp.where(swept < 1e-12, jnp.pi, swept)   # camera sits on a
    # node only when c1 = 0 exactly (edge-on): first crossing half a
    # turn later
    swept = swept + k * jnp.pi
    u = u_at_phi_static(swept, b, f_fn, params, r_obs)
    return 1.0 / u, swept
