"""Semi-analytic null geodesics from the separated Hamiltonian.

The Kerr-Newman null Hamiltonian separates in Mino time (see
physics/photon_shell.py for the split, built from the SAME ``kerr_g_inv``
every ray integrates):

    (dr/dtau)^2     = R(r)      = -Delta(r) (eta + W_r(r)),
    (dtheta/dtau)^2 = Theta(th) = eta - W_th(th),
    dt/dtau   = T_r(r) + T_th(th),      (Sigma p^t, split by separability)
    dphi/dtau = P_r(r) + P_th(th),      (Sigma p^phi)

so a ray is two decoupled 1-D motions plus four path quadratures — no
stepping.  This module evaluates rays *exactly* (to quadrature accuracy,
~1e-10): given camera initial conditions it returns the Boyer-Lindquist
(tau, r, t, phi) of each of the first N equatorial-plane crossings — the
very records the production integrator extracts per image order
(engine/subring.py) — with NO truncation-error noise floor, arbitrarily
deep into the photon shell.

It is the strongest oracle in the repo: independent of step size, of the
integrator order, and of the chart the engine integrates in (it works in
BL; the engine in Kerr-Schild Cartesian; the chart maps are pinned
separately by physics/polarization.bl_from_ks tests).

Design notes:
  * every 1/sqrt turning-point singularity is removed by the
    substitution x = sqrt(r - r4) (resp. sqrt(th - th_minus)) whose
    Jacobian cancels the simple root exactly, then Gauss-Legendre;
  * the radial turning point is the LARGEST root of R, found by
    downward scan + bisection (robust for the whole Kerr-Newman family
    where the quartic's closed form is numerically treacherous);
  * r(tau) is inverted by bisecting the monotone per-leg Mino time
    integral — no Jacobi elliptic functions anywhere;
  * the t/phi split functions are defined from the metric as
    S(r, pi/2) and S(r_ref, th) - S(r_ref, pi/2); separability (their
    sum reconstructing Sigma p^t / Sigma p^phi at every (r, th)) is
    asserted in tests, not assumed.

Scope: rays that start moving INWARD (p_r < 0 — every pixel of the
repo's cameras) with ordinary polar motion (eta > 0; vortical eta < 0
rays never cross the equator and are flagged invalid).  Theory
cross-checks in the tests cite Gralla & Lupsasca 2020 (Phys Rev D 101,
044032) — the closed elliptic-integral forms this module deliberately
replaces with metric-derived quadrature.

No reference counterpart: the reference integrates every ray
numerically and extracts no per-order structure
(simulation/raytracing.py).  Geometrized units G = c = 1, E = 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .photon_shell import _delta, _theta_turning, w_polar, w_radial
from .polarization import bl_from_ks
from .spacetime import _charge, kerr_g_inv

# 96 Gauss-Legendre nodes per leg: the substituted integrands are smooth,
# ~1e-12 for everything except log-divergent near-critical legs
_GL_X, _GL_W = np.polynomial.legendre.leggauss(96)
_GL_X = jnp.asarray(_GL_X)
_GL_W = jnp.asarray(_GL_W)


# ------------------------------------------------------------ potentials

def radial_potential(r, lam, eta, params):
    """R(r) = -Delta (eta + W_r): (dr/dtau)^2 along the ray."""
    return -_delta(r, params) * (eta + w_radial(r, lam, params))


def _sigma_pt_pphi(r, th, lam, params):
    """(Sigma p^t, Sigma p^phi) for p = -dt + lam dphi: the Mino-time
    t and phi speeds, from the inverse metric."""
    zero = jnp.zeros_like(r + th)
    g = kerr_g_inv(jnp.stack([zero, r + zero, th + zero, zero]), params)
    sigma = 1.0 / g[2, 2]
    return (sigma * (-g[0, 0] + g[0, 3] * lam),
            sigma * (-g[0, 3] + g[3, 3] * lam))


def t_phi_r_parts(r, lam, params):
    """(T_r, P_r): the radial halves of dt/dtau, dphi/dtau."""
    return _sigma_pt_pphi(r, 0.5 * jnp.pi, lam, params)


def t_phi_theta_parts(th, lam, params, r_ref=10.0):
    """(T_th, P_th): the polar halves (gauge: zero at the equator).
    r_ref is arbitrary by separability — asserted in tests."""
    r = jnp.asarray(r_ref)
    t_full, p_full = _sigma_pt_pphi(r, th, lam, params)
    t_eq, p_eq = _sigma_pt_pphi(r, 0.5 * jnp.pi, lam, params)
    return t_full - t_eq, p_full - p_eq


# ------------------------------------------------------------ conserved

def conserved_from_ks(q0, p0, params):
    """(lam, eta, theta_o, s_theta, s_r, r_o, e_sign) from one
    Kerr-Schild Cartesian IC.

    The repo's cameras trace photons BACKWARD: their momenta have
    e = -p_t < 0 (coordinate time decreases along the trace).  The
    time-reversal + azimuth-mirror map (t, phi) -> (-t, -phi) is a
    Kerr-Newman isometry that sends such a trace to an E = +1 geodesic
    traversed camera-to-scene with t INCREASING — and dividing
    (p_t, p_phi) by the *signed* e implements exactly that map, so one
    formula covers both orientations:

      lam = p_phi / e     (mirrored when e < 0 — as the map requires),
      eta = (p_th/e)^2 + W_th(th_0)   (sign-free),
      s_theta = sign(p_th)            (the map does NOT flip p_theta,
                                       so the RAW sign, not p_th/e),
      s_r = sign(p_r)                 (unflipped either).

    Consumers comparing to tracer records undo the map with e_sign:
    t_trace = e_sign * t, phi_trace - phi_camera = e_sign * phi.
    """
    q_bl, p_bl = bl_from_ks(q0, p0, params)
    e = -p_bl[0]
    lam = p_bl[3] / e
    p_th = p_bl[2] / e
    th_o = q_bl[2]
    eta = p_th * p_th + w_polar(th_o, lam, params)
    # dr/dtau = Delta p_r / Sigma: same sign as p_r outside the horizon
    return (lam, eta, th_o, jnp.sign(p_bl[2]), jnp.sign(p_bl[1]),
            q_bl[1], jnp.sign(e))


# ------------------------------------------------------------ turning

def radial_turning(lam, eta, params, r_obs, n_grid=1024, iters=60):
    """(has_turn, r4): whether R has a root in (r_horizon, r_obs) and
    the LARGEST such root (the periapsis of a scattering ray).  R >= 0
    at the horizon always (R(r_+) is a perfect square), so roots pair
    up; downward scan finds the outermost sign change, bisection
    refines it.  Captured rays (R > 0 throughout) return has_turn =
    False with r4 = horizon (unused)."""
    mass, a = params[0], params[1]
    qc = _charge(params)
    r_hor = mass + jnp.sqrt(jnp.maximum(mass * mass - a * a - qc * qc,
                                        0.0))
    grid = jnp.linspace(r_hor + 1e-6, r_obs, n_grid)
    rv = jax.vmap(lambda r: radial_potential(r, lam, eta, params))(grid)
    neg = rv < 0.0
    any_neg = jnp.any(neg)

    # near-critical rays: R dips negative in an interval far narrower
    # than the grid (width ~ sqrt of the distance to criticality) — if
    # no sample is negative, ternary-refine the local minimum around
    # the grid argmin and test ITS sign, pushing detectability to the
    # f64 floor
    i_min = jnp.clip(jnp.argmin(rv), 1, n_grid - 2)
    tlo, thi = grid[i_min - 1], grid[i_min + 1]

    def tern(_, lh):
        lo, hi = lh
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        f1 = radial_potential(m1, lam, eta, params)
        f2 = radial_potential(m2, lam, eta, params)
        take_left = f1 < f2
        return (jnp.where(take_left, lo, m1),
                jnp.where(take_left, m2, hi))

    tlo, thi = jax.lax.fori_loop(0, 90, tern, (tlo, thi))
    r_dip = 0.5 * (tlo + thi)
    dip_neg = radial_potential(r_dip, lam, eta, params) < 0.0

    has_turn = any_neg | dip_neg
    # outermost negative point; the largest root lies between it and
    # the next positive sample above
    idx = jnp.where(any_neg, n_grid - 1 - jnp.argmax(neg[::-1]), i_min)
    idx = jnp.minimum(idx, n_grid - 2)
    lo = jnp.where(any_neg, grid[idx], r_dip)   # R < 0 (when has_turn)
    hi = grid[idx + 1]                          # R > 0

    def step(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        neg_mid = radial_potential(mid, lam, eta, params) < 0.0
        return jnp.where(neg_mid, mid, lo), jnp.where(neg_mid, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, step, (lo, hi))
    # Newton polish from the DETACHED bisected root: value moves only
    # within R's own noise floor, and the expression carries the
    # implicit gradient d r4 = -R_p / R'(r4) through (lam, eta, params)
    # that the bisection's select chain loses.  R' > 0 at the largest
    # root (R > 0 above it).  The step is clipped to ONE SCAN CELL —
    # never the collapsed bisection bracket: R is assembled from terms
    # of magnitude ~Delta*eta (1e4), so R(root) carries ~1e-12
    # cancellation noise, and the honest Newton step (noise/R' — the
    # root's intrinsic uncertainty) legitimately exceeds the ~1-ulp
    # stalled bracket; a bracket clip would bind and silently ZERO the
    # implicit gradient.  The cell bound only disarms exactly-critical
    # double roots (R' -> 0), whose true sensitivity diverges anyway.
    r_d = jax.lax.stop_gradient(0.5 * (lo + hi))
    rv_d = radial_potential(r_d, lam, eta, params)
    dr_d = jax.grad(radial_potential, argnums=0)(r_d, lam, eta, params)
    ok = has_turn & (jnp.abs(dr_d) > 1e-30)
    cell = jax.lax.stop_gradient(grid[1] - grid[0])
    delta_r = jnp.clip(rv_d / jnp.where(ok, dr_d, 1.0), -cell, cell)
    root = jnp.where(ok, r_d - delta_r, r_d)
    return has_turn, jnp.where(has_turn, root, r_hor)


# ------------------------------------------------------------ leg sums

def _leg_theta(th_a, th_b, th_minus, lam, eta, params):
    """Integrals over one monotone polar leg folded into
    [th_minus, pi/2], th_a <= th_b: returns (Mino time, t gain, phi
    gain).  Substitution th = th_minus + x^2 cancels the turning-point
    root of Theta; the integrands' theta-halves are even about the
    equator, so folded legs carry the full contribution."""
    # the 1e-300 floor (not 0.0) keeps AD finite when a leg starts AT
    # the turning point: th_a == th_minus makes sqrt' infinite, and the
    # tie must route the gradient to the constant, not through inf * 0
    xa = jnp.sqrt(jnp.maximum(th_a - th_minus, 1e-300))
    xb = jnp.sqrt(jnp.maximum(th_b - th_minus, 1e-300))
    mid, half = 0.5 * (xa + xb), 0.5 * (xb - xa)
    x = mid + half * _GL_X
    th = th_minus + x * x
    theta_pot = jax.vmap(lambda t: eta - w_polar(t, lam, params))(th)
    # 1e-120 floors (not 1e-300): fully-degenerate legs (both endpoints
    # at the anchor — the discarded branch of the r(tau) inversions)
    # must keep every BACKWARD local derivative finite too (g^-3/2,
    # (th - th_minus)^-2 overflow past ~1e-205 and turn zero cotangents
    # into 0 * inf = NaN); legitimate node values are >= 1e-23, so the
    # floor never binds on a real leg
    g = jnp.maximum(theta_pot / jnp.maximum(th - th_minus, 1e-120),
                    1e-120)
    base = 2.0 / jnp.sqrt(g)            # dtheta/sqrt(Theta) = base dx
    t_th, p_th = jax.vmap(
        lambda t: t_phi_theta_parts(t, lam, params))(th)
    w = _GL_W * half
    return (jnp.sum(w * base), jnp.sum(w * base * t_th),
            jnp.sum(w * base * p_th))


def _leg_r(r_a, r_b, anchor, lam, eta, params):
    """Integrals over one monotone radial leg [r_a, r_b] (r_a >= anchor):
    (Mino time, t gain, phi gain).  anchor = the turning point when the
    leg touches it (regularizes the root of R); any value below the leg
    otherwise — the substitution r = anchor + x^2 is exact either way."""
    xa = jnp.sqrt(jnp.maximum(r_a - anchor, 1e-300))  # AD-safe at r4
    xb = jnp.sqrt(jnp.maximum(r_b - anchor, 1e-300))
    mid, half = 0.5 * (xa + xb), 0.5 * (xb - xa)
    x = mid + half * _GL_X
    r = anchor + x * x
    rad = jax.vmap(lambda rr: radial_potential(rr, lam, eta, params))(r)
    # 1e-120 floors: keep backward locals finite on degenerate legs
    # (see _leg_theta)
    g = jnp.maximum(rad / jnp.maximum(r - anchor, 1e-120), 1e-120)
    base = 2.0 / jnp.sqrt(g)
    t_r, p_r = jax.vmap(lambda rr: t_phi_r_parts(rr, lam, params))(r)
    w = _GL_W * half
    return (jnp.sum(w * base), jnp.sum(w * base * t_r),
            jnp.sum(w * base * p_r))


# ------------------------------------------------------------ inversion

def _invert_r_leg(tau_target, r_lo, r_hi, anchor, lam, eta, params,
                  from_high, iters=50):
    """The radius at Mino time tau_target along one monotone leg.

    from_high=True: ingoing leg — tau measured from r_hi downward,
    solve  tau(r) = int_r^{r_hi} = tau_target  (increasing as r drops).
    from_high=False: outgoing leg — tau from r_lo upward, solve
    int_{r_lo}^r = tau_target."""
    def tau_of(r):
        if_in = _leg_r(r, r_hi, anchor, lam, eta, params)[0]
        return if_in

    def tau_of_out(r):
        return _leg_r(r_lo, r, anchor, lam, eta, params)[0]

    f = tau_of if from_high else tau_of_out

    def step(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        val = f(mid)
        # ingoing: tau(r) decreases with r; outgoing: increases
        too_far = (val > tau_target) if from_high else (val <
                                                        tau_target)
        if from_high:
            return jnp.where(too_far, mid, lo), jnp.where(too_far, hi,
                                                          mid)
        return jnp.where(too_far, mid, lo), jnp.where(too_far, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, step, (r_lo, r_hi))
    # Newton polish from the detached seed (implicit gradients, same
    # treatment as _invert_theta_phase): dtau/dr = -+ 1/sqrt(R) on the
    # ingoing/outgoing leg, so the step is +-res * sqrt(R).  The result
    # is clipped to the LEG DOMAIN [r_lo, r_hi] — NOT the final
    # bisection bracket: the quadrature residual carries a ~1e-13 noise
    # floor, so the honest Newton correction legitimately exceeds the
    # 2^-50 bracket; the domain clip still defuses the out-of-range
    # targets callers deliberately send down the unselected
    # ingoing/outgoing branch (bisection pins to an edge and the
    # degenerate residual leg is garbage — bounded garbage now, thanks
    # to the 1e-120 guard floors, but garbage)
    r_d = jax.lax.stop_gradient(0.5 * (lo + hi))
    res = f(r_d) - tau_target
    rad = jnp.maximum(radial_potential(r_d, lam, eta, params), 1e-30)
    sgn = 1.0 if from_high else -1.0
    return jnp.clip(r_d + sgn * res * jnp.sqrt(rad), r_lo, r_hi)


# ------------------------------------------------------------ main API

def crossing_table(q0s, p0s, params, n_orders=3, r_min_margin=1.02):
    """Exact BL records of the first ``n_orders`` equatorial crossings
    for a batch of Kerr-Schild camera rays.

    Returns a dict of (n_rays, n_orders) arrays — ``tau`` (Mino),
    ``r``, ``t`` (BL coordinate time, 0 at the camera), ``phi``
    (unwrapped BL azimuth gain from the camera), ``valid`` — plus
    per-ray ``lam``, ``eta``, ``captured``.

    A crossing is valid if it happens (i) before the ray, if
    scattering, retreats back beyond its start radius, (ii) outside
    ``r_min_margin`` x the horizon if captured (the t/phi integrands
    diverge AT the horizon in BL — a chart artifact the comparison
    windows stay clear of), and (iii) the ray is ordinary (eta > 0)
    and starts ingoing.
    """
    mass, a = params[0], params[1]
    qc = _charge(params)
    r_hor = mass + jnp.sqrt(jnp.maximum(mass * mass - a * a - qc * qc,
                                        0.0))

    def one_ray(q0, p0):
        lam, eta, th_o, s_th, s_r, r_o, e_sign = conserved_from_ks(
            q0, p0, params)
        ordinary = eta > 0.0
        ingoing = s_r < 0.0
        eta_s = jnp.where(ordinary, eta, 1.0)   # safe stand-in

        # fold the start into the upper half [th_minus, pi/2]
        below = th_o > 0.5 * jnp.pi
        th_f = jnp.where(below, jnp.pi - th_o, th_o)
        s_f = jnp.where(below, -s_th, s_th)
        th_minus = _theta_turning(lam, eta_s, params)
        th_f = jnp.clip(th_f, th_minus, 0.5 * jnp.pi)

        # polar building blocks
        to_eq = _leg_theta(th_f, 0.5 * jnp.pi, th_minus, lam, eta_s,
                           params)
        to_turn = _leg_theta(th_minus, th_f, th_minus, lam, eta_s,
                             params)
        half = _leg_theta(th_minus, 0.5 * jnp.pi, th_minus, lam, eta_s,
                          params)
        # s_f > 0: heading to the equator (leg th_f -> pi/2); s_f < 0:
        # via the turning point — (th_f -> th_minus) + (th_minus ->
        # pi/2).  (tau, t, phi) triples add leg by leg.
        toward = s_f > 0.0
        first = tuple(jnp.where(toward, te, tt + h)
                      for te, tt, h in zip(to_eq, to_turn, half))
        half2 = tuple(2.0 * h for h in half)

        ks = jnp.arange(n_orders, dtype=q0.dtype)
        tau_k = first[0] + ks * half2[0]
        t_th_k = first[1] + ks * half2[1]
        phi_th_k = first[2] + ks * half2[2]

        # radial journey
        has_turn, r4 = radial_turning(lam, eta_s, params, r_o)
        anchor_in = jnp.where(has_turn, r4, r_hor)
        leg_in_full = _leg_r(jnp.where(has_turn, r4,
                                       r_hor * r_min_margin),
                             r_o, anchor_in, lam, eta_s, params)
        tau_turn = leg_in_full[0]
        # scattering ray leaves the region after tau_turn * 2 (back to
        # r_o); captured ray runs out of usable chart at the margin
        tau_max = jnp.where(has_turn, 2.0 * tau_turn, tau_turn)

        def at_tau(tau):
            on_in = tau <= tau_turn
            # ingoing leg position
            r_in = _invert_r_leg(tau, jnp.where(
                has_turn, r4, r_hor * r_min_margin), r_o, anchor_in,
                lam, eta_s, params, from_high=True)
            # outgoing leg position (only meaningful when has_turn)
            r_out = _invert_r_leg(tau - tau_turn, r4, r_o, r4, lam,
                                  eta_s, params, from_high=False)
            r_here = jnp.where(on_in, r_in, r_out)
            # accumulated t/phi radial parts
            in_part = _leg_r(r_in, r_o, anchor_in, lam, eta_s, params)
            out_part = _leg_r(r4, r_out, r4, lam, eta_s, params)
            t_r = jnp.where(on_in, in_part[1],
                            leg_in_full[1] + out_part[1])
            p_r = jnp.where(on_in, in_part[2],
                            leg_in_full[2] + out_part[2])
            return r_here, t_r, p_r

        r_k, t_r_k, phi_r_k = jax.vmap(at_tau)(tau_k)

        valid = (ordinary & ingoing & (tau_k < tau_max)
                 & (r_k > r_hor * r_min_margin))
        return {
            "tau": tau_k,
            "r": r_k,
            "t": t_r_k + t_th_k,
            "phi": phi_r_k + phi_th_k,
            "valid": valid,
            "lam": lam,
            "eta": eta,
            "e_sign": e_sign,
            "captured": ordinary & ~has_turn,
        }

    return jax.vmap(one_ray)(q0s, p0s)


# jitted entry for renderers (n_orders / r_min_margin are trace-static)
crossing_table_jit = jax.jit(crossing_table,
                             static_argnames=("n_orders",
                                              "r_min_margin"))


# ---------------------------------------------------------- escape state

def _invert_theta_phase(u, th_minus, lam, eta, params, iters=50):
    """theta in [th_minus, pi/2] whose Mino phase from the turning point
    int_{th_minus}^{theta} dth/sqrt(Theta) equals u (0 <= u <=
    G_half/2; pi/2 maps to G_half/2 by equatorial symmetry — callers
    fold the lower hemisphere so the bisection never approaches the
    unregularized far turning point)."""
    def step(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        val = _leg_theta(th_minus, mid, th_minus, lam, eta, params)[0]
        too_far = val > u
        return jnp.where(too_far, lo, mid), jnp.where(too_far, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, step,
                               (th_minus, 0.5 * jnp.pi))
    # Newton polish from the detached seed: the residual's theta
    # derivative is 1/sqrt(Theta) exactly, so the step is
    # -res * sqrt(Theta) — and evaluating the residual differentiably
    # in (u, th_minus, lam, eta, params) gives the inversion the
    # implicit gradient (d theta/d u = sqrt(Theta), -> 0 at the
    # turning point as it must)
    th_d = jax.lax.stop_gradient(0.5 * (lo + hi))
    res = _leg_theta(th_minus, th_d, th_minus, lam, eta, params)[0] - u
    theta_pot = jnp.maximum(eta - w_polar(th_d, lam, params), 1e-30)
    # clip to the DOMAIN, not the bisection bracket: the quadrature
    # residual's noise floor makes honest corrections exceed the 2^-50
    # bracket (see _invert_r_leg)
    return jnp.clip(th_d - res * jnp.sqrt(theta_pot), th_minus,
                    0.5 * jnp.pi)


def escape_state(q0s, p0s, params, r_bound):
    """Exact boundary-sphere escape records for a batch of Kerr-Schild
    camera rays: where each SCATTERING ray exits the BL sphere
    r = r_bound — the event the background classifier reads
    (engine/render_generic.py classifies escaped rays by their final
    position angles on the boundary sphere).

    Returns per-ray ``theta`` (BL polar angle at exit), ``phi`` and
    ``t`` (unwrapped BL gains from the camera, e_sign convention as
    crossing_table), ``tau``, ``escaped`` (False = captured: the
    analytic shadow — no step budget, no 'in_domain' class, ever),
    ``e_sign``, plus ``lam``/``eta``.

    The polar motion is a triangle wave in Mino phase: position
    x = fold(y) on [0, G_half] with lifted phase y = y0 + tau, where
    G(theta) = int_{th-} dth/sqrt(Theta) and even integrands make every
    half-sweep contribute equally — so the t/phi polar parts accumulate
    as (full half-sweeps) * F_half + a partial leg, and theta itself
    inverts from the folded phase.
    """
    q0s = jnp.asarray(q0s)
    r_bounds = jnp.broadcast_to(jnp.asarray(r_bound, q0s.dtype),
                                q0s.shape[:1])

    def one_ray(q0, p0, rb):
        lam, eta, th_o, s_th, s_r, r_o, e_sign = conserved_from_ks(
            q0, p0, params)
        # an equatorial camera's central row has p_theta = 0 exactly:
        # eta = 0, theta frozen at pi/2, polar t/phi gains identically 0
        # (the gauge zeroes them at the equator) — the eta -> 0+ limit
        # of the phase walk, selected explicitly so odd image sizes
        # don't misclassify the row as captured.  Under jit the
        # w_polar difference reassociates to O(1e-14 lam^2) noise
        # instead of the interpreted path's exact zero (a sign flip
        # would swap in the vortical stand-in potential and scramble
        # the capture verdict), so snap to zero below the
        # rounding-noise scale — far under any true off-equator eta
        eta = jnp.where(
            jnp.abs(eta) <= 1e-12 * (1.0 + lam * lam
                                     + params[1] * params[1]),
            0.0, eta)
        ordinary = eta > 0.0
        equatorial = eta == 0.0
        # the polar machinery needs eta > 0 strictly (stand-in
        # otherwise); the RADIAL potential must see the true eta — an
        # equatorial ray's capture verdict flips under the stand-in
        eta_s = jnp.where(ordinary, eta, 1.0)
        eta_r = jnp.where(eta >= 0.0, eta, 1.0)
        th_minus = _theta_turning(lam, eta_s, params)

        # radial journey out to the boundary (not just back to r_o);
        # rb may vary per ray so parity tests can meet the integrator
        # at ITS recorded stop radius
        has_turn, r4 = radial_turning(lam, eta_r, params, r_o)
        leg_in = _leg_r(r4, r_o, r4, lam, eta_r, params)
        leg_out = _leg_r(r4, rb, r4, lam, eta_r, params)
        tau_esc = leg_in[0] + leg_out[0]
        t_r = leg_in[1] + leg_out[1]
        phi_r = leg_in[2] + leg_out[2]

        # polar phase walk --------------------------------------------
        half = _leg_theta(th_minus, 0.5 * jnp.pi, th_minus, lam, eta_s,
                          params)
        g_half = 2.0 * half[0]          # full sweep th- -> pi - th-

        # start phase x0 = G(theta_start) over the TRUE (unfolded) range
        below = th_o > 0.5 * jnp.pi
        th_fold = jnp.where(below, jnp.pi - th_o, th_o)
        th_fold = jnp.clip(th_fold, th_minus, 0.5 * jnp.pi)
        seg = _leg_theta(th_minus, th_fold, th_minus, lam, eta_s, params)
        x0 = jnp.where(below, g_half - seg[0], seg[0])
        # ascending lift: y0 = x0 if dtheta/dtau > 0 else 2 G_half - x0
        y0 = jnp.where(s_th > 0.0, x0, 2.0 * g_half - x0)
        y1 = y0 + tau_esc

        def q_acc(y):
            """Accumulated (tau, t, phi) polar triple over lifted phase
            [0, y] (phase 0 = at th- ascending), the TRUE polar angle
            at that phase, and the sweep index k (for pole counting)."""
            k = jnp.floor(y / g_half)
            u = y - k * g_half                     # into this sweep
            asc = jnp.mod(k, 2.0) == 0.0
            # phase position within the sweep (0 at th-, g_half at the
            # far turning); descending sweeps run it backward
            x = jnp.where(asc, u, g_half - u)
            # fold the lower hemisphere: x > g_half/2 mirrors
            lower = x > 0.5 * g_half
            x_up = jnp.where(lower, g_half - x, x)
            th_up = _invert_theta_phase(x_up, th_minus, lam, eta_s,
                                        params)
            th_true = jnp.where(lower, jnp.pi - th_up, th_up)
            part = _leg_theta(th_minus, th_up, th_minus, lam, eta_s,
                              params)
            full = (2.0 * half[0], 2.0 * half[1], 2.0 * half[2])
            # P(x) = integral over phase [0, x]; even integrands give
            # the lower-hemisphere piece as F_sweep - P_upper(mirror)
            p_x = tuple(jnp.where(lower, f - p, p)
                        for f, p in zip(full, part))
            # ascending segment contributes P(u) = P(x); descending
            # contributes F_sweep - P(g_half - u) = F_sweep - P(x)
            vals = tuple(k * f + jnp.where(asc, px, f - px)
                         for f, px in zip(full, p_x))
            return vals, th_true, k

        (q1, t1, p1), th_esc, k1 = q_acc(y1)
        (q0_, t0_, p0_), _, k0 = q_acc(y0)

        # lam = 0 rays CIRCULATE through the poles (W_th <= 0 has no
        # root; th_minus collapses to the axis): BL azimuth flips by pi
        # at every pole touch — a coordinate reflection the 1-D phi
        # quadrature cannot see.  Touches sit exactly at the sweep
        # boundaries (integer multiples of g_half), so the flip count
        # between camera and exit is k1 - k0.  Coordinate t is
        # continuous through the pole: no correction there.
        pole_flips = jnp.where((lam == 0.0) & ~equatorial, k1 - k0, 0.0)

        # unfold: the phase coordinate already spans the full libration
        # [th-, pi - th-]; th_esc IS the BL polar angle at exit
        return {
            "theta": jnp.where(equatorial, 0.5 * jnp.pi, th_esc),
            "phi": (phi_r + jnp.where(equatorial, 0.0, p1 - p0_)
                    + jnp.pi * pole_flips),
            "t": t_r + jnp.where(equatorial, 0.0, t1 - t0_),
            "tau": tau_esc,
            "escaped": ((ordinary | equatorial) & has_turn
                        & (s_r < 0.0)),
            "e_sign": e_sign,
            "lam": lam,
            "eta": eta,
        }

    return jax.vmap(one_ray)(q0s, p0s, r_bounds)


escape_state_jit = jax.jit(escape_state)
