"""Photon-shell critical parameters: Lyapunov exponent, delay, winding.

The photon ring seen in every subring render (engine/subring.py) is the
image of the *photon shell* — the family of bound spherical photon
orbits r = r~ that near-critical rays shadow for a few polar periods
before escaping.  Three numbers per shell orbit control the whole
observable structure (Gralla, Holz & Wald 2019; Johnson et al. 2020):

  * gamma   — the Lyapunov exponent per polar half-orbit: consecutive
              image orders are demagnified by e^{-gamma},
  * delta_t — the coordinate-time lapse per half-orbit: the light-echo
              delay between consecutive subrings,
  * delta_phi — the azimuthal winding per half-orbit: the rotation of
              successive subimages.

Like the rest of the physics layer, nothing here restates a textbook
formula.  The Kerr-Newman Hamiltonian separates in Boyer-Lindquist
coordinates; multiplying the null condition by Sigma = 1/g^{thth}
splits it into Mino-time potentials

    (dr/dtau_M)^2     = R(r)      = -Delta(r) (K + W_r(r)),
    (dtheta/dtau_M)^2 = Theta(th) = K - W_th(th),

where W(r, th) = Sigma (g^{tt} - 2 g^{tphi} xi + g^{phiphi} xi^2) is
evaluated from the SAME ``kerr_g_inv`` every ray integrates (E = 1,
xi = L_z/E), split as W_r(r) = W(r, pi/2) and W_th(th) = W(r, th) -
W(r, pi/2) — the split is r-independent precisely because the metric
separates, and the tests assert that numerically.  K is the Carter
constant in the gauge W_th(pi/2) = 0 (so K = eta, Bardeen's constant).

Criticality collapses to ONE scalar condition: R(r~) = 0 fixes
K = -W_r(r~), and then R'(r~) = 0 reduces to dW_r/dr(r~, xi) = 0, a
quadratic in xi whose coefficients come from three AD evaluations.  The
three observables follow from second derivatives and turning-point-
regularized Gauss-Legendre quadrature (substituting
th = mid + amp sin(u) makes the integrand smooth through the 1/sqrt
turning points):

    gamma     = sqrt(R''(r~)/2) * T_half,   T_half = int dth / sqrt(Theta),
    delta_t   = int Sigma p^t dth / sqrt(Theta),
    delta_phi = int Sigma p^phi dth / sqrt(Theta).

Checks (tests/test_photon_shell.py): the Bardeen closed forms xi_c(r~),
eta_c(r~); the Schwarzschild exact triple gamma = pi,
delta_t = pi sqrt(27) M at every inclination of the critical cone; and
— the strong one — the production Kerr-Schild integrator's own
equatorial-crossing counter, whose growth with -ln(distance to the
critical curve) measures 1/gamma directly (the subring flux-ratio law
the renders obey).

No reference counterpart: the reference traces rays but has no bound-
orbit theory (simulation/raytracing.py).  Geometrized units G = c = 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .spacetime import _charge, kerr_g_inv

# Gauss-Legendre nodes/weights for the polar quadrature, computed once
# host-side (float64) — 64 nodes resolve the smooth substituted
# integrand to ~1e-12
_GL_X, _GL_W = np.polynomial.legendre.leggauss(64)
_GL_X = jnp.asarray(_GL_X)
_GL_W = jnp.asarray(_GL_W)


def _g_at(r, th, params):
    zero = jnp.zeros_like(r + th)
    return kerr_g_inv(jnp.stack([zero, r + zero, th + zero, zero]), params)


def w_quad(r, th, xi, params):
    """Sigma * g^{ab} p_a p_b restricted to the Killing covector
    p = -dt + xi dphi (E = 1).  Sigma = 1/g^{thth} — from the metric
    itself, not a memory of it."""
    g = _g_at(r, th, params)
    sigma = 1.0 / g[2, 2]
    return sigma * (g[0, 0] - 2.0 * g[0, 3] * xi + g[3, 3] * xi * xi)


def w_radial(r, xi, params):
    """The radial separated potential W_r(r) (gauge W_th(pi/2) = 0)."""
    return w_quad(r, 0.5 * jnp.pi, xi, params)


def w_polar(th, xi, params, r_ref=10.0):
    """The polar separated potential W_th(th); r_ref is arbitrary by
    separability (asserted in tests, not assumed silently)."""
    r = jnp.asarray(r_ref)
    return w_quad(r, th, xi, params) - w_quad(r, 0.5 * jnp.pi, xi, params)


def _delta(r, params):
    """Delta(r) = Sigma g^{rr}, from the metric."""
    g = _g_at(r, 0.5 * jnp.pi, params)
    return g[1, 1] / g[2, 2]


def critical_orbit(r_tilde, params):
    """(xi, K) of the bound spherical photon orbit at BL radius r~.

    dW_r/dr(r~, xi) = 0 is exactly quadratic in xi (W is built from a
    quadratic form in the covector), so three AD evaluations at
    xi = -1, 0, +1 give its coefficients; of the two roots the physical
    one has K = -W_r >= 0 and carries the Bardeen branch (prograde
    xi > 0 at small r~, retrograde xi < 0 at large r~) — selected as
    the root with the larger K, which the closed-form comparison test
    pins across the shell.  At a = 0 the condition degenerates (every
    xi is critical at r~ = 3M); the quadratic's coefficients all vanish
    and the polar orbit xi = 0 is returned.
    """
    dwr = jax.grad(w_radial, argnums=0)
    f0 = dwr(r_tilde, jnp.zeros_like(r_tilde), params)
    fp = dwr(r_tilde, jnp.ones_like(r_tilde), params)
    fm = dwr(r_tilde, -jnp.ones_like(r_tilde), params)
    c1 = 0.5 * (fp - fm)
    c2 = 0.5 * (fp + fm) - f0
    disc = jnp.sqrt(jnp.maximum(c1 * c1 - 4.0 * c2 * f0, 0.0))
    degenerate = jnp.abs(c2) < 1e-12
    c2s = jnp.where(degenerate, 1.0, c2)
    roots = jnp.stack([(-c1 + disc) / (2.0 * c2s),
                       (-c1 - disc) / (2.0 * c2s)])
    ks = -jax.vmap(lambda x: w_radial(r_tilde, x, params))(roots)
    xi = jnp.where(degenerate, 0.0, roots[jnp.argmax(ks)])
    return xi, -w_radial(r_tilde, xi, params)


def _theta_turning(xi, k_const, params, iters=60):
    """Upper-hemisphere polar turning point theta_- in (0, pi/2]:
    the root of Theta(th) = K - W_th(th) = 0, which exists and is unique
    for xi != 0 (W_th rises monotonically from 0 at the equator to
    +inf at the axis through the xi^2 cot^2-like term).  For the polar
    orbit xi = 0 with W_th <= K everywhere the bisection collapses to
    the axis and the orbit circulates; returns ~0 there.
    """
    f = lambda th: k_const - w_polar(th, xi, params)
    lo = jnp.asarray(1e-9)
    hi = jnp.asarray(0.5 * jnp.pi)
    exists = f(lo) < 0.0   # a forbidden polar cap to turn around in

    def step(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        neg = f(mid) < 0.0   # inside the forbidden polar cap
        return jnp.where(neg, mid, lo), jnp.where(neg, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, step, (lo, hi))
    # One Newton step from the DETACHED bisected root.  The value moves
    # by less than the 2^-60 bracket, but because f is evaluated
    # differentiably in (xi, k_const, params) the expression carries
    # the implicit-function-theorem gradient d th_- = -f_p / f_th' that
    # the bisection's select chain cannot (its iterate is piecewise
    # constant in the inputs).  Circulating xi = 0 orbits have no root
    # (f > 0 all the way to the axis, f' -> 0 there): keep the
    # collapsed value, zero step.
    th_d = jax.lax.stop_gradient(0.5 * (lo + hi))
    fd = f(th_d)
    fp = jax.grad(f)(th_d)
    denom = jnp.where(exists & (jnp.abs(fp) > 1e-300), fp, 1.0)
    # result clipped to the DOMAIN — not the collapsed bisection
    # bracket, which stalls at ~1 ulp while f's cancellation noise
    # makes the honest Newton step larger (a bracket clip would bind
    # and silently zero the implicit gradient; see
    # geodesic_exact.radial_turning)
    polished = jnp.clip(th_d - fd / denom, 1e-9, 0.5 * jnp.pi)
    return jnp.where(exists, polished, th_d)


def critical_parameters(r_tilde, params):
    """(gamma, delta_t, delta_phi, xi, K) at shell radius r~ — the
    Lyapunov exponent, coordinate-time lapse and azimuthal winding per
    polar HALF-orbit of the bound photon orbit.

    All three integrals run over one polar libration theta in
    [theta_-, pi - theta_-], substituted th = pi/2 + A sin(u) so the
    1/sqrt(Theta) turning-point singularities cancel exactly
    (Theta has simple zeros at both ends; the Jacobian A cos(u)
    matches them).  Polar orbits (xi = 0) circulate instead of
    librating; the same formula covers them because theta_- -> 0 and
    sin(pi/2 +- A) parametrizes the full meridian.
    """
    xi, k_const = critical_orbit(r_tilde, params)

    # radial instability rate: R'' at the double root (where
    # R = R' = 0, so R'' = -Delta W_r'' exactly — but AD differentiates
    # the full product, no hand identity needed)
    rad = lambda rr: -_delta(rr, params) * (k_const
                                            + w_radial(rr, xi, params))
    d2r = jax.grad(jax.grad(rad))(r_tilde)
    lam = jnp.sqrt(jnp.maximum(0.5 * d2r, 0.0))

    th_min = _theta_turning(xi, k_const, params)
    amp = 0.5 * jnp.pi - th_min
    th_u = 0.5 * jnp.pi + amp * jnp.sin(0.5 * jnp.pi * _GL_X)

    def integrands(th):
        theta_pot = k_const - w_polar(th, xi, params)
        # Theta = (amp^2 - (th - pi/2)^2) * h(th) with h smooth > 0;
        # the substitution's Jacobian cancels the root exactly:
        # dth / sqrt(Theta) = (pi/2) du / sqrt(h), and
        # amp^2 - (th-pi/2)^2 = amp^2 cos^2(pi u / 2)... expressed
        # directly below to stay exact at the endpoints
        dev = th - 0.5 * jnp.pi
        quad = jnp.maximum(amp * amp - dev * dev, 1e-300)
        h = jnp.maximum(theta_pot / quad, 1e-300)
        base = 1.0 / jnp.sqrt(h)
        g = _g_at(r_tilde, th, params)
        sigma = 1.0 / g[2, 2]
        p_t_up = -g[0, 0] + g[0, 3] * xi       # p^t for p_t = -1
        p_phi_up = -g[0, 3] + g[3, 3] * xi     # p^phi
        return base, base * sigma * p_t_up, base * sigma * p_phi_up

    b, bt, bp = jax.vmap(integrands)(th_u)
    # dth = amp cos(pi u/2) (pi/2) du and sqrt(quad) = amp cos(pi u/2),
    # so int dth/sqrt(Theta) = (pi/2) int du/sqrt(h) — weight pi/2
    half = 0.5 * jnp.pi
    t_half = half * jnp.sum(_GL_W * b)
    delta_t = half * jnp.sum(_GL_W * bt)
    delta_phi = half * jnp.sum(_GL_W * bp)
    return lam * t_half, delta_t, delta_phi, xi, k_const


def polar_shell_radius(params, iters=60):
    """The shell radius of the POLAR (L_z = 0) orbit — the one on-axis
    observers' critical rays shadow.  xi_c(r~) falls monotonically from
    the prograde (+) to the retrograde (-) edge; bisect its zero."""
    r_min, r_max = shell_radius_range(params)

    def step(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        pro = critical_orbit(mid, params)[0] > 0.0
        return jnp.where(pro, mid, lo), jnp.where(pro, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, step,
                               (r_min + 1e-9, r_max - 1e-9))
    return 0.5 * (lo + hi)


def theta_potential(th, xi, k_const, params):
    """The polar potential Theta(th) = K - W_th(th): the orbit reaches
    latitude th iff Theta(th) >= 0."""
    return k_const - w_polar(th, xi, params)


def _spherical_photon_radius(params, iters=60):
    """a = 0 photon-sphere radius: the root of dW_r/dr(r, xi=0) = 0 in
    (r_horizon, 5M] — unique for Schwarzschild / Reissner-Nordstrom
    (closed form (3M + sqrt(9M^2 - 8Q^2))/2, recovered here from the
    metric itself like everything else in this module)."""
    mass = params[0]
    dwr = jax.grad(w_radial, argnums=0)
    f = lambda r: dwr(r, jnp.zeros_like(r), params)
    qc = _charge(params)
    lo = mass * (1.0 + jnp.sqrt(jnp.maximum(
        1.0 - qc * qc / (mass * mass), 0.0))) + 1e-6
    hi = 5.0 * mass
    sign_hi = f(hi) > 0.0

    def step(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        cond = (f(mid) > 0.0) == sign_hi
        return jnp.where(cond, lo, mid), jnp.where(cond, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, step, (lo, hi))
    return 0.5 * (lo + hi)


def shell_visible_range(params, theta_obs, iters=60):
    """(r_lo, r_hi): the sub-range of the photon shell whose orbits
    reach the observer latitude theta_obs — the shell radii that appear
    ON the critical curve of a theta_obs-inclined image (Gralla-Holz-
    Wald 2019 §V; each screen point on the curve shadows one r~).

    Solves Theta(theta_obs; xi(r~), K(r~)) = 0 by bisection against the
    critical pair from ``critical_orbit``, anchored at the POLAR orbit
    (xi = 0), which is visible from every latitude (Theta = eta +
    a^2 cos^2 th > 0 there); the shell edges are invisible for
    theta_obs < pi/2 (K -> 0 with |xi| > a sin th).  Face-on the
    visible band can be arbitrarily narrow — bisection from the polar
    anchor resolves it where any grid scan would miss it.  Edge-on
    (theta_obs = pi/2) both bisections run to the shell edges, where
    Theta = K -> 0.
    """
    r_min, r_max = shell_radius_range(params)
    r_polar = polar_shell_radius(params)

    def vis(r):
        xi, k_const = critical_orbit(r, params)
        return theta_potential(theta_obs, xi, k_const, params) > 0.0

    def bisect(invis, visb):
        """Boundary between an invisible and a visible endpoint."""
        def step(_, lh):
            invis, visb = lh
            mid = 0.5 * (invis + visb)
            v = vis(mid)
            return (jnp.where(v, invis, mid), jnp.where(v, mid, visb))
        invis, visb = jax.lax.fori_loop(0, iters, step, (invis, visb))
        return 0.5 * (invis + visb)

    pad = 1e-9
    return (bisect(r_min + pad, r_polar), bisect(r_max - pad, r_polar))


def critical_curve_observables(params, theta_obs, n=64):
    """The critical curve seen from latitude theta_obs, with the GHW
    triple at every point: dict of (n,)-arrays keyed

      r        — shell radius r~ shadowed by that screen point,
      alpha    — asymptotic Bardeen screen abscissa  -xi / sin(theta_obs),
      beta     — screen ordinate  +sqrt(Theta(theta_obs))  (the curve is
                 beta -> -beta symmetric; upper branch returned),
      gamma, delta_t, delta_phi — Lyapunov exponent, time lapse and
                 azimuthal winding per half-orbit (``critical_parameters``),
      xi, eta  — the conserved pair.

    (alpha, beta) is the OBSERVER-AT-INFINITY gauge; the renderer's
    finite-distance Kerr-Schild camera differs by O(2M/r_obs) apparent
    size (see physics/camera.py note) — compare shapes and the per-point
    GHW numbers, not absolute pixel radii.

    a = 0 (Schwarzschild / Reissner-Nordstrom) is spherically symmetric:
    the shell collapses to ONE photon-sphere radius and the curve to a
    circle, so the r~-parametrization degenerates — the circle is
    returned parametrized by screen angle instead, with constant GHW
    triple.
    """
    if abs(float(params[1])) < 1e-8:
        r_ph = _spherical_photon_radius(params)
        gam, dt, dphi, xi, eta = critical_parameters(r_ph, params)
        b_c = jnp.sqrt(eta)
        psi = jnp.linspace(0.0, jnp.pi, n)
        ones = jnp.ones((n,))
        return {
            "r": r_ph * ones,
            "alpha": b_c * jnp.cos(psi),
            "beta": b_c * jnp.sin(psi),
            "gamma": gam * ones,
            "delta_t": dt * ones,
            "delta_phi": dphi * ones,
            "xi": xi * ones,
            "eta": eta * ones,
        }

    r_lo, r_hi = shell_visible_range(params, theta_obs)
    # inset so Theta >= 0 holds strictly at the sample points
    eps = 1e-9 + 1e-6 * (r_hi - r_lo)
    rs = jnp.linspace(r_lo + eps, r_hi - eps, n)
    gam, dt, dphi, xi, eta = jax.vmap(
        lambda r: critical_parameters(r, params))(rs)
    theta_pot = jax.vmap(
        lambda x, k: theta_potential(theta_obs, x, k, params))(xi, eta)
    return {
        "r": rs,
        "alpha": -xi / jnp.sin(theta_obs),
        "beta": jnp.sqrt(jnp.maximum(theta_pot, 0.0)),
        "gamma": gam,
        "delta_t": dt,
        "delta_phi": dphi,
        "xi": xi,
        "eta": eta,
    }


def shell_radius_range(params, prograde_pad=1e-6, n_scan=512, iters=60):
    """(r_min, r_max): the radial extent of the photon shell — where the
    critical orbit's Carter constant K crosses zero (the equatorial
    prograde / retrograde circular photon orbits).  Bisection on a
    bracketing scan; no closed form (none exists for Kerr-Newman).
    """
    mass = params[0]
    k_of = lambda r: critical_orbit(r, params)[1]
    grid = jnp.linspace(1.0 * mass + prograde_pad, 4.5 * mass, n_scan)
    ks = jax.vmap(k_of)(grid)
    pos = ks > 0.0
    # innermost positive-K run: bisect K = 0 against its two neighbors
    first = jnp.argmax(pos)                      # first True
    last = n_scan - 1 - jnp.argmax(pos[::-1])    # last True

    def bisect(lo, hi, want_pos_hi):
        def step(_, lh):
            lo, hi = lh
            mid = 0.5 * (lo + hi)
            p = k_of(mid) > 0.0
            cond = p == want_pos_hi
            return jnp.where(cond, lo, mid), jnp.where(cond, mid, hi)
        lo, hi = jax.lax.fori_loop(0, iters, step, (lo, hi))
        return 0.5 * (lo + hi)

    r_min = bisect(grid[jnp.maximum(first - 1, 0)], grid[first], True)
    r_max = bisect(grid[last], grid[jnp.minimum(last + 1, n_scan - 1)],
                   False)
    return r_min, r_max
