"""Circular orbits and disk physics for static spherically-symmetric metrics.

Static-family twin of physics/orbits.py (which hardcodes the Kerr-Newman
``kerr_g_inv``): every quantity here is derived from the single lapse
function f(r) of ``physics.static_metrics`` (Kottler / Bardeen / Hayward,
plus Schwarzschild as the f = 1 - 2M/r limit) with AUTODIFF derivatives —
no hand-derived per-family formulas to get wrong.

For ds^2 = -f dt^2 + dr^2/f + r^2 dOmega^2 the circular timelike geodesic
at areal radius r has

    Omega^2   = f'(r) / (2 r)                 (coordinate angular velocity)
    u^t       = 1 / sqrt(f - r^2 Omega^2)     (timelike normalization;
                 the denominator hits zero exactly at the photon sphere
                 2 f = r f', static_metrics.photon_sphere)
    E = f u^t,   L = r^2 Omega u^t            (Killing charges)

Marginal stability (the ISCO) is the minimum of L(r) on the circular-orbit
branch — found by scan + fixed-count bisection on d(L^2)/dr, the same
robust pattern static_metrics.outer_horizon uses.  Kottler additionally
has an OUTER marginally stable orbit (the cosmological constant's tide
destabilizes distant orbits): `osco_static` returns it, and disks in
Kottler must live inside it.

The reference has none of this (its pipeline is Schwarzschild background
lensing only, simulation/raytracing.py:164-280); this module powers the
beyond-Kerr accretion-disk renderer (engine/disk_static.py) and the QPO /
epicyclic observables for regular black holes.

Conventions match physics/orbits.py: geometrized units, covector momenta,
`prograde` flips the sign of Omega (rotation sense about the disk normal).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .static_metrics import STATIC_F, photon_sphere


def keplerian_omega_static(r, f_fn, params, prograde=True):
    """Coordinate angular velocity Omega = +-sqrt(f'(r) / (2 r)) of the
    circular geodesic.  NaN where no circular orbit exists (f' < 0 — e.g.
    beyond Kottler's static radius (3M/Lambda)^(1/3), where the
    cosmological expansion wins and nothing can orbit)."""
    fp = jax.grad(f_fn, argnums=0)(r, params)
    mag = jnp.sqrt(fp / (2.0 * r))
    return jnp.where(prograde, mag, -mag)


def circular_u_t_static(r, f_fn, params):
    """u^t of the circular geodesic: 1/sqrt(f - r^2 Omega^2) =
    1/sqrt(f - r f'/2).  NaN inside the photon sphere (no timelike
    circular orbit)."""
    f = f_fn(r, params)
    fp = jax.grad(f_fn, argnums=0)(r, params)
    return 1.0 / jnp.sqrt(f - 0.5 * r * fp)


def circular_e_l_static(r, f_fn, params, prograde=True):
    """Killing charges (E, L) = (f u^t, r^2 Omega u^t) of the circular
    geodesic at r.  L's sign follows the rotation sense."""
    u_t = circular_u_t_static(r, f_fn, params)
    omega = keplerian_omega_static(r, f_fn, params, prograde)
    return f_fn(r, params) * u_t, r * r * omega * u_t


def _l2(r, f_fn, params):
    """L^2(r) = r^3 f' / (2 f - r f') — squared angular momentum of the
    circular orbit, the function whose stationary points are the
    marginally stable orbits.  (Schwarzschild: M r^2/(r - 3M), minimized
    at exactly 6M.)"""
    f = f_fn(r, params)
    fp = jax.grad(f_fn, argnums=0)(r, params)
    return r ** 3 * fp / (2.0 * f - r * fp)


def _stability_scan(f_fn, params, r_lo, r_hi, n_scan, rising, iters):
    """First sign change of d(L^2)/dr from -/+ (`rising`=True: the ISCO,
    L^2 falling then rising) or +/- (`rising`=False: the OSCO) on a
    geometric scan of [r_lo, r_hi], refined by fixed-count bisection.
    Returns NaN when the slope never changes sign in the bracket."""
    dl2 = jax.grad(_l2, argnums=0)

    u = jnp.linspace(0.0, 1.0, n_scan)
    rs = r_lo * (r_hi / r_lo) ** u
    sl = jax.vmap(lambda r: dl2(r, f_fn, params))(rs)
    want = (sl[:-1] < 0.0) & (sl[1:] > 0.0) if rising else \
           (sl[:-1] > 0.0) & (sl[1:] < 0.0)
    has = jnp.any(want)
    idx = jnp.argmax(want)
    lo, hi = rs[idx], rs[idx + 1]

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        s = dl2(mid, f_fn, params)
        neg = (s < 0.0) if rising else (s > 0.0)
        return jnp.where(neg, mid, lo), jnp.where(neg, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, bisect, (lo, hi))
    return jnp.where(has, 0.5 * (lo + hi), jnp.nan)


def isco_static(f_fn, params, r_hi=None, n_scan=512, iters=60):
    """Innermost stable circular orbit: the minimum of L^2(r) outside the
    photon sphere.  Scan + bisection (robust over the whole sub-critical
    parameter range, unlike Newton whose basin shrinks near criticality).
    NaN when no stable circular orbit exists."""
    mass = params[0]
    r_ph = photon_sphere(f_fn, params)
    if r_hi is None:
        r_hi = 40.0 * mass
    return _stability_scan(f_fn, params, r_ph * 1.001, r_hi,
                           n_scan, True, iters)


def osco_static(f_fn, params, r_hi, n_scan=512, iters=60):
    """OUTERMOST stable circular orbit (Kottler: the cosmological tide
    destabilizes orbits beyond it; NaN for asymptotically flat families
    where stability extends to infinity).  `r_hi` must stay inside the
    circular-orbit branch (below the static radius (3M/Lambda)^(1/3) for
    Kottler — callers bound it by the cosmological horizon)."""
    mass = params[0]
    r_ph = photon_sphere(f_fn, params)
    return _stability_scan(f_fn, params, r_ph * 1.001, r_hi,
                           n_scan, False, iters)


def epicyclic_static(r, f_fn, params):
    """Coordinate-time epicyclic frequencies (Omega_phi, kappa_r,
    Omega_theta) of the circular orbit at r.

    Spherical symmetry pins Omega_theta = Omega_phi (orbital planes do
    not precess — no Lense-Thirring, no quadrupole); the radial epicyclic
    comes from the effective potential of the radial motion,

        (dr/dtau)^2 = E^2 - W(r),   W = f (1 + L^2/r^2),

    as kappa^2 = W''(r_c) / (2 (u^t)^2) with L frozen at the circular
    value (the perturbed orbit conserves L).  Schwarzschild closed form
    kappa^2 = (M/r^3)(1 - 6M/r) is a test oracle, not the implementation
    (tests/test_static_disk.py)."""
    omega = keplerian_omega_static(r, f_fn, params, True)
    u_t = circular_u_t_static(r, f_fn, params)
    _, l_c = circular_e_l_static(r, f_fn, params, True)
    l2 = l_c * l_c

    def w(rr):
        return f_fn(rr, params) * (1.0 + l2 / (rr * rr))

    w2 = jax.grad(jax.grad(w))(r)
    # NaN below the ISCO (W'' < 0): radial perturbations grow, there is
    # no epicyclic oscillation to name — same semantics as the Kerr
    # layer.  Use radial_stability_static for the signed discriminant.
    kappa = jnp.sqrt(0.5 * w2) / u_t
    return omega, kappa, omega


def radial_stability_static(r, f_fn, params):
    """Signed kappa^2 (coordinate-time): positive on stable circular
    orbits, zero at the ISCO/OSCO, negative in between instability —
    the discriminant the marginal-stability tests pin without tripping
    sqrt's NaN at the exact root."""
    u_t = circular_u_t_static(r, f_fn, params)
    _, l_c = circular_e_l_static(r, f_fn, params, True)
    l2 = l_c * l_c

    def w(rr):
        return f_fn(rr, params) * (1.0 + l2 / (rr * rr))

    return 0.5 * jax.grad(jax.grad(w))(r) / (u_t * u_t)


def qpo_frequencies_static_hz(r, f_fn, params, mass_msun):
    """Observable QPO frequencies in Hz at areal radius r for a hole of
    `mass_msun` solar masses — the same dict and unit chain as
    physics.epicyclic.qpo_frequencies_hz (nu = Omega * M_code /
    (2 pi mass_msun T_SUN_S)).  Spherical symmetry makes the nodal
    (Lense-Thirring) precession identically zero — itself a sharp
    observable discriminator against any spinning hole."""
    from .epicyclic import T_SUN_S
    om, ka, ot = epicyclic_static(r, f_fn, params)
    scale = params[0] / (2.0 * jnp.pi * mass_msun * T_SUN_S)
    nu_phi, nu_r, nu_th = om * scale, ka * scale, ot * scale
    return {
        "nu_phi": nu_phi,
        "nu_r": nu_r,
        "nu_theta": nu_th,
        "nu_periastron": nu_phi - nu_r,
        "nu_nodal": nu_phi - nu_th,
    }


def page_thorne_flux_static(r_grid, f_fn, params, prograde=True):
    """Novikov-Thorne disk flux F(r) on `r_grid` for a static f(r) metric
    — the Page & Thorne (1974) eq. (11b) quadrature, exactly as
    physics.orbits.page_thorne_flux but with the static-family circular
    orbits.  The proper-area measure sqrt(-det g3) is exactly r for every
    static metric (det of diag(-f, 1/f, r^2)), so it appears as the bare
    r below.  r_grid[0] is the torque-free inner boundary; Mdot = 1."""
    def eol(r):
        e, l = circular_e_l_static(r, f_fn, params, prograde)
        return e, l, keplerian_omega_static(r, f_fn, params, prograde)

    e, l, omega = jax.vmap(eol)(r_grid)
    dl_dr = jax.vmap(jax.grad(
        lambda r: circular_e_l_static(r, f_fn, params, prograde)[1]))(r_grid)
    domega_dr = jax.vmap(jax.grad(
        lambda r: keplerian_omega_static(r, f_fn, params, prograde)))(r_grid)

    integrand = (e - omega * l) * dl_dr
    dr = jnp.diff(r_grid)
    segments = 0.5 * (integrand[1:] + integrand[:-1]) * dr
    cumulative = jnp.concatenate([jnp.zeros((1,), r_grid.dtype),
                                  jnp.cumsum(segments)])
    flux = (-domega_dr * cumulative
            / ((e - omega * l) ** 2 * 4.0 * jnp.pi * r_grid))
    return jnp.maximum(flux, 0.0)


def redshift_factor_static(energy, l_n, r_em, r_obs, f_fn, params,
                           prograde=True):
    """g = nu_obs/nu_em for a photon with Killing energy E = -p_t and
    angular momentum L_n ABOUT THE DISK NORMAL, emitted by the circular
    Keplerian emitter at r_em and received by the STATIC observer at
    r_obs:

        -p.u_em  = u^t_em (E - Omega L_n)
        -p.u_obs = E / sqrt(f(r_obs))

    Homogeneous of degree zero in (E, L_n), so the backward-tracing
    momentum scale/sign convention cancels (same property as
    orbits.redshift_factor).  In the disk-tilt formulation of the static
    disk renderer L_n = p_phi * cos(beta) cos(elev) per ray — a product
    of conserved quantities and per-ray camera constants, so the redshift
    needs no interpolated momentum at all (engine/disk_static.py)."""
    u_t_em = circular_u_t_static(r_em, f_fn, params)
    omega = keplerian_omega_static(r_em, f_fn, params, prograde)
    u_t_obs = 1.0 / jnp.sqrt(f_fn(r_obs, params))
    return (energy * u_t_obs) / (u_t_em * (energy - omega * l_n))


def static_disk_inner_edge(metric, params, prograde=True):
    """Disk inner edge for a named static family: the exact autodiff ISCO
    (host-side convenience for DiskConfig.inner_edge routing)."""
    return float(isco_static(STATIC_F[metric],
                             jnp.asarray(params, jnp.result_type(float))))
