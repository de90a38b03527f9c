"""Epicyclic frequencies and the autodiff ISCO — the QPO observables.

A circular equatorial geodesic perturbed radially or vertically
oscillates at the radial epicyclic frequency kappa and the vertical
epicyclic frequency Omega_theta; together with the orbital Omega_phi
these are the three frequencies every relativistic QPO model
(relativistic precession, epicyclic resonance, ...) is built from, and
their degeneracy structure (kappa < Omega_theta < Omega_phi inside the
Kerr field, kappa -> 0 at the ISCO) is pure strong-field gravity.

Nothing here restates a textbook closed form.  Both frequencies come
from second derivatives — by ``jax.grad`` — of the radial / polar
potentials built from the same tested ``kerr_g_inv`` the ray tracer
integrates, with the circular orbit's Killing charges (E, L_z) from
:mod:`grtrace.physics.orbits`:

    rdot^2     = R(r)      = -g^{rr}(r, pi/2) (1 + W(r, pi/2))
    thetadot^2 = Theta(th) = -g^{thth}(r0, th) (1 + W(r0, th))
    W = g^{tt} E^2 - 2 g^{tphi} E L_z + g^{phiphi} L_z^2

    omega_proper^2 = -(1/2) d^2R/dr^2  (resp. d^2Theta/dth^2),
    coordinate-time frequency = omega_proper / u^t.

The Kerr closed forms (Okazaki, Kato & Fukue 1987; Kato 1990) are used
only as *checks* in tests/test_epicyclic.py — this derivation is exact
for the whole Kerr-Newman family, where no closed form exists.  The
ISCO solver below roots kappa^2(r) = 0 by Newton on the AD derivative,
recovering Bardeen-Press-Teukolsky for Kerr and extending it exactly to
charge (extremal Reissner-Nordstrom ISCO = 4M comes out, pinned in the
tests).

No reference counterpart: the reference renders lensed backgrounds only
(/root/reference/simulation/raytracing.py) and has no orbit dynamics.
Geometrized units G = c = 1; frequencies scale as 1/M (use
``qpo_frequencies_hz`` for physical units).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .orbits import circular_e_lz, circular_u_t
from .spacetime import kerr_g_inv

# seconds per geometrized solar mass, GM_sun/c^3 — the one source of
# truth for the code-units -> seconds clock (engine/hotspot.py re-imports
# it for the flare period printout)
T_SUN_S = 4.925490947e-6


def _w_quad(r, th, energy, l_z, params):
    """W = g^{ab} p_a p_b restricted to the Killing directions, for
    p_t = -E, p_phi = L_z (the conserved covector components)."""
    zero = jnp.zeros_like(r)
    g = kerr_g_inv(jnp.stack([zero, r, th, zero]), params)
    return (g[0, 0] * energy * energy
            - 2.0 * g[0, 3] * energy * l_z
            + g[3, 3] * l_z * l_z)


def epicyclic_frequencies(r, params, prograde=True):
    """(Omega_phi, kappa, Omega_theta) at BL radius ``r`` — coordinate-time
    (distant-observer) angular frequencies of the circular equatorial
    geodesic and its radial / vertical perturbations.

    All three are returned as magnitudes (the orbital sense lives in
    ``prograde``); kappa^2 < 0 (unstable orbit, inside the ISCO) and
    Omega_theta^2 < 0 are clamped to zero so the sqrt stays real — test
    stability with ``radial_stability`` if the sign matters.
    """
    r = jnp.asarray(r)
    half_pi = jnp.full_like(r, 0.5 * jnp.pi)
    energy, l_z = circular_e_lz(r, params, prograde)
    u_t, omega = circular_u_t(r, params, prograde)

    def rad_pot(rr):
        zero = jnp.zeros_like(rr)
        g = kerr_g_inv(jnp.stack([zero, rr, 0.5 * jnp.pi + zero, zero]),
                       params)
        return -g[1, 1] * (1.0 + _w_quad(rr, 0.5 * jnp.pi + zero,
                                         energy, l_z, params))

    def pol_pot(th):
        g = kerr_g_inv(jnp.stack([jnp.zeros_like(th), r + 0.0 * th, th,
                                  jnp.zeros_like(th)]), params)
        return -g[2, 2] * (1.0 + _w_quad(r, th, energy, l_z, params))

    kappa2 = -0.5 * jax.grad(jax.grad(rad_pot))(r) / (u_t * u_t)
    vert2 = -0.5 * jax.grad(jax.grad(pol_pot))(half_pi) / (u_t * u_t)
    kappa = jnp.sqrt(jnp.maximum(kappa2, 0.0))
    omega_theta = jnp.sqrt(jnp.maximum(vert2, 0.0))
    return jnp.abs(omega), kappa, omega_theta


def radial_stability(r, params, prograde=True):
    """kappa^2 (signed, coordinate-time) — negative inside the ISCO."""
    r = jnp.asarray(r)
    energy, l_z = circular_e_lz(r, params, prograde)
    u_t, _ = circular_u_t(r, params, prograde)

    def rad_pot(rr):
        zero = jnp.zeros_like(rr)
        g = kerr_g_inv(jnp.stack([zero, rr, 0.5 * jnp.pi + zero, zero]),
                       params)
        return -g[1, 1] * (1.0 + _w_quad(rr, 0.5 * jnp.pi + zero,
                                         energy, l_z, params))

    return -0.5 * jax.grad(jax.grad(rad_pot))(r) / (u_t * u_t)


def isco_from_kappa(params, prograde=True, iters=50):
    """ISCO radius as the root of kappa^2(r) = 0 on the AD stability
    function — the exact Kerr-Newman ISCO, which ``orbits.isco_radius``
    can only approximate when charge is nonzero (its docstring says so).
    Recovers Bardeen-Press-Teukolsky at Q = 0 and the extremal
    Reissner-Nordstrom 4M (both pinned in tests/test_epicyclic.py).

    kappa^2 crosses zero transversally at the ISCO and stays positive
    for every r above it, so the topmost sign change of a coarse scan is
    the ISCO bracket; bisection then converges unconditionally (plain
    Newton does not — kappa^2 has a maximum a little above the ISCO, and
    a seed beyond it diverges outward).  Below the circular-photon-orbit
    radius the clamped u^t makes kappa^2 meaningless; scanning from the
    top ignores that region.  Not valid within ~2% of the extremal
    prograde limit (a -> M, ISCO -> horizon).
    """
    from .spacetime import _charge

    mass = params[0]
    qc = _charge(params)
    f = lambda r: radial_stability(r, params, prograde)

    horizon = mass + jnp.sqrt(jnp.maximum(
        mass * mass - params[1] * params[1] - qc * qc, 0.0))
    lo0 = 1.02 * horizon
    hi0 = 9.5 * mass  # >= the extremal retrograde Kerr ISCO (9M)
    grid = jnp.linspace(lo0, hi0, 65)
    f_grid = jax.vmap(f)(grid)
    neg_idx = jnp.where(f_grid < 0.0, jnp.arange(grid.shape[0]), -1)
    top = jnp.clip(jnp.max(neg_idx), 0, grid.shape[0] - 2)
    lo, hi = grid[top], grid[top + 1]

    def step(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        below = f(mid) < 0.0
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, step, (lo, hi))
    return 0.5 * (lo + hi)


def qpo_frequencies_hz(r, params, mass_msun, prograde=True):
    """(nu_phi, nu_r, nu_theta) in Hz for a hole of ``mass_msun`` solar
    masses — plus the two derived precession frequencies QPO models use:
    periastron precession nu_phi - nu_r and Lense-Thirring nodal
    precession nu_phi - nu_theta.

    Returns a dict.  Conversion: a coordinate-time angular frequency
    Omega in code units (params mass M_code) corresponds to
    nu = Omega * M_code / (2 pi * mass_msun * T_SUN_S) Hz, because
    Omega scales exactly as 1/M at fixed a/M, Q/M, r/M.
    """
    omega_phi, kappa, omega_th = epicyclic_frequencies(r, params, prograde)
    scale = params[0] / (2.0 * jnp.pi * mass_msun * T_SUN_S)
    nu_phi = omega_phi * scale
    nu_r = kappa * scale
    nu_th = omega_th * scale
    return {
        "nu_phi": nu_phi,
        "nu_r": nu_r,
        "nu_theta": nu_th,
        "nu_periastron": nu_phi - nu_r,
        "nu_nodal": nu_phi - nu_th,
    }
