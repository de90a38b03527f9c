"""Equatorial circular orbits in the Kerr-Newman family.

Everything a thin accretion disk needs to shade itself: the Keplerian
angular velocity of a circular equatorial geodesic, the emitter
4-velocity normalization, the ISCO radius (inner disk edge), and the
combined gravitational + Doppler redshift factor of a photon received
from such an orbiting emitter.

All quantities are chart-invariant scalars (Omega = dphi/dt, u^t, the
redshift g = nu_obs/nu_em), evaluated from the Boyer-Lindquist equatorial
metric — rays traced on the Cartesian Kerr-Schild chart can be shaded
with these directly because E = -p_t and L_z = x p_y - y p_x are the same
Killing conserved quantities in both charts.

This capability has no reference counterpart (the reference renders
background lensing only); it exists because a GR ray tracer without a
disk mode leaves the framework's showcase regime — the photon ring and
the Doppler-boosted approaching limb — unexercised.  Geometrized units
G = c = 1 throughout, matching the rest of grtrace (reference
main.py:14-18).
"""
from __future__ import annotations

import jax.numpy as jnp

from .spacetime import kerr_g_inv


def isco_radius(mass, a, prograde=True):
    """ISCO radius of a Kerr hole (Bardeen-Press-Teukolsky 1972).

    Z1 = 1 + (1-chi^2)^(1/3) [(1+chi)^(1/3) + (1-chi)^(1/3)],
    Z2 = sqrt(3 chi^2 + Z1^2),
    r_isco = M (3 + Z2 -+ sqrt((3-Z1)(3+Z1+2Z2)))   (- prograde, + retro)

    chi = a/M.  a = 0 gives the Schwarzschild 6M.  (Charge shifts the
    ISCO slightly; no closed form exists for Kerr-Newman — the Kerr value
    is used as the default disk inner edge, override via DiskConfig.r_in.)
    """
    chi = jnp.clip(a / mass, -1.0, 1.0)
    one = jnp.ones_like(chi)
    z1 = 1.0 + jnp.cbrt(1.0 - chi * chi) * (jnp.cbrt(1.0 + chi)
                                            + jnp.cbrt(1.0 - chi))
    z2 = jnp.sqrt(3.0 * chi * chi + z1 * z1)
    root = jnp.sqrt(jnp.maximum((3.0 - z1) * (3.0 + z1 + 2.0 * z2), 0.0))
    sign = jnp.where(jnp.asarray(prograde), -one, one)
    return mass * (3.0 + z2 + sign * root)


def keplerian_omega(r, mass, a, charge=0.0, prograde=True):
    """Angular velocity Omega = dphi/dt of an equatorial circular geodesic.

    Kerr-Newman: Omega = +- sqrt(M r - Q^2) / (r^2 +- a sqrt(M r - Q^2));
    Q = 0 reduces to the Kerr sqrt(M)/(r^(3/2) +- a sqrt(M)).  Verified
    against the raw geodesic condition d/dr (g^{ab} u_a u_b) = 0 via
    autodiff in tests/test_disk.py (no hand algebra trusted).
    """
    s = jnp.sqrt(jnp.maximum(mass * r - charge * charge, 0.0))
    sign = jnp.where(jnp.asarray(prograde), 1.0, -1.0)
    return sign * s / (r * r + sign * a * s)


def equatorial_g_cov(r, params):
    """Covariant Boyer-Lindquist metric at (r, theta = pi/2).

    Inverts the tested contravariant kerr_g_inv rather than restating the
    covariant components by hand — one metric implementation, everywhere.
    """
    zero = jnp.zeros_like(r)
    q = jnp.stack([zero, r, jnp.full_like(r, jnp.pi / 2), zero])
    return jnp.linalg.inv(kerr_g_inv(q, params))


def circular_u_t(r, params, prograde=True):
    """(u^t, Omega) of the circular equatorial emitter at BL radius r.

    u = u^t (partial_t + Omega partial_phi), normalized u.u = -1:
    u^t = 1 / sqrt(-(g_tt + 2 Omega g_tph + Omega^2 g_phph)).
    """
    from .spacetime import _charge
    omega = keplerian_omega(r, params[0], params[1], _charge(params),
                            prograde)
    g = equatorial_g_cov(r, params)
    denom = -(g[0, 0] + 2.0 * omega * g[0, 3] + omega * omega * g[3, 3])
    return 1.0 / jnp.sqrt(jnp.maximum(denom, 1e-30)), omega


def static_u_t(r, params, theta=jnp.pi / 2):
    """u^t of a static observer at BL (r, theta): 1/sqrt(-g_tt)."""
    zero = jnp.zeros_like(r)
    q = jnp.stack([zero, r, jnp.broadcast_to(theta, jnp.shape(r)), zero])
    g = jnp.linalg.inv(kerr_g_inv(q, params))
    return 1.0 / jnp.sqrt(jnp.maximum(-g[0, 0], 1e-30))


def redshift_factor(energy, l_z, r_em, r_obs, params, prograde=True,
                    theta_obs=jnp.pi / 2):
    """g = nu_obs / nu_em for a photon with conserved (E = -p_t, L_z)
    emitted by a circular equatorial geodesic at r_em and received by the
    static observer at r_obs.

    nu ~ -p.u;  emitter: -p.u_em = u^t (E - Omega L_z);  observer:
    -p.u_obs = E u_obs^t.  Both Doppler beaming (through Omega L_z) and
    gravitational redshift (through the u^t factors) are in here — no
    separate treatment needed.
    """
    u_t_em, omega = circular_u_t(r_em, params, prograde)
    u_t_obs = static_u_t(r_obs, params, theta_obs)
    return (energy * u_t_obs) / (u_t_em * (energy - omega * l_z))
