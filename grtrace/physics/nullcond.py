"""Null-condition closure: solve g^{mu nu} p_mu p_nu = 0 for p_t.

Batched `jnp` re-derivation of the reference's EinsteinPy-`_P()`-compatible
root selection (reference: simulation/utils.py:39-88).  The reference pipeline
treats the momentum triplet from `angles_to_p_sph` as the spatial part of the
covariant-style quadratic with *contravariant* metric coefficients; we
reproduce that convention exactly for parity (see physics/camera.py docstring
for the full convention discussion).
"""
from __future__ import annotations

import jax.numpy as jnp


def null_p_t(p_sph, r, theta, *, mass_bh=1.0, future=True):
    """Return p_t solving the Schwarzschild null quadratic.

    p_sph: (..., 3) spatial momentum (p_r, p_th, p_ph).
    r, theta: (...,) observer position.
    future=True picks the positive root (reference utils.py:84-88 negates for
    future=False; get_initial_conditions calls with future=True,
    utils.py:134-136).
    """
    pr = p_sph[..., 0]
    pth = p_sph[..., 1]
    pph = p_sph[..., 2]

    f = 1.0 - 2.0 * mass_bh / r
    gtt = -1.0 / f
    grr = f
    gthth = 1.0 / (r * r)
    sin_th = jnp.sin(theta)
    gphph = 1.0 / (r * r * sin_th * sin_th)

    a_coef = gtt  # < 0 outside horizon
    c_coef = grr * pr * pr + gthth * pth * pth + gphph * pph * pph

    disc = -4.0 * a_coef * c_coef  # B = 0 in Schwarzschild
    p_t = jnp.sqrt(disc) / (2.0 * (-a_coef))  # always positive
    return p_t if future else -p_t


def build_null_4momentum(p_sph, pos_sph, *, mass_bh=1.0, future=True):
    """(..., 3) spatial momentum + (..., 3) position -> (..., 4) null p.

    Batched equivalent of reference build_null_4momentum_ep_sph
    (simulation/utils.py:39-88).
    """
    r = pos_sph[..., 0]
    theta = pos_sph[..., 1]
    p_t = null_p_t(p_sph, r, theta, mass_bh=mass_bh, future=future)
    return jnp.concatenate([p_t[..., None], p_sph], axis=-1)
