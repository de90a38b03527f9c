"""Legacy forward-Euler geodesic integrator — cheap cross-check mode.

The reference ships a (dead, class-shadowed) Euler integrator built on
analytic Christoffel symbols (reference: simulation/cuda_geodesic.py:303-421;
SURVEY.md C9 recommends re-offering it as an alternative integrator design).
Useful as an independent consistency check on the FANTASY path: both must
agree to O(delta) over short arcs.

dq^a/dlam = p^a ;  dp^a/dlam = -Gamma^a_{bc} p^b p^c  (Euler steps, no
early exit — exactly the reference kernel semantics,
cuda_geodesic.py:351-372).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..physics.metric import christoffel_nonzero, contravariant_diag


def raise_index(q, p_lower, rs):
    """FANTASY-convention momenta -> contravariant p^a = g^{ab} p_b.

    The two reference integrators use different momentum conventions: the
    FANTASY kernel contracts the pipeline momenta with the *contravariant*
    metric (dq = g^{ab} p_b, cuda_geodesic.py:489-513 — i.e. it treats them
    as covariant), while the Euler kernel advances dq/dlam = p^a directly
    (cuda_geodesic.py:339-341 — contravariant).  Feeding pipeline momenta
    into the Euler path without this conversion reproduces the reference's
    latent dead-code inconsistency; converting makes the two integrators
    track the same geodesic.
    """
    g_tt, g_rr, g_thth, g_phph = contravariant_diag(q[..., 1], q[..., 2], rs)
    return jnp.stack([g_tt * p_lower[..., 0], g_rr * p_lower[..., 1],
                      g_thth * p_lower[..., 2], g_phph * p_lower[..., 3]],
                     axis=-1)


def _geodesic_rhs(q, p, rs):
    """(..., 4) q, p -> dp/dlam via the non-zero Schwarzschild symbols."""
    r, th = q[..., 1], q[..., 2]
    G = christoffel_nonzero(r, th, rs)
    p_t, p_r, p_th, p_ph = (p[..., a] for a in range(4))

    # dp^a = -Gamma^a_{bc} p^b p^c  (symmetric pairs count twice)
    dp_t = -2.0 * G[(0, 1, 0)] * p_r * p_t
    dp_r = -(G[(1, 0, 0)] * p_t * p_t + G[(1, 1, 1)] * p_r * p_r
             + G[(1, 2, 2)] * p_th * p_th + G[(1, 3, 3)] * p_ph * p_ph)
    dp_th = -(2.0 * G[(2, 1, 2)] * p_r * p_th + G[(2, 3, 3)] * p_ph * p_ph)
    dp_ph = -(2.0 * G[(3, 1, 3)] * p_r * p_ph
              + 2.0 * G[(3, 2, 3)] * p_th * p_ph)
    return jnp.stack([dp_t, dp_r, dp_th, dp_ph], axis=-1)


@partial(jax.jit, static_argnames=("steps",))
def euler_integrate_batch(q0s, p0s, steps, delta, rs):
    """(N, 4) batch, fixed `steps` Euler steps, no early exit
    (parity: cuda_geodesic.py:351-372).  Returns (final_q, final_p)."""
    def body(_, carry):
        q, p = carry
        dp = _geodesic_rhs(q, p, rs)
        return q + delta * p, p + delta * dp

    q, p = jax.lax.fori_loop(0, steps, body, (q0s, p0s))
    return q, p


@partial(jax.jit, static_argnames=("steps",))
def euler_integrate_batch_full(q0s, p0s, steps, delta, rs):
    """Trajectory variant: (N, steps, 4) positions stored before each step
    (parity: cuda_geodesic.py:374-394)."""
    def step(carry, _):
        q, p = carry
        dp = _geodesic_rhs(q, p, rs)
        return (q + delta * p, p + delta * dp), q

    (_, _), traj = jax.lax.scan(step, (q0s, p0s), None, length=steps)
    return jnp.moveaxis(traj, 0, 1)
