"""Batched geodesic integration for any metric (Kerr, ...).

Generic-metric twin of engine.integrate: the same masked `lax.while_loop`
early-exit semantics (reference simulation/cuda_geodesic.py:579-602), but the
step comes from physics.spacetime's autodiff flows, vmapped over the ray
batch.  Used for Kerr rays, the EinsteinPy-compat `Nulllike(metric="Kerr")`
path, and as the engine for any future metric — one function per spacetime,
no new kernels.

The Schwarzschild render pipeline stays on the specialized fast paths
(engine.integrate / integrate_pallas); this engine trades their hand-tuned
layouts for generality.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..physics.hamiltonian import substep_schedule
from ..physics.spacetime import METRICS, horizon_radius, make_step
from .integrate import STATUS_ALIVE, STATUS_CAPTURED, STATUS_ESCAPED


def _capture_radius(metric, params):
    """Reference capture surface: 1.1 x horizon (cuda_geodesic.py:598)."""
    if metric == "Kerr":
        return 1.1 * horizon_radius("Kerr", params[0], params[1])
    return 1.1 * horizon_radius("Schwarzschild", params[0])


@partial(jax.jit, static_argnames=("steps", "order", "metric"))
def integrate_batch_generic(q0s, p0s, steps, delta, params, r_max, omega,
                            order=2, metric="Kerr"):
    """Integrate an (N, 4) batch in the named metric to completion.

    params: tuple/array of metric parameters — (M,) for Schwarzschild,
    (M, a) for Kerr.  Returns (final_q, final_p, status, n_steps) with the
    same status codes and early-exit semantics as engine.integrate.
    """
    g_inv_fn = METRICS[metric]
    step1 = make_step(g_inv_fn)

    dtype = q0s.dtype
    delta = jnp.asarray(delta, dtype)
    params = jnp.asarray(params, dtype)
    r_max = jnp.asarray(r_max, dtype)
    subs = substep_schedule(delta, jnp.asarray(omega, dtype), order)
    r_cap = _capture_radius(metric, params)

    vstep = jax.vmap(lambda q1, p1, q2, p2: step1(q1, p1, q2, p2, params,
                                                  subs))

    def active_mask(q1):
        r = q1[:, 1]
        return (r > r_cap) & (r < r_max)

    def masked(new, old, act):
        return jnp.where(act[:, None], new, old)

    n_steps0 = jnp.zeros(q0s.shape[0], dtype=jnp.int32)
    carry0 = (q0s, p0s, q0s, p0s, n_steps0, jnp.int32(0))

    def cond(c):
        q1, _, _, _, _, k = c
        return (k < steps) & jnp.any(active_mask(q1))

    def body(c):
        q1, p1, q2, p2, ns, k = c
        act = active_mask(q1)
        nq1, np1, nq2, np2 = vstep(q1, p1, q2, p2)
        return (masked(nq1, q1, act), masked(np1, p1, act),
                masked(nq2, q2, act), masked(np2, p2, act),
                ns + act.astype(jnp.int32), k + 1)

    q1, p1, _, _, ns, _ = jax.lax.while_loop(cond, body, carry0)

    r = q1[:, 1]
    status = jnp.where(r <= r_cap, STATUS_CAPTURED,
                       jnp.where(r >= r_max, STATUS_ESCAPED, STATUS_ALIVE))
    return q1, p1, status, ns


@partial(jax.jit, static_argnames=("steps", "order", "metric"))
def trajectory_generic(q0, p0, steps, delta, params, omega, order=2,
                       metric="Kerr"):
    """Single-ray unmasked trajectory: (steps, 4) q and p after each step.

    No early exit — EinsteinPy `Nulllike` semantics (it integrates the full
    budget regardless of horizon proximity), for the compat layer.
    """
    g_inv_fn = METRICS[metric]
    step1 = make_step(g_inv_fn)

    dtype = q0.dtype
    delta = jnp.asarray(delta, dtype)
    params = jnp.asarray(params, dtype)
    subs = substep_schedule(delta, jnp.asarray(omega, dtype), order)

    def scan_step(carry, _):
        q1, p1, q2, p2 = carry
        q1, p1, q2, p2 = step1(q1, p1, q2, p2, params, subs)
        return (q1, p1, q2, p2), (q1, p1)

    _, (qs, ps) = jax.lax.scan(scan_step, (q0, p0, q0, p0), None,
                               length=steps)
    return qs, ps
