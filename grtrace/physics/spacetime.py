"""Generic stationary spacetimes via autodiff Hamiltonian flows.

The reference's ground-truth library (EinsteinPy `Nulllike`) is
metric-generic — its FANTASY integrator takes any contravariant metric and
differentiates it numerically (reference usage:
tests/einsteinpy-geodesic-test/main.py:145-155 passes `metric_params=(a,)`).
The reference GPU path hand-codes Schwarzschild only
(simulation/cuda_geodesic.py:432-474).

This module is the TPU-native generalization: a spacetime is just a pure
function ``g_inv(q, params) -> (4, 4)`` and the FANTASY flow kicks/drifts are
obtained with `jax.grad` of the scalar Hamiltonian — exact derivatives of
whatever metric is plugged in, no hand-derived formulas and no finite
differences (EinsteinPy uses central differences with a fixed 1e-8 step; here
autodiff is exact to roundoff).  Everything is vmapped over the ray batch and
compiled by XLA, so a new metric costs one function, not a new kernel.

Schwarzschild keeps its specialized fast paths (physics.metric,
physics.hamiltonian — diagonal metric, hoisted trig); this module is the
correctness-first generic engine used for Kerr and any future metric.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Metric library: q = (t, r, theta, phi), params = (mass, spin a)
# ---------------------------------------------------------------------------

def schwarzschild_g_inv(q, params):
    """Contravariant Schwarzschild metric at q; params = (M,) or (M, 0.0)."""
    mass = params[0]
    r, th = q[1], q[2]
    f = 1.0 - 2.0 * mass / r
    sin_th = jnp.sin(th)
    return jnp.array([
        [-1.0 / f, 0.0, 0.0, 0.0],
        [0.0, f, 0.0, 0.0],
        [0.0, 0.0, 1.0 / (r * r), 0.0],
        [0.0, 0.0, 0.0, 1.0 / (r * r * sin_th * sin_th)],
    ])


def kerr_g_inv(q, params):
    """Contravariant Kerr metric, Boyer-Lindquist, geometrized units.

    params = (M, a) with 0 <= |a| <= M.  Nonzero g^{t phi} encodes frame
    dragging.  Reduces exactly to schwarzschild_g_inv at a = 0.
    """
    mass, a = params[0], params[1]
    r, th = q[1], q[2]
    sin_th = jnp.sin(th)
    cos_th = jnp.cos(th)
    sin2 = sin_th * sin_th
    sigma = r * r + a * a * cos_th * cos_th
    delta = r * r - 2.0 * mass * r + a * a
    r2a2 = r * r + a * a

    inv_sd = 1.0 / (sigma * delta)
    g_tt = -(r2a2 * r2a2 - a * a * delta * sin2) * inv_sd
    g_tp = -(2.0 * mass * r * a) * inv_sd
    g_rr = delta / sigma
    g_thth = 1.0 / sigma
    g_pp = (delta - a * a * sin2) * inv_sd / sin2

    return jnp.array([
        [g_tt, 0.0, 0.0, g_tp],
        [0.0, g_rr, 0.0, 0.0],
        [0.0, 0.0, g_thth, 0.0],
        [g_tp, 0.0, 0.0, g_pp],
    ])


METRICS = {
    "Schwarzschild": schwarzschild_g_inv,
    "Kerr": kerr_g_inv,
}


def horizon_radius(metric: str, mass, a=0.0):
    """Outer event-horizon radius r_+ (capture surface for classification)."""
    if metric == "Schwarzschild":
        return 2.0 * mass
    if metric == "Kerr":
        return mass + jnp.sqrt(jnp.maximum(mass * mass - a * a, 0.0))
    raise KeyError(metric)


# ---------------------------------------------------------------------------
# Hamiltonian + null condition
# ---------------------------------------------------------------------------

def hamiltonian(q, p, params, g_inv_fn):
    """H = 0.5 g^{ab}(q) p_a p_b for one ray; vmap for batches."""
    g = g_inv_fn(q, params)
    return 0.5 * p @ g @ p


def null_p_t(p_sph, q, params, g_inv_fn, future=True):
    """Solve g^{ab} p_a p_b = 0 for p_t with a possible g^{t phi} cross term.

    p_sph: (3,) spatial (p_r, p_th, p_ph).  Quadratic
    A p_t^2 + B p_t + C = 0 with A = g^tt, B = 2 g^{t phi} p_phi,
    C = g^rr p_r^2 + g^thth p_th^2 + g^phph p_phi^2.  future=True picks the
    root that reduces to the reference's positive root in the Schwarzschild
    limit (B = 0: p_t = +sqrt(-C/A); reference simulation/utils.py:84-88).
    """
    q4 = jnp.asarray(q)
    g = g_inv_fn(q4, params)
    A = g[0, 0]
    B = 2.0 * g[0, 3] * p_sph[2]
    C = (g[1, 1] * p_sph[0] ** 2 + g[2, 2] * p_sph[1] ** 2
         + g[3, 3] * p_sph[2] ** 2)
    disc = jnp.sqrt(jnp.maximum(B * B - 4.0 * A * C, 0.0))
    # A < 0 outside the ergosphere: (-B - disc)/(2A) is the positive branch
    root = (-B - disc) / (2.0 * A) if future else (-B + disc) / (2.0 * A)
    return root


def build_null_4momentum(p_sph, pos_sph, params, g_inv_fn, future=True):
    """(3,) spatial momentum + (r, th, ph) position -> (4,) null covector."""
    q4 = jnp.concatenate([jnp.zeros((1,), dtype=jnp.asarray(pos_sph).dtype),
                          jnp.asarray(pos_sph)])
    p_t = null_p_t(jnp.asarray(p_sph), q4, params, g_inv_fn, future=future)
    return jnp.concatenate([p_t[None], jnp.asarray(p_sph)])


# ---------------------------------------------------------------------------
# FANTASY flows for any metric (autodiff kicks and drifts)
# ---------------------------------------------------------------------------

def make_flows(g_inv_fn):
    """Build (flow_a, flow_b, flow_mixed) for a metric function.

    Per-ray state is (q1, p1, q2, p2), each (4,).  The kick -dH/dq and drift
    +dH/dp come from jax.grad of the scalar Hamiltonian — exact derivatives
    of the plugged-in metric (vs EinsteinPy's 1e-8 central differences).
    """
    dq = jax.grad(hamiltonian, argnums=0)
    dp = jax.grad(hamiltonian, argnums=1)

    def flow_a(q1, p1, q2, p2, dt, params):
        p1 = p1 - dt * dq(q1, p2, params, g_inv_fn)
        q2 = q2 + dt * dp(q1, p2, params, g_inv_fn)
        return q1, p1, q2, p2

    def flow_b(q1, p1, q2, p2, dt, params):
        p2 = p2 - dt * dq(q2, p1, params, g_inv_fn)
        q1 = q1 + dt * dp(q2, p1, params, g_inv_fn)
        return q1, p1, q2, p2

    def flow_mixed(q1, p1, q2, p2, cos_w, sin_w):
        q_sum, q_dif = q1 + q2, q1 - q2
        p_sum, p_dif = p1 + p2, p1 - p2
        return (0.5 * (q_sum + q_dif * cos_w + p_dif * sin_w),
                0.5 * (p_sum + p_dif * cos_w - q_dif * sin_w),
                0.5 * (q_sum - q_dif * cos_w - p_dif * sin_w),
                0.5 * (p_sum - p_dif * cos_w + q_dif * sin_w))

    return flow_a, flow_b, flow_mixed


def make_step(g_inv_fn):
    """Per-ray composed FANTASY step for the metric; vmap over batches.

    Returns step(q1, p1, q2, p2, params, subs) where subs is the
    (delta_i, cos_i, sin_i) schedule from hamiltonian.substep_schedule.
    """
    flow_a, flow_b, flow_mixed = make_flows(g_inv_fn)

    def step(q1, p1, q2, p2, params, subs):
        for d_i, cos_i, sin_i in subs:
            half = 0.5 * d_i
            q1, p1, q2, p2 = flow_a(q1, p1, q2, p2, half, params)
            q1, p1, q2, p2 = flow_b(q1, p1, q2, p2, half, params)
            q1, p1, q2, p2 = flow_mixed(q1, p1, q2, p2, cos_i, sin_i)
            q1, p1, q2, p2 = flow_b(q1, p1, q2, p2, half, params)
            q1, p1, q2, p2 = flow_a(q1, p1, q2, p2, half, params)
        return q1, p1, q2, p2

    return step
