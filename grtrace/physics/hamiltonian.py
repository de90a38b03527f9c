"""FANTASY order-2 symplectic flows for Schwarzschild null geodesics.

Phase-space-doubled Hamiltonian integrator (Christian & Chan 2021,
arXiv:2010.02237) specialized to the analytic Schwarzschild metric — the
TPU-native counterpart of the reference's Numba-CUDA device functions
(reference: simulation/cuda_geodesic.py:476-575).

Design notes (TPU-first, not a translation):
  * State is a tuple of 16 component arrays (4 components x {q1, p1, q2, p2})
    instead of per-thread 4-vectors.  Each component array can be any shape —
    (N,) in the XLA `vmap`-free batched path, or (1, TILE) lane-major blocks
    inside the Pallas kernel — so the *same* flow code serves both backends
    and the float64 oracle.
  * Because the metric is diagonal, static and axisymmetric, dH/dq is non-zero
    only for the r and theta slots; p_t and p_phi are exact invariants of
    flows A and B and are left untouched (the reference computes and subtracts
    an explicit 0.0 for them, cuda_geodesic.py:500-525).
  * The mixed-flow rotation angle 2*omega*delta is constant across steps, so
    its sin/cos are hoisted out of the integration loop (the reference
    recomputes them every step, cuda_geodesic.py:545-546).

State layout convention used throughout the engine:
    state = (q1t, q1r, q1th, q1ph,
             p1t, p1r, p1th, p1ph,
             q2t, q2r, q2th, q2ph,
             p2t, p2r, p2th, p2ph)
"""
from __future__ import annotations

import jax.numpy as jnp

from .metric import contravariant_diag, dcontravariant_dr, dcontravariant_dth

N_STATE = 16


def pack_state(q0, p0):
    """(N,4) q0/p0 -> 16-tuple of (N,) component arrays with q2=q1, p2=p1.

    The phase-space doubling initializes both copies identically
    (reference: simulation/cuda_geodesic.py:590-594).
    """
    comps = [q0[..., a] for a in range(4)] + [p0[..., a] for a in range(4)]
    return tuple(comps + comps)


def unpack_q1(state):
    """First copy's position as (..., 4) — the integrator's output
    (reference: simulation/cuda_geodesic.py:601-602 returns q1)."""
    return jnp.stack(state[0:4], axis=-1)


def unpack_p1(state):
    return jnp.stack(state[4:8], axis=-1)


def _flow_a(state, dt, rs):
    """Flow A: update p1 (r,theta slots) and drift q2, using metric at q1.

    Mirrors reference _flow_A_dev (simulation/cuda_geodesic.py:500-513):
        p1_i <- p1_i - dt * 0.5 * (d_i g^{ab}(q1)) p2_a p2_b
        q2^a <- q2^a + dt * g^{ab}(q1) p2_b
    """
    (q1t, q1r, q1th, q1ph,
     p1t, p1r, p1th, p1ph,
     q2t, q2r, q2th, q2ph,
     p2t, p2r, p2th, p2ph) = state

    d_tt, d_rr, d_thth, d_phph = dcontravariant_dr(q1r, q1th, rs)
    dH_r = 0.5 * (d_tt * p2t * p2t + d_rr * p2r * p2r
                  + d_thth * p2th * p2th + d_phph * p2ph * p2ph)
    dH_th = 0.5 * dcontravariant_dth(q1r, q1th, rs) * p2ph * p2ph

    p1r = p1r - dt * dH_r
    p1th = p1th - dt * dH_th

    g_tt, g_rr, g_thth, g_phph = contravariant_diag(q1r, q1th, rs)
    q2t = q2t + dt * g_tt * p2t
    q2r = q2r + dt * g_rr * p2r
    q2th = q2th + dt * g_thth * p2th
    q2ph = q2ph + dt * g_phph * p2ph

    return (q1t, q1r, q1th, q1ph, p1t, p1r, p1th, p1ph,
            q2t, q2r, q2th, q2ph, p2t, p2r, p2th, p2ph)


def _flow_b(state, dt, rs):
    """Flow B: update p2 (r,theta slots) and drift q1, using metric at q2.

    Mirrors reference _flow_B_dev (simulation/cuda_geodesic.py:515-525).
    """
    (q1t, q1r, q1th, q1ph,
     p1t, p1r, p1th, p1ph,
     q2t, q2r, q2th, q2ph,
     p2t, p2r, p2th, p2ph) = state

    d_tt, d_rr, d_thth, d_phph = dcontravariant_dr(q2r, q2th, rs)
    dH_r = 0.5 * (d_tt * p1t * p1t + d_rr * p1r * p1r
                  + d_thth * p1th * p1th + d_phph * p1ph * p1ph)
    dH_th = 0.5 * dcontravariant_dth(q2r, q2th, rs) * p1ph * p1ph

    p2r = p2r - dt * dH_r
    p2th = p2th - dt * dH_th

    g_tt, g_rr, g_thth, g_phph = contravariant_diag(q2r, q2th, rs)
    q1t = q1t + dt * g_tt * p1t
    q1r = q1r + dt * g_rr * p1r
    q1th = q1th + dt * g_thth * p1th
    q1ph = q1ph + dt * g_phph * p1ph

    return (q1t, q1r, q1th, q1ph, p1t, p1r, p1th, p1ph,
            q2t, q2r, q2th, q2ph, p2t, p2r, p2th, p2ph)


def _flow_mixed(state, cos_w, sin_w):
    """Mixing rotation between the two phase-space copies.

    Mirrors reference _flow_mixed_dev (simulation/cuda_geodesic.py:527-566)
    with the rotation sin/cos precomputed once (they depend only on
    2*omega*delta, which is constant for fixed-step integration).
    """
    q1 = state[0:4]
    p1 = state[4:8]
    q2 = state[8:12]
    p2 = state[12:16]

    new = [None] * N_STATE
    for a in range(4):
        q_sum = q1[a] + q2[a]
        q_dif = q1[a] - q2[a]
        p_sum = p1[a] + p2[a]
        p_dif = p1[a] - p2[a]
        new[a] = 0.5 * (q_sum + q_dif * cos_w + p_dif * sin_w)        # q1'
        new[4 + a] = 0.5 * (p_sum + p_dif * cos_w - q_dif * sin_w)    # p1'
        new[8 + a] = 0.5 * (q_sum - q_dif * cos_w - p_dif * sin_w)    # q2'
        new[12 + a] = 0.5 * (p_sum - p_dif * cos_w + q_dif * sin_w)   # p2'
    return tuple(new)


def fantasy_step_ord2(state, delta, rs, cos_w, sin_w):
    """One order-2 step: A(d/2) B(d/2) M(d) B(d/2) A(d/2).

    Mirrors reference _fantasy_step_ord2 (simulation/cuda_geodesic.py:568-575).
    cos_w/sin_w are cos/sin(2*omega*delta), precomputed by the caller.
    """
    half = 0.5 * delta
    state = _flow_a(state, half, rs)
    state = _flow_b(state, half, rs)
    state = _flow_mixed(state, cos_w, sin_w)
    state = _flow_b(state, half, rs)
    state = _flow_a(state, half, rs)
    return state


def hamiltonian(q, p, rs):
    """H = 0.5 g^{ab}(q) p_a p_b — a conserved diagnostic (0 for null rays).

    q, p: (..., 4).  Used by tests and the NaN/drift sanitizer.
    """
    g_tt, g_rr, g_thth, g_phph = contravariant_diag(q[..., 1], q[..., 2], rs)
    return 0.5 * (g_tt * p[..., 0] ** 2 + g_rr * p[..., 1] ** 2
                  + g_thth * p[..., 2] ** 2 + g_phph * p[..., 3] ** 2)
