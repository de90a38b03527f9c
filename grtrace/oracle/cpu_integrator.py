"""Float64 NumPy oracle: scalar FANTASY order-2 integrator (ground truth).

Deliberately *independent* of the JAX engine: written in plain NumPy with the
same dense-matrix structure as the reference CUDA device code
(reference: simulation/cuda_geodesic.py:432-625), so that agreement between
this oracle and the vectorized/Pallas engines is a meaningful
cross-implementation check (the reference used EinsteinPy's CPU `Nulllike` the
same way, SURVEY.md section 4; einsteinpy is not available in this
environment, so this module *is* the CPU ground truth and was validated
against the reference's committed golden trajectory schema).

Keeps the reference's exact step/early-exit semantics:
  * early exit checked before each step: r <= 1.1*rs (capture) or
    r >= r_max (escape)  (cuda_geodesic.py:598-599)
  * trajectory buffers zero-filled after exit (cuda_geodesic.py:619-625).

NOTE: unlike the reference's derivative kernel (hardcoded to M=1,
cuda_geodesic.py:459-464) the general-mass forms are used here, matching
grtrace.physics.metric.
"""
from __future__ import annotations

import numpy as np


def _metric_contravariant(q, rs):
    r, th = q[1], q[2]
    g = np.zeros((4, 4))
    inv_fac = 1.0 - rs / r
    g[0, 0] = -1.0 / inv_fac
    g[1, 1] = inv_fac
    g[2, 2] = 1.0 / (r * r)
    g[3, 3] = 1.0 / ((r * np.sin(th)) ** 2)
    return g


def _metric_derivative(q, rs, wrt):
    r, th = q[1], q[2]
    gp = np.zeros((4, 4))
    if wrt == 1:
        denom = r - rs
        gp[0, 0] = rs / (denom * denom)
        gp[1, 1] = rs / (r * r)
        gp[2, 2] = -2.0 / r**3
        gp[3, 3] = -2.0 / (r**3 * np.sin(th) ** 2)
    elif wrt == 2:
        gp[3, 3] = -2.0 * np.cos(th) / (r * r * np.sin(th) ** 3)
    return gp


def _part_ham_flow(q, p, rs, wrt):
    gp = _metric_derivative(q, rs, wrt)
    return 0.5 * p @ gp @ p


def _flow_a(q1, p1, q2, p2, dt, rs):
    dH1 = np.array([_part_ham_flow(q1, p2, rs, i) for i in range(4)])
    p1 = p1 - dt * dH1
    q2 = q2 + dt * (_metric_contravariant(q1, rs) @ p2)
    return q1, p1, q2, p2


def _flow_b(q1, p1, q2, p2, dt, rs):
    dH2 = np.array([_part_ham_flow(q2, p1, rs, i) for i in range(4)])
    p2 = p2 - dt * dH2
    q1 = q1 + dt * (_metric_contravariant(q2, rs) @ p1)
    return q1, p1, q2, p2


def _flow_mixed(q1, p1, q2, p2, dt, omega):
    c = np.cos(2.0 * omega * dt)
    s = np.sin(2.0 * omega * dt)
    q_sum, q_dif = q1 + q2, q1 - q2
    p_sum, p_dif = p1 + p2, p1 - p2
    q1n = 0.5 * (q_sum + q_dif * c + p_dif * s)
    p1n = 0.5 * (p_sum + p_dif * c - q_dif * s)
    q2n = 0.5 * (q_sum - q_dif * c - p_dif * s)
    p2n = 0.5 * (p_sum - p_dif * c + q_dif * s)
    return q1n, p1n, q2n, p2n


def fantasy_step_ord2(q1, p1, q2, p2, delta, rs, omega):
    """A(d/2) B(d/2) M(d) B(d/2) A(d/2) — cuda_geodesic.py:568-575."""
    half = 0.5 * delta
    q1, p1, q2, p2 = _flow_a(q1, p1, q2, p2, half, rs)
    q1, p1, q2, p2 = _flow_b(q1, p1, q2, p2, half, rs)
    q1, p1, q2, p2 = _flow_mixed(q1, p1, q2, p2, delta, omega)
    q1, p1, q2, p2 = _flow_b(q1, p1, q2, p2, half, rs)
    q1, p1, q2, p2 = _flow_a(q1, p1, q2, p2, half, rs)
    return q1, p1, q2, p2


def yoshida_gammas(order):
    """Triple-jump substep fractions; independent twin of
    physics.hamiltonian.yoshida_gammas (kept separate on purpose — the
    oracle must not import the engine under test)."""
    if order not in (2, 4, 6, 8):
        raise ValueError(f"order must be 2, 4, 6 or 8, got {order}")
    gammas = [1.0]
    for k in range(1, (order - 2) // 2 + 1):
        z = 2.0 ** (1.0 / (2 * k + 1))
        z1 = 1.0 / (2.0 - z)
        z0 = -z * z1
        gammas = ([g * z1 for g in gammas] + [g * z0 for g in gammas]
                  + [g * z1 for g in gammas])
    return gammas


def fantasy_step(q1, p1, q2, p2, delta, rs, omega, order=2):
    """Composed step of any supported order (order 2 == one ord-2 step)."""
    for g in yoshida_gammas(order):
        q1, p1, q2, p2 = fantasy_step_ord2(q1, p1, q2, p2, g * delta, rs,
                                           omega)
    return q1, p1, q2, p2


def integrate(q0, p0, steps, delta, rs, r_max, omega, order=2):
    """Single-ray final state. q0, p0: (4,) float64.

    Returns (q1, p1, n_steps_taken) with the reference's pre-step early exit.
    """
    q1 = np.array(q0, dtype=np.float64)
    p1 = np.array(p0, dtype=np.float64)
    q2 = q1.copy()
    p2 = p1.copy()
    taken = 0
    for _ in range(steps):
        if q1[1] <= 1.1 * rs or q1[1] >= r_max:
            break
        q1, p1, q2, p2 = fantasy_step(q1, p1, q2, p2, delta, rs, omega,
                                      order)
        taken += 1
    return q1, p1, taken


def integrate_batch(q0s, p0s, steps, delta, rs, r_max, omega, order=2):
    """(N,4) batch wrapper around `integrate`. Returns (N,4) final q1."""
    out = np.zeros_like(q0s, dtype=np.float64)
    for i in range(q0s.shape[0]):
        out[i], _, _ = integrate(q0s[i], p0s[i], steps, delta, rs, r_max,
                                 omega, order)
    return out


def integrate_full(q0, p0, steps, delta, rs, r_max, omega, order=2):
    """Single-ray trajectory (steps, 4): q1 stored each step before the step,
    zero-filled after exit — exactly cuda_geodesic.py:604-625."""
    traj = np.zeros((steps, 4), dtype=np.float64)
    q1 = np.array(q0, dtype=np.float64)
    p1 = np.array(p0, dtype=np.float64)
    q2 = q1.copy()
    p2 = p1.copy()
    for s in range(steps):
        traj[s] = q1
        if q1[1] <= 1.1 * rs or q1[1] >= r_max:
            break
        q1, p1, q2, p2 = fantasy_step(q1, p1, q2, p2, delta, rs, omega,
                                      order)
    return traj
