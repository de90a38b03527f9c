"""Float64 NumPy Kerr(-Newman) oracle with FINITE-DIFFERENCE flows.

The Kerr engines ship two gradient derivations — `jax.grad` of the chart
Hamiltonian (physics.spacetime) and the hand-derived closed forms
(physics.kerr_schild) — which tests pin against each other.  A shared
derivation error would survive that.  This oracle removes the gradient
derivation entirely: it evaluates ONLY the scalar Kerr-Schild Hamiltonian

    Ham(q, p) = 1/2 eta^{ab} p_a p_b - H(q) (l^a p_a)^2

in plain NumPy and builds the FANTASY flows from central finite
differences:

  * dHam/dq_i by central differences in the spatial coordinates (the
    chart is stationary, dHam/dt = 0), truncation O(h^2) ~ 1e-14 per
    evaluation at h = 1e-5 against |d2Ham| ~ O(1);
  * dHam/dp_a by central differences in the momenta — Ham is exactly
    quadratic in p, so central differences are EXACT for it (up to
    float64 rounding).

Agreement between this derivative-free oracle and either JAX engine
therefore validates the gradient algebra itself, not just its two
transcriptions.  Scalar, slow, float64 — test-only.

Semantics mirror engine.integrate_generic for the KerrSchild chart:
active while r_bl > 1.05*r_plus and rho^2 < r_max^2, checked before each
step; the step is A(d/2) B(d/2) M(d) B(d/2) A(d/2) with the phase-space
doubling initialized q2=q1, p2=p1.
"""
from __future__ import annotations

import numpy as np

ETA = np.diag([-1.0, 1.0, 1.0, 1.0])


def ks_radius(x, y, z, a):
    rho2 = x * x + y * y + z * z
    b = rho2 - a * a
    return np.sqrt(0.5 * (b + np.sqrt(b * b + 4.0 * a * a * z * z)))


def horizon_radius(mass, a, charge=0.0):
    return mass + np.sqrt(max(mass * mass - a * a - charge * charge, 0.0))


def hamiltonian(q, p, mass, a, charge=0.0):
    """Ham(q, p) — the only physics input to this oracle."""
    x, y, z = q[1], q[2], q[3]
    r = ks_radius(x, y, z, a)
    r2 = r * r
    D = r2 + (a * z / r) ** 2 if r > 0 else np.inf
    H = (mass * r - 0.5 * charge * charge) / D
    w = r2 + a * a
    l = np.array([-1.0, (r * x + a * y) / w, (r * y - a * x) / w, z / r])
    S = l @ p
    return 0.5 * (p @ ETA @ p) - H * S * S


def _dham_dq(q, p, mass, a, charge, h=1e-5):
    """Central differences in the spatial coordinates (dHam/dt = 0)."""
    g = np.zeros(4)
    for i in (1, 2, 3):
        qp = q.copy()
        qm = q.copy()
        qp[i] += h
        qm[i] -= h
        g[i] = (hamiltonian(qp, p, mass, a, charge)
                - hamiltonian(qm, p, mass, a, charge)) / (2.0 * h)
    return g


def _dham_dp(q, p, mass, a, charge, h=1e-3):
    """Central differences in the momenta — exact for a quadratic Ham."""
    g = np.zeros(4)
    for i in range(4):
        pp = p.copy()
        pm = p.copy()
        pp[i] += h
        pm[i] -= h
        g[i] = (hamiltonian(q, pp, mass, a, charge)
                - hamiltonian(q, pm, mass, a, charge)) / (2.0 * h)
    return g


def _flow_a(q1, p1, q2, p2, dt, mass, a, charge):
    """Kick p1 (spatial slots) with the metric at q1 against p2; drift q2."""
    kick = _dham_dq(q1, p2, mass, a, charge)
    drift = _dham_dp(q1, p2, mass, a, charge)
    p1 = p1 - dt * np.array([0.0, kick[1], kick[2], kick[3]])
    q2 = q2 + dt * drift
    return q1, p1, q2, p2


def _flow_b(q1, p1, q2, p2, dt, mass, a, charge):
    kick = _dham_dq(q2, p1, mass, a, charge)
    drift = _dham_dp(q2, p1, mass, a, charge)
    p2 = p2 - dt * np.array([0.0, kick[1], kick[2], kick[3]])
    q1 = q1 + dt * drift
    return q1, p1, q2, p2


def _flow_mixed(q1, p1, q2, p2, dt, omega):
    cw = np.cos(2.0 * omega * dt)
    sw = np.sin(2.0 * omega * dt)
    q_sum, q_dif = q1 + q2, q1 - q2
    p_sum, p_dif = p1 + p2, p1 - p2
    return (0.5 * (q_sum + q_dif * cw + p_dif * sw),
            0.5 * (p_sum + p_dif * cw - q_dif * sw),
            0.5 * (q_sum - q_dif * cw - p_dif * sw),
            0.5 * (p_sum - p_dif * cw + q_dif * sw))


def step_ord2(q1, p1, q2, p2, delta, mass, a, charge, omega):
    half = 0.5 * delta
    q1, p1, q2, p2 = _flow_a(q1, p1, q2, p2, half, mass, a, charge)
    q1, p1, q2, p2 = _flow_b(q1, p1, q2, p2, half, mass, a, charge)
    q1, p1, q2, p2 = _flow_mixed(q1, p1, q2, p2, delta, omega)
    q1, p1, q2, p2 = _flow_b(q1, p1, q2, p2, half, mass, a, charge)
    q1, p1, q2, p2 = _flow_a(q1, p1, q2, p2, half, mass, a, charge)
    return q1, p1, q2, p2


def integrate(q0, p0, steps, delta, mass, a, charge, r_max, omega):
    """One ray; returns (final_q, final_p, n_steps, exploded).

    Same KerrSchild-chart semantics as engine.integrate_generic: active
    while r_bl > 1.05*r_plus and rho^2 < r_max^2, checked before each
    step; after each step the null-invariant blow-up test |Ham| <=
    3e-3*(|p|^2+1) (a backward-traced plunger blueshifts on the past
    horizon until the fixed step under-resolves the kick — it never
    cleanly crosses the capture shell).  On violation the step is
    reverted and `exploded` is returned True (the engine parks such rays
    as captured/numerical; the oracle just stops at the last resolved
    state)."""
    q1 = np.asarray(q0, np.float64).copy()
    p1 = np.asarray(p0, np.float64).copy()
    q2, p2 = q1.copy(), p1.copy()
    r_cap = 1.05 * horizon_radius(mass, a, charge)
    n = 0
    for _ in range(steps):
        r_bl = ks_radius(q1[1], q1[2], q1[3], a)
        rho2 = q1[1] ** 2 + q1[2] ** 2 + q1[3] ** 2
        if not (r_bl > r_cap and rho2 < r_max * r_max):
            break
        new = step_ord2(q1, p1, q2, p2, delta, mass, a, charge, omega)
        h = hamiltonian(new[0], new[1], mass, a, charge)
        p2n = new[1][1] ** 2 + new[1][2] ** 2 + new[1][3] ** 2 + 1.0
        if not (np.all([np.isfinite(v).all() for v in new])
                and abs(h) <= 3e-3 * p2n):
            return q1, p1, n, True
        q1, p1, q2, p2 = new
        n += 1
    return q1, p1, n, False
