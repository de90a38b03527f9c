"""Massive-particle geodesics (physics/timelike.py) on the photon kernels.

Validation chain, each link independent of the next:

1. Mass shell: built 4-momenta satisfy g^ab p_a p_b = -mu^2 exactly, with
   u^t > 0 (particle convention — opposite branch from the renderer's
   backward rays).
2. Turning points: bound_orbit_e_lz's (E, L_z) zero p_r^2 at both radii —
   exactly for Schwarzschild (linear solve), to Newton tolerance for Kerr.
3. Weak field: the strong-field quadrature reproduces Mercury's
   6 pi M / (a (1 - e^2)) as r -> infinity.
4. Integrator: the FANTASY flows (the SAME spacetime.make_step the Kerr
   renderer vmaps) reproduce the quadrature's periastron advance in the
   strong field, while holding the mass shell to ~1e-12.

No reference counterpart: the reference traces photons only (its
EinsteinPy path uses Nulllike exclusively); massive-particle orbits are a
capability extension enabled by the shared-Hamiltonian design.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.physics.hamiltonian import substep_schedule
from grtrace.physics.spacetime import hamiltonian, kerr_g_inv, make_step
from grtrace.physics.timelike import (bound_orbit_e_lz,
                                      build_timelike_4momentum,
                                      equatorial_ics,
                                      periapsis_advance_quadrature,
                                      pr2_of_r, weak_field_precession)


def _params(m=1.0, a=0.0, q=0.0):
    return jnp.array([m, a, q], dtype=jnp.float64)


# ---------------------------------------------------------------------------
# 1. mass shell + future-directedness
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("a,mu", [(0.0, 1.0), (0.9, 1.0), (0.9, 2.5),
                                  (-0.7, 1.0)])
def test_mass_shell_and_future_direction(a, mu):
    params = _params(a=a)
    pos = jnp.array([0.0, 8.0, 1.1, 0.3], dtype=jnp.float64)
    p_sph = jnp.array([0.12, -0.4, 2.0], dtype=jnp.float64)
    p4 = build_timelike_4momentum(p_sph, pos[1:], params, kerr_g_inv, mu=mu)
    h = hamiltonian(pos, p4, params, kerr_g_inv)
    # H = 1/2 g^ab p_a p_b = -mu^2 / 2 on the mass shell
    assert abs(float(h) + 0.5 * mu * mu) < 1e-12
    g = kerr_g_inv(pos, params)
    u_t = float(g[0] @ p4)
    assert u_t > 0.0          # future-directed
    assert float(-p4[0]) > 0.0  # E = -p_t > 0


def test_timelike_reduces_to_null_as_mu_to_zero():
    from grtrace.physics.spacetime import null_p_t
    params = _params(a=0.9)
    q4 = jnp.array([0.0, 10.0, jnp.pi / 2, 0.0], dtype=jnp.float64)
    p_sph = jnp.array([0.0, -0.3, 4.0], dtype=jnp.float64)
    from grtrace.physics.timelike import timelike_p_t
    pt_m = timelike_p_t(p_sph, q4, params, kerr_g_inv, mu=1e-8)
    # future=False null root: the (-B - disc)/(2A)... conventions differ;
    # compare against both roots and require a 1e-12 match to one of them.
    roots = [float(null_p_t(p_sph, q4, params, kerr_g_inv, future=f))
             for f in (True, False)]
    assert min(abs(float(pt_m) - r) for r in roots) < 1e-8


# ---------------------------------------------------------------------------
# 2. bound-orbit solver zeros p_r^2 at the turning points
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("a,prograde", [(0.0, True), (0.9, True),
                                        (0.9, False), (0.5, True)])
def test_turning_points_are_roots(a, prograde):
    params = _params(a=a)
    r_p, r_a = 8.0, 18.0
    energy, l_z = bound_orbit_e_lz(r_p, r_a, params, prograde=prograde)
    assert 0.0 < float(energy) < 1.0      # bound
    assert (float(l_z) > 0.0) == prograde
    for r in (r_p, r_a):
        assert abs(float(pr2_of_r(jnp.float64(r), energy, l_z, params))) \
            < 1e-10
    # allowed region strictly inside
    mid = pr2_of_r(jnp.float64(0.5 * (r_p + r_a)), energy, l_z, params)
    assert float(mid) > 0.0


def test_schwarzschild_circular_energy_limit():
    """r_p -> r_a -> r recovers the closed-form circular-orbit charges
    E = (1 - 2M/r)/sqrt(1 - 3M/r), L = sqrt(M r)/sqrt(1 - 3M/r)."""
    params = _params()
    r = 10.0
    energy, l_z = bound_orbit_e_lz(r * (1 - 1e-6), r * (1 + 1e-6), params)
    e_exact = (1 - 2 / r) / np.sqrt(1 - 3 / r)
    l_exact = np.sqrt(r) / np.sqrt(1 - 3 / r)
    assert abs(float(energy) - e_exact) < 1e-5
    assert abs(float(l_z) - l_exact) < 1e-4


# ---------------------------------------------------------------------------
# 3. weak-field limit of the quadrature
# ---------------------------------------------------------------------------

def test_weak_field_matches_mercury_formula():
    params = _params()
    r_p, r_a = 2.0e4, 3.0e4
    exact = float(periapsis_advance_quadrature(r_p, r_a, params))
    leading = float(weak_field_precession(r_p, r_a))
    # next-order corrections are O(M/p) ~ 4e-5 relative
    assert exact == pytest.approx(leading, rel=2e-3)
    assert exact > leading  # strong-field corrections are positive


def test_kerr_prograde_retrograde_split():
    """Frame dragging: prograde orbits precess LESS than retrograde ones
    (the -8 pi a M / p^{3/2}-type correction), straddling Schwarzschild."""
    params9 = _params(a=0.9)
    params0 = _params()
    r_p, r_a = 15.0, 30.0
    pro = float(periapsis_advance_quadrature(r_p, r_a, params9,
                                             prograde=True))
    ret = float(periapsis_advance_quadrature(r_p, r_a, params9,
                                             prograde=False))
    schw = float(periapsis_advance_quadrature(r_p, r_a, params0))
    assert pro < schw < ret


# ---------------------------------------------------------------------------
# 4. the FANTASY integrator reproduces the quadrature
# ---------------------------------------------------------------------------

def _integrate_orbit(q0, p0, params, dt, n_steps, order=4):
    """Fixed-step FANTASY integration of one timelike geodesic, recording
    (r, phi, p_r) per step — the same make_step the Kerr renderer vmaps."""
    step = make_step(kerr_g_inv)
    subs = substep_schedule(jnp.float64(dt), jnp.float64(1.0), order)

    def body(carry, _):
        q1, p1, q2, p2 = step(*carry, params, subs)
        return (q1, p1, q2, p2), (q1[1], q1[3], p1[1])

    (_, traj) = jax.lax.scan(body, (q0, p0, q0, p0), None, length=n_steps)
    r, phi, p_r = (np.asarray(x) for x in traj)
    return r, phi, p_r


def _measured_advance(phi, p_r):
    """phi advance between consecutive periastra (p_r sign - -> +),
    linearly interpolated at each crossing; returns per-period advances."""
    s = np.sign(p_r)
    idx = np.where((s[:-1] < 0) & (s[1:] > 0))[0]
    assert len(idx) >= 3, "need >= 3 periastron passages"
    frac = -p_r[idx] / (p_r[idx + 1] - p_r[idx])
    phi_c = phi[idx] + frac * (phi[idx + 1] - phi[idx])
    return np.diff(phi_c) - 2 * np.pi


@pytest.mark.parametrize("a,prograde,r_p,r_a,dt,n", [
    (0.0, True, 10.0, 20.0, 0.05, 60_000),
    (0.9, True, 6.0, 12.0, 0.02, 60_000),
])
def test_integrator_matches_quadrature(a, prograde, r_p, r_a, dt, n):
    params = _params(a=a)
    energy, l_z = bound_orbit_e_lz(r_p, r_a, params, prograde=prograde)
    # start at apoapsis (p_r = 0), integrate several radial periods
    q0, p0 = equatorial_ics(r_a, energy, l_z, params, sign_ur=-1.0)
    r, phi, p_r = _integrate_orbit(q0, p0, params, dt, n)
    assert r.min() > 0.9 * r_p and r.max() < 1.1 * r_a  # stayed bound
    adv = _measured_advance(phi, p_r)
    exact = float(periapsis_advance_quadrature(r_p, r_a, params,
                                               prograde=prograde))
    assert np.max(np.abs(adv - exact)) < 3e-3 * abs(exact) + 1e-4


def test_integrator_preserves_mass_shell():
    params = _params(a=0.9)
    energy, l_z = bound_orbit_e_lz(6.0, 12.0, params)
    q0, p0 = equatorial_ics(9.0, energy, l_z, params)
    step = make_step(kerr_g_inv)
    subs = substep_schedule(jnp.float64(0.02), jnp.float64(1.0), 4)

    def body(carry, _):
        out = step(*carry, params, subs)
        h = hamiltonian(out[0], out[3], params, kerr_g_inv)
        return out, h

    _, hs = jax.lax.scan(body, (q0, p0, q0, p0), None, length=20_000)
    # symplectic: no secular energy error; f64 roundoff accumulates ~1e-14
    # per step linearly at worst
    assert float(jnp.max(jnp.abs(hs + 0.5))) < 5e-9
