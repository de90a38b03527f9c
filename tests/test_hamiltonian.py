"""FANTASY step correctness: engine flows vs the independent float64 oracle,
plus conservation diagnostics."""
import jax.numpy as jnp
import numpy as np

from grtrace.oracle import cpu_integrator as oracle
from grtrace.physics.camera import camera_rays
from grtrace.physics.hamiltonian import (fantasy_step_ord2, hamiltonian,
                                         pack_state, unpack_p1, unpack_q1)

RS, OMEGA, DELTA = 2.0, 1.0, 0.05


def _rand_rays(n=16, seed=1):
    rng = np.random.default_rng(seed)
    q = np.zeros((n, 4))
    q[:, 1] = rng.uniform(5.0, 30.0, n)
    q[:, 2] = rng.uniform(0.5, np.pi - 0.5, n)
    q[:, 3] = rng.uniform(0.0, 2 * np.pi, n)
    p = rng.normal(size=(n, 4))
    return q, p


def test_single_step_matches_oracle():
    q, p = _rand_rays()
    ang = 2 * OMEGA * DELTA
    st = fantasy_step_ord2(pack_state(jnp.asarray(q), jnp.asarray(p)),
                           DELTA, RS, np.cos(ang), np.sin(ang))
    eq, ep = np.asarray(unpack_q1(st)), np.asarray(unpack_p1(st))
    for i in range(q.shape[0]):
        oq, op, oq2, op2 = oracle.fantasy_step_ord2(
            q[i].copy(), p[i].copy(), q[i].copy(), p[i].copy(),
            DELTA, RS, OMEGA)
        np.testing.assert_allclose(eq[i], oq, rtol=0, atol=1e-12)
        np.testing.assert_allclose(ep[i], op, rtol=0, atol=1e-12)


def test_hamiltonian_conserved_null_ray():
    """H = 0.5 g^{ab} p_a p_b should stay ~0 along a null ray."""
    obs = np.array([30.0, 0.0, 0.0])
    q0, p0, *_ = camera_rays(obs, np.radians(60.0), 4, 4, dtype=jnp.float64)
    q = jnp.asarray(q0).reshape(-1, 4)
    p = jnp.asarray(p0).reshape(-1, 4)
    h0 = np.asarray(hamiltonian(q, p, RS))
    np.testing.assert_allclose(h0, 0.0, atol=1e-10)

    st = pack_state(q, p)
    ang = 2 * OMEGA * DELTA
    for _ in range(200):
        st = fantasy_step_ord2(st, DELTA, RS, np.cos(ang), np.sin(ang))
    h1 = np.asarray(hamiltonian(unpack_q1(st), unpack_p1(st), RS))
    # symplectic: bounded O(delta^2) oscillation, not secular growth
    assert np.max(np.abs(h1)) < 1e-5


def test_many_steps_match_oracle():
    q, p = _rand_rays(n=8, seed=3)
    st = pack_state(jnp.asarray(q), jnp.asarray(p))
    ang = 2 * OMEGA * DELTA
    n_steps = 50
    for _ in range(n_steps):
        st = fantasy_step_ord2(st, DELTA, RS, np.cos(ang), np.sin(ang))
    eq = np.asarray(unpack_q1(st))
    for i in range(q.shape[0]):
        q1, p1 = q[i].copy(), p[i].copy()
        q2, p2 = q[i].copy(), p[i].copy()
        for _ in range(n_steps):
            q1, p1, q2, p2 = oracle.fantasy_step_ord2(q1, p1, q2, p2,
                                                      DELTA, RS, OMEGA)
        np.testing.assert_allclose(eq[i], q1, rtol=1e-9, atol=1e-9)
