"""Higher-order (Yoshida-composed) integrators: orders 4/6/8.

The reference CLI accepts --order {2,4,6,8} (reference config.py:14) but only
implements order 2 on its GPU (cuda_geodesic.py:569).  grtrace implements
the triple-jump compositions for real; these tests pin:
  * the static substep schedule (sums to 1, correct fan-out),
  * measured convergence order on a weak-field arc vs a float64 truth,
  * cross-backend agreement (oracle / XLA / Pallas-interpret) at order 4.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.engine.integrate import integrate_batch
from grtrace.engine.integrate_pallas import integrate_batch_pallas
from grtrace.oracle import cpu_integrator as oracle
from grtrace.physics.camera import camera_rays
from grtrace.physics.hamiltonian import yoshida_gammas

RS = 2.0
OMEGA = 1.0
R_MAX = 1e9          # no escape: fixed-span comparisons need equal budgets


@pytest.mark.parametrize("order,n_sub", [(2, 1), (4, 3), (6, 9), (8, 27)])
def test_gammas_schedule(order, n_sub):
    g = yoshida_gammas(order)
    assert len(g) == n_sub
    assert abs(sum(g) - 1.0) < 1e-12
    # engine and oracle must agree on the schedule (independent twins)
    assert np.allclose(g, oracle.yoshida_gammas(order))


def test_invalid_order_rejected():
    with pytest.raises(ValueError):
        yoshida_gammas(3)
    with pytest.raises(ValueError):
        oracle.yoshida_gammas(5)


def _weak_ray():
    """One camera ray with a comfortable periapsis (weak field, no chaos)."""
    q0, p0, *_ = camera_rays(np.array([30.0, 0.0, 0.0]), np.radians(60.0),
                             5, 5, dtype=jnp.float64)
    q = np.asarray(q0, np.float64).reshape(-1, 4)[1]   # off-axis pixel
    p = np.asarray(p0, np.float64).reshape(-1, 4)[1]
    return q, p


def _final_err(order, delta, steps, truth):
    q, p = _weak_ray()
    qf, pf, taken = oracle.integrate(q, p, steps, delta, RS, R_MAX, OMEGA,
                                     order)
    assert taken == steps
    return np.abs(qf - truth).max()


def test_convergence_orders():
    """Halving delta must shrink the final-state error by ~2^order.

    Truth = order-8 at 4x finer delta over the same lambda span.
    """
    q, p = _weak_ray()
    span_steps = 200
    delta = 0.05
    truth, _, _ = oracle.integrate(q, p, span_steps * 8, delta / 8, RS,
                                   R_MAX, OMEGA, 8)

    for order, min_ratio in [(2, 3.0), (4, 10.0)]:
        e1 = _final_err(order, delta, span_steps, truth)
        e2 = _final_err(order, delta / 2, span_steps * 2, truth)
        ratio = e1 / e2
        # nominal ratios 4 and 16; allow slack for error-constant wobble
        assert ratio > min_ratio, (order, e1, e2, ratio)

    # at equal delta, each order increase must beat the previous order
    errs = {o: _final_err(o, delta, span_steps, truth) for o in (2, 4, 6)}
    assert errs[4] < errs[2] / 10
    assert errs[6] < errs[4]


def test_xla_matches_oracle_order4():
    q, p = _weak_ray()
    steps, delta = 300, 0.05
    qo, po, _ = oracle.integrate(q, p, steps, delta, RS, R_MAX, OMEGA, 4)
    fq, fp, st, ns = integrate_batch(jnp.asarray(q)[None], jnp.asarray(p)[None],
                                     steps, delta, RS, R_MAX, OMEGA, order=4)
    np.testing.assert_allclose(np.asarray(fq)[0], qo, rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(fp)[0], po, rtol=0, atol=1e-9)
    assert int(ns[0]) == steps


def test_pallas_interpret_matches_xla_order4():
    q0, p0, *_ = camera_rays(np.array([30.0, 0.0, 0.0]), np.radians(80.0),
                             8, 8, dtype=jnp.float64)
    q0 = jnp.asarray(q0).reshape(-1, 4)
    p0 = jnp.asarray(p0).reshape(-1, 4)
    args = (300, 0.05, RS, 31.0, 1.0)
    fq1, _, st1, ns1 = integrate_batch(q0, p0, *args, order=4)
    fq2, _, st2, ns2 = integrate_batch_pallas(q0, p0, *args, interpret=True,
                                              order=4)
    assert bool((st1 == st2).all())
    assert bool((ns1 == ns2).all())
    d = np.abs(np.asarray(fq1) - np.asarray(fq2)).max(axis=1)
    weak = np.asarray(fq1)[:, 1] > 3.0
    assert d[weak].max() < 1e-8


def test_staggered_equatorial_order4_matches_generic():
    """The STAGGERED equatorial kernel at order 4 exercises the cyclic
    bridge schedule (bridge_j spans substeps j and j+1 mod 3) — it must
    track the plain generic composition on weak-field f64 rays."""
    q0, p0, *_ = camera_rays(np.array([30.0, 0.0, 0.0]), np.radians(80.0),
                             8, 8, dtype=jnp.float64)
    q0 = jnp.asarray(q0).reshape(-1, 4)
    p0 = jnp.asarray(p0).reshape(-1, 4)
    args = (300, 0.05, RS, 31.0, 1.0)
    fq1, _, st1, ns1 = integrate_batch(q0, p0, *args, order=4)
    fq2, _, st2, ns2 = integrate_batch_pallas(q0, p0, *args, interpret=True,
                                              order=4, equatorial=True)
    assert bool((st1 == st2).all())
    assert bool((ns1 == ns2).all())
    d = np.abs(np.asarray(fq1) - np.asarray(fq2)).max(axis=1)
    weak = np.asarray(fq1)[:, 1] > 3.0
    assert d[weak].max() < 1e-8


def test_staggered_compensated_order4_twin_exact():
    """Compensated kernel and its XLA twin share the staggered (open, core,
    close) functions AND the bridge computation, so order-4 results must
    agree to float32 roundoff (same contract the order-2 parity pins)."""
    from grtrace.engine.integrate import integrate_batch_compensated

    q0, p0, *_ = camera_rays(np.array([30.0, 0.0, 0.0], np.float32),
                             np.radians(80.0), 6, 6, dtype=jnp.float32)
    q0 = jnp.asarray(q0).reshape(-1, 4)
    p0 = jnp.asarray(p0).reshape(-1, 4)
    args = (256, 0.05, RS, 31.0, 1.0)
    fq_x, _, st_x, ns_x = integrate_batch_compensated(q0, p0, *args, order=4)
    fq_p, _, st_p, ns_p = integrate_batch_pallas(
        q0, p0, *args, interpret=True, order=4, equatorial=True,
        compensated=True)
    np.testing.assert_array_equal(np.asarray(ns_x), np.asarray(ns_p))
    assert bool((st_x == st_p).all())
    np.testing.assert_allclose(np.asarray(fq_p), np.asarray(fq_x),
                               rtol=0, atol=1e-6)
