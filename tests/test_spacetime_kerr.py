"""Generic-metric engine (physics.spacetime + engine.integrate_generic).

The reference's ground-truth library is metric-generic (EinsteinPy Nulllike
with metric_params=(a,), reference tests/einsteinpy-geodesic-test/
main.py:145-155); these tests pin the grtrace generalization:
  * Kerr reduces exactly to Schwarzschild at a = 0 (cross-engine agreement
    with the specialized fast path AND the independent NumPy oracle),
  * stationarity/axisymmetry conservation: E = -p_t and L_z = p_phi are
    preserved by the flows,
  * the null Hamiltonian stays ~0 along Kerr rays (symplectic drift bound),
  * frame dragging: prograde vs retrograde Kerr rays bend asymmetrically,
  * the compat Nulllike(metric="Kerr") surface works end to end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.engine.integrate import integrate_batch
from grtrace.engine.integrate_generic import (integrate_batch_generic,
                                              trajectory_generic)
from grtrace.oracle import cpu_integrator as oracle
from grtrace.physics import spacetime
from grtrace.physics.camera import camera_rays
from grtrace.physics.nullcond import build_null_4momentum as schw_null4


def _rays(n=4):
    q0, p0, *_ = camera_rays(np.array([30.0, 0.0, 0.0]), np.radians(70.0),
                             n, n, dtype=jnp.float64)
    return (jnp.asarray(q0).reshape(-1, 4), jnp.asarray(p0).reshape(-1, 4))


def test_kerr_g_inv_reduces_to_schwarzschild():
    q = jnp.array([0.0, 7.3, 1.1, 0.4], jnp.float64)
    gk = spacetime.kerr_g_inv(q, jnp.array([1.0, 0.0]))
    gs = spacetime.schwarzschild_g_inv(q, jnp.array([1.0]))
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gs),
                               rtol=0, atol=1e-14)


def test_null_pt_reduces_to_schwarzschild():
    pos = jnp.array([12.0, 1.2, 0.3], jnp.float64)
    mom = jnp.array([-0.8, 0.1, 2.0], jnp.float64)
    p4_gen = spacetime.build_null_4momentum(
        mom, pos, jnp.array([1.0, 0.0]), spacetime.kerr_g_inv, future=True)
    p4_schw = schw_null4(mom, pos, mass_bh=1.0, future=True)
    np.testing.assert_allclose(np.asarray(p4_gen), np.asarray(p4_schw),
                               rtol=0, atol=1e-12)
    # and the built covector is actually null in the Kerr metric
    a_spin = 0.6
    params = jnp.array([1.0, a_spin])
    p4_kerr = spacetime.build_null_4momentum(
        mom, pos, params, spacetime.kerr_g_inv, future=True)
    q4 = jnp.array([0.0, *np.asarray(pos)])
    h = spacetime.hamiltonian(q4, p4_kerr, params, spacetime.kerr_g_inv)
    assert abs(float(h)) < 1e-12


def test_horizon_radius():
    assert float(spacetime.horizon_radius("Schwarzschild", 1.0)) == 2.0
    assert float(spacetime.horizon_radius("Kerr", 1.0, 0.0)) == 2.0
    assert np.isclose(float(spacetime.horizon_radius("Kerr", 1.0, 1.0)), 1.0)
    assert np.isclose(float(spacetime.horizon_radius("Kerr", 1.0, 0.6)),
                      1.0 + np.sqrt(1.0 - 0.36))


def test_kerr_a0_matches_schwarzschild_engines():
    """Generic Kerr engine at a=0 == specialized engine == NumPy oracle."""
    q0, p0 = _rays(4)
    args = (800, 0.05, 2.0, 31.0, 1.0)          # steps delta rs rmax omega
    fq_s, fp_s, st_s, ns_s = integrate_batch(q0, p0, *args)
    fq_g, fp_g, st_g, ns_g = integrate_batch_generic(
        q0, p0, 800, 0.05, jnp.array([1.0, 0.0]), 31.0, 1.0, metric="Kerr")
    assert bool((st_s == st_g).all())
    assert bool((ns_s == ns_g).all())
    weak = np.asarray(fq_s)[:, 1] > 3.0
    d = np.abs(np.asarray(fq_s) - np.asarray(fq_g)).max(axis=1)
    assert d[weak].max() < 1e-8

    ora = oracle.integrate_batch(np.asarray(q0), np.asarray(p0), *args)
    d_o = np.abs(ora - np.asarray(fq_g)).max(axis=1)
    assert d_o[weak].max() < 1e-8


def test_kerr_conserved_quantities():
    """E = -p_t and L_z = p_phi conserved along a scattering Kerr ray.

    Flows A/B conserve the cyclic momenta exactly (dH/dt = dH/dphi = 0 by
    autodiff of the stationary axisymmetric metric); the omega-mixing flow
    leaks O(delta^3) per step between the phase-space copies, so the bound
    is tight-but-not-machine-epsilon.  The ray scatters (periapsis ~ 10M,
    weak field) so chaotic amplification stays out of the picture.
    """
    params = jnp.array([1.0, 0.7], jnp.float64)
    pos = jnp.array([15.0, np.pi / 2, 0.0], jnp.float64)
    mom = jnp.array([-1.0, 0.02, 12.0], jnp.float64)
    p4 = spacetime.build_null_4momentum(mom, pos, params,
                                        spacetime.kerr_g_inv, future=True)
    q4 = jnp.array([0.0, *np.asarray(pos)], jnp.float64)
    fq, fp, st, ns = integrate_batch_generic(
        q4[None], p4[None], 60000, 0.02, params, 40.0, 1.0, metric="Kerr")
    assert int(st[0]) == 2, "ray must escape"
    fp = np.asarray(fp)[0]
    p4 = np.asarray(p4)
    assert abs(fp[0] - p4[0]) < 1e-6    # energy
    assert abs(fp[3] - p4[3]) < 1e-6    # axial angular momentum
    h = spacetime.hamiltonian(jnp.asarray(np.asarray(fq)[0]),
                              jnp.asarray(fp), params, spacetime.kerr_g_inv)
    assert abs(float(h)) < 1e-5         # still ~null at escape (ord-2 drift)


def test_frame_dragging_asymmetry():
    """Prograde and retrograde equatorial rays deflect differently for
    a != 0 and identically for a == 0 — the defining Kerr signature."""
    pos = jnp.array([20.0, np.pi / 2, 0.0], jnp.float64)

    def escape_phi(spin, lz):
        params = jnp.array([1.0, spin], jnp.float64)
        mom = jnp.array([-1.0, 0.0, lz], jnp.float64)
        p4 = spacetime.build_null_4momentum(mom, pos, params,
                                            spacetime.kerr_g_inv, future=True)
        q4 = jnp.array([0.0, *np.asarray(pos)], jnp.float64)
        fq, fp, st, ns = integrate_batch_generic(
            q4[None], p4[None], 40000, 0.02, params, 60.0, 1.0,
            metric="Kerr")
        assert int(st[0]) == 2, "ray must escape"
        return float(fq[0, 3])

    d_pro = abs(escape_phi(0.9, 7.0))
    d_ret = abs(escape_phi(0.9, -7.0))
    assert abs(d_pro - d_ret) > 1e-3
    d0_pro = abs(escape_phi(0.0, 7.0))
    d0_ret = abs(escape_phi(0.0, -7.0))
    assert abs(d0_pro - d0_ret) < 1e-9


def test_compat_nulllike_kerr():
    from grtrace.compat.einsteinpy import Nulllike
    g = Nulllike(metric="Kerr", metric_params=(0.5,),
                 position=(12.0, np.pi / 2, 0.0), momentum=(-1.0, 0.0, 4.0),
                 steps=100, delta=0.05, return_cartesian=False)
    idx, data = g.trajectory
    assert data.shape == (100, 8)
    assert np.isfinite(data).all()
    # spin actually matters: same ray in Schwarzschild differs
    g0 = Nulllike(metric="Schwarzschild",
                  position=(12.0, np.pi / 2, 0.0), momentum=(-1.0, 0.0, 4.0),
                  steps=100, delta=0.05, return_cartesian=False)
    _, data0 = g0.trajectory
    assert np.abs(data - data0).max() > 1e-3

    with pytest.raises(NotImplementedError):
        Nulllike(metric="FRW")
    with pytest.raises(ValueError):
        Nulllike(metric="Schwarzschild", metric_params=(0.3,))


def test_bl_bardeen_predicate_matches_integration():
    """The BL front-end of the Bardeen predicate must agree with the f64
    BL integration on (essentially) every camera ray — only pixels whose
    impact parameter sits within the integrator's truncation band of the
    critical curve may disagree (a 14x14 grid has at most a couple)."""
    import jax.numpy as jnp
    import numpy as np
    from grtrace.engine.integrate import STATUS_ESCAPED
    from grtrace.engine.integrate_generic import integrate_batch_generic
    from grtrace.engine.integrate_ks import bardeen_escape_pred_bl
    from grtrace.physics.camera import camera_rays_unfolded
    from grtrace.physics.spacetime import METRICS

    params = jnp.asarray([1.0, 0.9, 0.0])
    q0, p0, _ = camera_rays_unfolded(
        jnp.asarray([30.0, 0.0, 0.0]), jnp.radians(80.0), 14, 14,
        params=params, g_inv_fn=METRICS["Kerr"], dtype=jnp.float64)
    q0 = q0.reshape(-1, 4)
    p0 = p0.reshape(-1, 4)
    _, _, status, _ = integrate_batch_generic(
        q0, p0, 8000, 0.02, params, 31.0, 1.0, metric="Kerr")
    pred = np.asarray(bardeen_escape_pred_bl(q0, p0, jnp.float64(1.0),
                                             jnp.float64(0.9),
                                             jnp.float64(0.0)))
    esc = np.asarray(status) == STATUS_ESCAPED
    mismatch = int((pred != esc).sum())
    assert mismatch <= 2, f"{mismatch} of {esc.size} rays disagree"


def test_cartesian_bardeen_predicate_off_equator():
    """The Cartesian front-end computes the FULL Carter constant
    (p_theta projection + cos^2-theta term), so the analytic rescue is
    exact for observers off the equatorial plane too — pinned against
    f64 integration from a camera hovering at z = 12."""
    import jax.numpy as jnp
    import numpy as np
    from grtrace.engine.integrate import STATUS_ESCAPED
    from grtrace.engine.integrate_generic import integrate_batch_generic
    from grtrace.engine.integrate_ks import bardeen_escape_pred
    from grtrace.physics.camera import camera_rays_cartesian
    from grtrace.physics.spacetime import METRICS

    params = jnp.asarray([1.0, 0.9, 0.0])
    q0, p0, _ = camera_rays_cartesian(
        jnp.asarray([27.0, 0.0, 12.0]), jnp.radians(70.0), 10, 10,
        params=params, g_inv_fn=METRICS["KerrSchild"], dtype=jnp.float64)
    q0 = q0.reshape(-1, 4)
    p0 = p0.reshape(-1, 4)
    _, _, status, _ = integrate_batch_generic(
        q0, p0, 8000, 0.02, params, 33.0, 1.0, metric="KerrSchild")
    pred = np.asarray(bardeen_escape_pred(q0, p0, jnp.float64(1.0),
                                          jnp.float64(0.9),
                                          jnp.float64(0.0)))
    esc = np.asarray(status) == STATUS_ESCAPED
    assert esc.sum() > 50 and (~esc).sum() > 2      # both classes present
    assert int((pred != esc).sum()) == 0
