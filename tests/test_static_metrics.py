"""Beyond-Kerr static families (Kottler / Bardeen / Hayward) — theory
layer and integrated shadow boundaries.

The theory quantities (photon sphere, critical impact parameter,
horizons) come from Newton/bisection on AUTODIFF derivatives
(physics/static_metrics.py); every one is cross-checked here against an
INDEPENDENT oracle: hand-derived f'(r) formulas + SciPy brentq for the
photon spheres, exact polynomial roots (np.roots) for the Kottler and
Hayward horizons, and the closed-form Schwarzschild limits.  The
integrated shadow boundary is then bisected through the real generic
engine (camera -> FANTASY autodiff integrator -> status) and pinned
against the analytic escape predicate b(alpha) > b_c
(static_metrics.impact_parameter_cam) — theory that never touches the
integrator.

No reference counterpart: the reference is Schwarzschild-only
(simulation/cuda_geodesic.py:432-447).
"""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import brentq

from grtrace.engine import validate as _val
from grtrace.engine.integrate import STATUS_ESCAPED
from grtrace.engine.integrate_generic import integrate_batch_generic
from grtrace.physics import static_metrics as sm
from grtrace.physics.camera import folded_ics_from_pixels_static
from grtrace.physics.spacetime import METRICS, horizon_radius, schwarzschild_g_inv

M = 1.0
R0 = _val.R0
SIZE = _val.SIZE
PLANE_D = _val.PLANE_D
PLANE_W = _val.PLANE_W

# family parameter values used throughout: strong enough to move the
# observables by many pixels, far from both the Schwarzschild and the
# critical ends.  Kottler at Lambda = 1e-3 keeps the observer well inside
# the cosmological horizon (f(30) = 0.633; at 3e-3 the observer at r = 30
# sits at f = 0.033, a sliver from the r_c = 30.57 horizon, and fixed
# steps explode on the -1/f metric terms)
CASES = [("Kottler", 1e-3), ("Bardeen", 0.5), ("Hayward", 0.65)]


# independent algebra: f and f' hand-derived in numpy (the module under
# test differentiates with jax.grad; agreement here checks both)
def _np_f_fp(name):
    if name == "Kottler":
        return (lambda r, p: 1 - 2 * M / r - p / 3 * r ** 2,
                lambda r, p: 2 * M / r ** 2 - 2 * p / 3 * r)
    if name == "Bardeen":
        return (lambda r, p: 1 - 2 * M * r ** 2 / (r ** 2 + p ** 2) ** 1.5,
                lambda r, p: 2 * M * r * (r ** 2 - 2 * p ** 2)
                / (r ** 2 + p ** 2) ** 2.5)
    return (lambda r, p: 1 - 2 * M * r ** 2 / (r ** 3 + 2 * M * p ** 2),
            lambda r, p: 2 * M * r * (r ** 3 - 4 * M * p ** 2)
            / (r ** 3 + 2 * M * p ** 2) ** 2)


def _params(p1):
    return (jnp.float64(M), jnp.float64(p1))


# ---------------------------------------------------------------------------
# Schwarzschild limits: p1 = 0 must reproduce the closed forms exactly
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["Kottler", "Bardeen", "Hayward"])
def test_schwarzschild_limit(name):
    f = sm.STATIC_F[name]
    params = _params(0.0)
    assert abs(float(sm.photon_sphere(f, params)) - 3.0 * M) < 1e-12
    assert abs(float(sm.b_critical(f, params)) - 3.0 * np.sqrt(3) * M) < 1e-10
    assert abs(float(sm.outer_horizon(f, params)) - 2.0 * M) < 1e-10
    # g_inv agrees with the dedicated Schwarzschild metric everywhere
    rng = np.random.default_rng(7)
    for _ in range(5):
        q = jnp.asarray([0.0, rng.uniform(2.2, 40.0),
                         rng.uniform(0.3, np.pi - 0.3),
                         rng.uniform(0, 2 * np.pi)], jnp.float64)
        g_new = METRICS[name](q, jnp.asarray([M, 0.0, 0.0], jnp.float64))
        g_ref = schwarzschild_g_inv(q, jnp.asarray([M], jnp.float64))
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   rtol=0, atol=1e-14)


# ---------------------------------------------------------------------------
# Photon sphere / critical impact parameter vs the SciPy + hand-algebra
# oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,p1", CASES)
def test_photon_sphere_vs_scipy_oracle(name, p1):
    f_np, fp_np = _np_f_fp(name)
    r_oracle = brentq(lambda r: 2 * f_np(r, p1) - r * fp_np(r, p1),
                      2.2, 4.0, xtol=1e-14)
    r_ad = float(sm.photon_sphere(sm.STATIC_F[name], _params(p1)))
    assert abs(r_ad - r_oracle) < 1e-10
    b_oracle = r_oracle / np.sqrt(f_np(r_oracle, p1))
    assert abs(float(sm.b_critical(sm.STATIC_F[name], _params(p1)))
               - b_oracle) < 1e-10


def test_kottler_photon_sphere_is_lambda_independent():
    # 2f - r f' = 2 - 6M/r for Kottler: the photon sphere never moves
    for lam in [0.0, 1e-4, 3e-3, 1e-2]:
        assert abs(float(sm.photon_sphere(sm.kottler_f, _params(lam)))
                   - 3.0 * M) < 1e-12


# ---------------------------------------------------------------------------
# Horizons: exact polynomial roots (Kottler, Hayward), brentq (Bardeen),
# the horizonless super-critical branch, and the registry dispatch
# ---------------------------------------------------------------------------

def _positive_real_roots(coeffs):
    r = np.roots(coeffs)
    return np.sort(r[(np.abs(r.imag) < 1e-10) & (r.real > 0)].real)


def test_kottler_horizons_exact_cubic():
    lam = 3e-3
    # f = 0  <=>  -(lam/3) r^3 + r - 2M = 0
    roots = _positive_real_roots([-lam / 3.0, 0.0, 1.0, -2.0 * M])
    r_bh, r_cosmo = roots[0], roots[-1]
    assert abs(float(sm.outer_horizon(sm.kottler_f, _params(lam)))
               - r_bh) < 1e-9
    assert abs(float(sm.cosmological_horizon(_params(lam))) - r_cosmo) < 1e-9
    # Lambda pushes the BH horizon out, and the ordering is sane
    assert 2.0 * M < r_bh < 3.0 * M < r_cosmo


def test_hayward_horizon_exact_cubic():
    ell = 0.5
    # f = 0  <=>  r^3 - 2M r^2 + 2M l^2 = 0 (outer root)
    r_oracle = _positive_real_roots([1.0, -2.0 * M, 0.0,
                                     2.0 * M * ell ** 2])[-1]
    assert abs(float(sm.outer_horizon(sm.hayward_f, _params(ell)))
               - r_oracle) < 1e-9


def test_bardeen_horizon_brentq_and_critical_charge():
    g = 0.5
    f_np, _ = _np_f_fp("Bardeen")
    r_oracle = brentq(lambda r: f_np(r, g), 1.2, 2.0, xtol=1e-14)
    assert abs(float(sm.outer_horizon(sm.bardeen_f, _params(g)))
               - r_oracle) < 1e-9
    # horizons exist iff g <= sqrt(16/27) M ~ 0.7698
    assert np.isfinite(float(sm.outer_horizon(sm.bardeen_f, _params(0.76))))
    assert np.isnan(float(sm.outer_horizon(sm.bardeen_f, _params(0.78))))


def test_horizon_radius_registry_dispatch():
    # spacetime.horizon_radius routes the static families to the bisector
    assert abs(float(horizon_radius("Bardeen", M, 0.5))
               - float(sm.outer_horizon(sm.bardeen_f, _params(0.5)))) < 1e-12
    assert abs(float(horizon_radius("Kottler", M, 0.0)) - 2.0 * M) < 1e-10


def test_shadow_angle_schwarzschild_closed_form():
    f0 = 1.0 - 2.0 * M / R0
    expect = np.arcsin(3 * np.sqrt(3) * M * np.sqrt(f0) / R0)
    got = float(sm.shadow_angle(sm.kottler_f, _params(0.0), R0))
    assert abs(got - expect) < 1e-12


# ---------------------------------------------------------------------------
# Integrated shadow boundary vs the analytic escape predicate — the
# end-to-end check through the real generic engine
# ---------------------------------------------------------------------------

PSIS2 = np.array([0.0, np.pi / 2])  # spherical symmetry: 2 azimuths suffice
                                    # (and cross-check circularity)


def _alpha_cam(rhos):
    return np.arctan(np.asarray(rhos) / SIZE * PLANE_W / PLANE_D)


def _analytic_escapes(name, p1):
    f = sm.STATIC_F[name]
    b_c = float(sm.b_critical(f, _params(p1)))

    def escapes(rhos):
        b = sm.impact_parameter_cam(jnp.asarray(_alpha_cam(rhos)), f,
                                    _params(p1), R0)
        return np.asarray(b) > b_c
    return escapes


def _integrated_escapes(name, p1, steps=6_000, delta=0.02, order=4):
    # order 4: the order-2 boundary carries ~0.18 px of truncation at
    # delta = 0.02 and converges toward the analytic curve from above
    # (0.11 px at delta = 0.01); Yoshida order 4 lands at ~0.06 px — the
    # bisection bracket — which pins the analytic predicate as the limit
    params = jnp.asarray([M, p1, 0.0], jnp.float64)

    def escapes(rhos):
        pix = jnp.asarray(_val._pixel_positions(rhos, PSIS2[:, None]),
                          jnp.float64)
        # the production camera for static metrics: the equatorial
        # beta-fold (exact under spherical symmetry; the unfolded chart
        # retires exactly-over-pole rays — the psi = pi/2 azimuth here —
        # on the 1/sin(theta) BL stiffness)
        q0, p0, _, _ = folded_ics_from_pixels_static(
            jnp.asarray([R0, 0.0, 0.0], jnp.float64), pix, params=params,
            g_inv_fn=METRICS[name])
        _, _, status, _ = integrate_batch_generic(
            q0.reshape(-1, 4), p0.reshape(-1, 4), steps, delta, params,
            31.0, 1.0, order=order, metric=name)
        return np.asarray(status).reshape(rhos.shape) == STATUS_ESCAPED
    return escapes


@pytest.mark.parametrize("name,p1", CASES)
def test_shadow_boundary_integrated_vs_analytic(name, p1):
    rho_ana, br_a = _val.bisect_boundary(
        _analytic_escapes(name, p1), 10.0, 34.0, rounds=4, n_psi=2)
    rho_num, br_n = _val.bisect_boundary(
        _integrated_escapes(name, p1), 10.0, 34.0, rounds=3, k=9, n_psi=2)
    # spherical symmetry: both azimuths must agree (circular shadow)
    assert abs(rho_num[0] - rho_num[1]) < max(br_n, 0.05)
    err = np.abs(rho_num - rho_ana).max()
    assert err < 0.12, (rho_num, rho_ana, br_a, br_n)
    # and the parameter genuinely moved the boundary off Schwarzschild
    rho_schw = _val.schwarzschild_analytic_rho()
    assert abs(rho_ana[0] - rho_schw) > 0.5


def test_horizonless_bardeen_renders_no_shadow():
    """Super-critical Bardeen (g = 0.9 > 0.7698): no horizon, so the
    near-critical rays wind through the regular core; the deep-capture
    floor must not manufacture a shadow disk."""
    esc = _integrated_escapes("Bardeen", 0.9, steps=8_000)
    rhos = np.array([[12.0, 16.0, 20.0, 24.0], [12.0, 16.0, 20.0, 24.0]])
    # far outside the (sub-critical) critical curve everything escapes
    assert esc(rhos)[:, 2:].all()
