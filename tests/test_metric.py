"""Metric identities and derivative checks against finite differences."""
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.physics import metric


RS = 2.0


def _points():
    rng = np.random.default_rng(0)
    r = rng.uniform(2.5, 40.0, size=32)
    th = rng.uniform(0.2, np.pi - 0.2, size=32)
    return jnp.asarray(r), jnp.asarray(th)


def test_contravariant_inverts_covariant():
    r, th = _points()
    g_tt, g_rr, g_thth, g_phph = metric.contravariant_diag(r, th, RS)
    f = 1.0 - RS / r
    # covariant Schwarzschild diagonal
    cov = (-f, 1.0 / f, r**2, (r * jnp.sin(th)) ** 2)
    for up, down in zip((g_tt, g_rr, g_thth, g_phph), cov):
        np.testing.assert_allclose(np.asarray(up * down), 1.0, rtol=1e-12)


@pytest.mark.parametrize("eps", [1e-6])
def test_dr_matches_finite_difference(eps):
    r, th = _points()
    ana = metric.dcontravariant_dr(r, th, RS)
    plus = metric.contravariant_diag(r + eps, th, RS)
    minus = metric.contravariant_diag(r - eps, th, RS)
    for a, p, m in zip(ana, plus, minus):
        fd = (np.asarray(p) - np.asarray(m)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(a), fd, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("eps", [1e-6])
def test_dth_matches_finite_difference(eps):
    r, th = _points()
    ana = metric.dcontravariant_dth(r, th, RS)
    plus = metric.contravariant_diag(r, th + eps, RS)[3]
    minus = metric.contravariant_diag(r, th - eps, RS)[3]
    fd = (np.asarray(plus) - np.asarray(minus)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(ana), fd, rtol=1e-5, atol=1e-9)


def test_general_mass_derivative():
    """The reference hardcoded M=1 in the tt/rr derivatives
    (cuda_geodesic.py:459-464); ours must track rs."""
    r = jnp.asarray([10.0])
    th = jnp.asarray([np.pi / 2])
    for rs in (1.0, 2.0, 6.0):
        eps = 1e-6
        ana = metric.dcontravariant_dr(r, th, rs)
        plus = metric.contravariant_diag(r + eps, th, rs)
        minus = metric.contravariant_diag(r - eps, th, rs)
        for a, p, m in zip(ana, plus, minus):
            fd = (np.asarray(p) - np.asarray(m)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(a), fd, rtol=1e-5)
