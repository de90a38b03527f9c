"""The exact solver is differentiable: implicit gradients vs FD.

Every root in physics/geodesic_exact.py (radial/polar turning points,
the r(tau) and theta(phase) inversions) is found by bisection — whose
select chain is piecewise constant in the inputs — then polished by one
Newton step from a stop_gradient'ed seed, which (a) leaves the value
unchanged to the bracket width and (b) carries the exact implicit-
function-theorem derivative.  These tests pin the resulting end-to-end
gradients of escape_state and crossing_table against central finite
differences, including the spin derivative THROUGH the camera, the
chart maps, the turning points and the phase walk at once — the
gradient path the lens-equation solver (engine/images.py) and any
future gradient-based fitter rely on.

FD tolerances are loose (1e-3 relative): the finite difference itself
carries O(h^2 f''') truncation error; the turning-point-only checks,
where FD is benign, are pinned tight (1e-6).

No reference counterpart: the reference cannot differentiate anything
(simulation/raytracing.py is CUDA with no AD).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.physics.camera import camera_rays_cartesian
from grtrace.physics.geodesic_exact import (crossing_table, escape_state,
                                            radial_turning)
from grtrace.physics.photon_shell import _theta_turning
from grtrace.physics.spacetime import METRICS

OBS = jnp.array([30.0, 0.0, 0.0])


def _rays(spin, n=9, fov_deg=40.0):
    params = jnp.stack([jnp.float64(1.0), spin, jnp.float64(0.0)])
    q0, p0, _ = camera_rays_cartesian(
        OBS, jnp.float64(np.deg2rad(fov_deg)), n, n, params=params,
        g_inv_fn=METRICS["KerrSchild"], dtype=jnp.float64)
    return q0.reshape(-1, 4), p0.reshape(-1, 4), params


def test_radial_turning_grad():
    """d r4 / d lam matches FD to ~1e-6 relative (implicit theorem on
    R(r4) = 0; the bisected seed alone would give gradient zero)."""
    params = jnp.array([1.0, 0.9, 0.0])
    eta = jnp.float64(10.0)
    f = lambda l: radial_turning(l, eta, params, 30.0)[1]
    g = jax.grad(f)(jnp.float64(5.0))
    h = 1e-6
    fd = (f(jnp.float64(5.0 + h)) - f(jnp.float64(5.0 - h))) / (2 * h)
    assert abs(float(g - fd)) / abs(float(fd)) < 1e-6
    assert float(g) != 0.0


def test_theta_turning_grad():
    params = jnp.array([1.0, 0.9, 0.0])
    f = lambda x: _theta_turning(x, jnp.float64(10.0), params)
    g = jax.grad(f)(jnp.float64(5.0))
    h = 1e-6
    fd = (f(jnp.float64(5.0 + h)) - f(jnp.float64(5.0 - h))) / (2 * h)
    assert abs(float(g - fd)) / abs(float(fd)) < 1e-5


def test_theta_turning_circulating_grad_finite():
    """lam = 0 circulating orbits have no polar root: the polish must
    stay off (guarded) and the gradient must be finite, not NaN."""
    params = jnp.array([1.0, 0.9, 0.0])
    g = jax.grad(lambda k: _theta_turning(jnp.float64(0.0), k,
                                          params))(jnp.float64(10.0))
    assert np.isfinite(float(g))


@pytest.mark.parametrize("out", ["theta", "phi", "t", "tau"])
def test_escape_state_spin_grad(out):
    """d(escape record)/d(spin) through camera + conserved + turning
    points + phase walk, vs central FD."""
    idx = jnp.array([3, 20, 60])

    def f(spin):
        q0, p0, params = _rays(spin)
        es = escape_state(q0[idx], p0[idx], params, jnp.float64(31.0))
        return es[out]

    jac = np.asarray(jax.jacrev(f)(jnp.float64(0.9)))
    h = 1e-6
    fd = np.asarray((f(jnp.float64(0.9 + h))
                     - f(jnp.float64(0.9 - h))) / (2 * h))
    assert np.all(np.abs(jac) > 0.0)
    rel = np.abs(jac - fd) / np.maximum(np.abs(fd), 1e-8)
    assert rel.max() < 1e-3, (jac, fd)


def test_crossing_table_spin_grad():
    """d r_crossing / d spin for the first two image orders vs FD —
    the gradient the differentiable disk observables would consume."""
    idx = jnp.array([12, 40])

    def f(spin):
        q0, p0, params = _rays(spin)
        tab = crossing_table(q0[idx], p0[idx], params, n_orders=2)
        return tab["r"]

    jac = np.asarray(jax.jacrev(f)(jnp.float64(0.6)))
    h = 1e-6
    fd = np.asarray((f(jnp.float64(0.6 + h))
                     - f(jnp.float64(0.6 - h))) / (2 * h))
    valid = np.asarray(
        crossing_table(*(lambda q, p, par: (q[idx], p[idx], par))(
            *_rays(jnp.float64(0.6))), n_orders=2)["valid"])
    rel = (np.abs(jac - fd) / np.maximum(np.abs(fd), 1e-8))[valid]
    assert valid.any()
    assert rel.max() < 1e-3, (jac, fd)


def test_escape_state_pixel_jacobian_invertible():
    """The lens-equation Jacobian d(exit angles)/d(p0) is finite and
    nonzero for an escaping ray — what engine/images.py Newton needs."""
    q0, p0, params = _rays(jnp.float64(0.9))

    def f(p_pert):
        es = escape_state(q0[3:4], p_pert[None], params,
                          jnp.float64(31.0))
        return jnp.stack([es["theta"][0], es["phi"][0]])

    j = np.asarray(jax.jacfwd(f)(p0[3]))
    assert np.isfinite(j).all()
    assert (np.abs(j) > 0).any(axis=1).all()
