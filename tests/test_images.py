"""The lens-equation solver: found images really image the source.

The decisive check is solver-independent: every image find_images
returns is handed, as a fractional-pixel camera ray, to the PRODUCTION
Kerr-Schild integrator — which must exit the boundary sphere at the
requested source direction to its own discretization floor.  The
magnification is cross-checked against a central finite difference of
the very exit map the Jacobian differentiates, and basic lensing
structure is asserted: primary upright (mu > 0), secondary flipped
(mu < 0), both present for an off-axis source behind the hole.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.engine.images import _one_ray_exit, find_images
from grtrace.engine.integrate_generic import integrate_batch_generic
from grtrace.physics.camera import (cartesian_ics_from_pixels,
                                    pixel_positions_fractional)
from grtrace.physics.spacetime import METRICS

TH_S = np.pi / 2 + 0.08
PH_S = np.pi - 0.25


@pytest.fixture(scope="module", params=[0.0, 0.9], ids=["a0", "a0.9"])
def found(request):
    spin = request.param
    imgs = find_images(TH_S, PH_S, params=[1.0, spin, 0.0], scan=48,
                       windings=(-1, 0))
    return spin, imgs


def test_two_images_with_opposite_parity(found):
    _, imgs = found
    ok = {im["winding"]: im for im in imgs if im["converged"]}
    assert 0 in ok and -1 in ok, imgs
    assert ok[0]["mu"] > 0.0          # primary upright
    assert ok[-1]["mu"] < 0.0         # secondary mirror-flipped
    assert abs(ok[0]["mu"]) > abs(ok[-1]["mu"])  # and brighter
    # the secondary's path wraps the far side: it arrives LATER — the
    # lensing time delay a flare's copies would show
    assert ok[-1]["t_arrival"] > ok[0]["t_arrival"] + 1.0
    for im in ok.values():
        assert im["residual"] < 1e-8


def test_traced_integrator_confirms_images(found):
    """Feed each found (i, j) to the production integrator: the traced
    ray must exit the boundary sphere at the source direction (to the
    tracer's ~one-step overshoot floor)."""
    spin, imgs = found
    params = jnp.array([1.0, spin, 0.0])
    obs = jnp.array([30.0, 0.0, 0.0])
    conv = [im for im in imgs if im["converged"]]
    assert conv
    i_f = jnp.array([im["i"] for im in conv])
    j_f = jnp.array([im["j"] for im in conv])
    pix = pixel_positions_fractional(obs, jnp.float64(np.deg2rad(80.0)),
                                     256, 256, i_f, j_f,
                                     dtype=jnp.float64)
    q0, p0, _ = cartesian_ics_from_pixels(obs, pix, params=params,
                                          g_inv_fn=METRICS["KerrSchild"])
    fq, _, status, _ = integrate_batch_generic(
        q0, p0, 250_000, 0.01, params, 31.0, 0.0, order=4,
        metric="KerrSchild")
    assert (np.asarray(status) == 2).all()
    x, y, z = (np.asarray(fq[:, i]) for i in (1, 2, 3))
    rho = np.sqrt(x * x + y * y + z * z)
    th = np.arccos(z / rho)
    ph = np.arctan2(y, x)
    dth = np.abs(th - TH_S)
    dph = np.abs(np.mod(ph - PH_S + np.pi, 2 * np.pi) - np.pi)
    assert dth.max() < 5e-3, (dth, dph)
    assert dph.max() < 5e-3, (dth, dph)


def test_magnification_matches_fd(found):
    """The exact-Jacobian mu agrees with a centered finite difference
    of the same exit map (1e-3 relative: FD truncation dominates)."""
    spin, imgs = found
    params = jnp.asarray([1.0, spin, 0.0], jnp.float64)
    obs = jnp.array([30.0, 0.0, 0.0], jnp.float64)
    fov = jnp.float64(np.deg2rad(80.0))
    im = next(i for i in imgs if i["converged"] and i["winding"] == 0)

    def exit_vec(i_f, j_f):
        th, ph = _one_ray_exit(jnp.float64(i_f), jnp.float64(j_f),
                               params, obs, fov, 256, 256, 31.0)[:2]
        return np.array([float(th), float(ph)])

    h = 1e-4
    d_di = (exit_vec(im["i"] + h, im["j"])
            - exit_vec(im["i"] - h, im["j"])) / (2 * h)
    d_dj = (exit_vec(im["i"], im["j"] + h)
            - exit_vec(im["i"], im["j"] - h)) / (2 * h)
    det_fd = (d_di[0] * d_dj[1] - d_dj[0] * d_di[1]) * np.sin(
        exit_vec(im["i"], im["j"])[0])

    ij = jnp.array([im["i"], im["j"]], jnp.float64)
    jac = jax.jacfwd(lambda x: jnp.stack(_one_ray_exit(
        x[0], x[1], params, obs, fov, 256, 256, 31.0)[:2]))(ij)
    det_ad = float((jac[0, 0] * jac[1, 1]
                    - jac[0, 1] * jac[1, 0]) * jnp.sin(
        jnp.float64(exit_vec(im["i"], im["j"])[0])))
    assert abs(det_ad - det_fd) / abs(det_fd) < 1e-3
