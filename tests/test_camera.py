"""Vectorized camera ICs vs an independent scalar NumPy re-derivation.

Plays the role of the reference's tests/test_initial_conditions.py (atol 1e-10
against EinsteinPy internals) — einsteinpy is unavailable here, so the scalar
model below re-derives the documented formulas (simulation/utils.py:91-195)
independently of the jnp implementation.
"""
import math

import jax.numpy as jnp
import numpy as np

from grtrace.physics.camera import camera_rays, pixel_grid


def scalar_initial_conditions(observer_pos, pixel_pos, mass_bh=1.0):
    """Straightforward scalar transcription of the reference pipeline math."""
    ray = pixel_pos - observer_pos
    ray = ray / np.linalg.norm(ray)
    beta = math.atan2(ray[2], ray[1])
    c, s = math.cos(-beta), math.sin(-beta)
    ray_xy = np.array([ray[0], c * ray[1] - s * ray[2], s * ray[1] + c * ray[2]])
    assert abs(ray_xy[2]) < 1e-9

    r_obs = np.linalg.norm(observer_pos)
    th_obs = math.acos(observer_pos[2] / r_obs)
    ph_obs = math.atan2(observer_pos[1], observer_pos[0])

    h_phi = math.atan2(ray_xy[1], ray_xy[0])
    alpha = math.pi - h_phi

    f = math.sqrt(1.0 - 2.0 * mass_bh / r_obs)
    n_rhat = -math.cos(alpha)
    n_phhat = math.sin(alpha)
    p_r, p_th, p_ph = n_rhat * f, 0.0, n_phhat * r_obs

    ff = 1.0 - 2.0 * mass_bh / r_obs
    gtt = -1.0 / ff
    C = ff * p_r**2 + p_th**2 / r_obs**2 + p_ph**2 / (r_obs**2 * math.sin(th_obs) ** 2)
    p_t = math.sqrt(-4.0 * gtt * C) / (2.0 * (-gtt))

    q0 = np.array([0.0, r_obs, th_obs, ph_obs])
    p0 = np.array([p_t, p_r, p_th, p_ph])
    alpha0 = math.acos(-p_r / f)
    h_th = math.acos(ray[2])
    h_ph = math.atan2(ray[1], ray[0])
    return q0, p0, alpha0, (1.0, h_th, h_ph), beta


def test_camera_matches_scalar_model():
    obs = np.array([30.0, 0.0, 0.0])
    h = w = 7
    fov = np.radians(80.0)
    q0, p0, a0, hd, beta = camera_rays(obs, fov, h, w, dtype=jnp.float64)
    pix = np.asarray(pixel_grid(obs, fov, h, w, dtype=jnp.float64))
    q0, p0, a0 = np.asarray(q0), np.asarray(p0), np.asarray(a0)
    hd, beta = np.asarray(hd), np.asarray(beta)
    for i in range(h):
        for j in range(w):
            sq, sp, sa, sh, sb = scalar_initial_conditions(obs, pix[i, j])
            np.testing.assert_allclose(q0[i, j], sq, atol=1e-10)
            np.testing.assert_allclose(p0[i, j], sp, atol=1e-10)
            np.testing.assert_allclose(a0[i, j], sa, atol=1e-10)
            np.testing.assert_allclose(hd[i, j], sh, atol=1e-10)
            np.testing.assert_allclose(beta[i, j], sb, atol=1e-10)


def test_null_condition_satisfied():
    obs = np.array([25.0, 0.0, 0.0])
    q0, p0, *_ = camera_rays(obs, np.radians(70.0), 9, 9, dtype=jnp.float64)
    r = np.asarray(q0[..., 1])
    th = np.asarray(q0[..., 2])
    p = np.asarray(p0)
    f = 1.0 - 2.0 / r
    null = (-1.0 / f) * p[..., 0] ** 2 + f * p[..., 1] ** 2 \
        + p[..., 2] ** 2 / r**2 + p[..., 3] ** 2 / (r**2 * np.sin(th) ** 2)
    np.testing.assert_allclose(null, 0.0, atol=1e-10)


def test_pixel_grid_geometry():
    """Plane center on -x side, extents match 2*d*tan(fov/2)
    (raytracing.py:77-88)."""
    obs = np.array([30.0, 0.0, 0.0])
    fov = np.radians(90.0)
    pix = np.asarray(pixel_grid(obs, fov, 4, 4, dtype=jnp.float64))
    assert pix.shape == (4, 4, 3)
    np.testing.assert_allclose(pix[..., 0], 24.0)  # 30 - 0.2*30
    width = 2 * 6.0 * np.tan(fov / 2)
    # pixel centers: first at (0.5/4 - 0.5)*width
    np.testing.assert_allclose(pix[0, 0, 1], (0.5 / 4 - 0.5) * width)
    np.testing.assert_allclose(pix[0, 0, 2], (0.5 / 4 - 0.5) * width)
    np.testing.assert_allclose(pix[3, 3, 1], (3.5 / 4 - 0.5) * width)
