"""Flat-space renderer vs a scalar transcription of the reference CPU loop
(simulation/background.py:99-132)."""
import math

import jax.numpy as jnp
import numpy as np

from grtrace.engine.flat import flat_ray_dirs, flat_raytrace, flat_trajectories


def scalar_flat(obs, ray, boundary, patch, bg, flip_theta, flip_phi):
    pc_th, pc_ph, ps_th, ps_ph = patch
    theta0, theta1 = pc_th - ps_th / 2, pc_th + ps_th / 2
    phi0, phi1 = pc_ph - ps_ph / 2, pc_ph + ps_ph / 2
    phi_span = (phi1 - phi0) % (2 * math.pi) or 2 * math.pi
    h, w = bg.shape[:2]

    a = ray @ ray
    b = 2 * obs @ ray
    c = obs @ obs - boundary**2
    disc = b * b - 4 * a * c
    if disc < 0:
        return (0, 0, 0)
    t = (-b + math.sqrt(disc)) / (2 * a)
    hit = obs + t * ray
    r = np.linalg.norm(hit)
    theta = math.acos(hit[2] / r)
    phi = math.atan2(hit[1], hit[0])

    def in_phi(p):
        p, p0, p1 = p % (2 * math.pi), phi0 % (2 * math.pi), phi1 % (2 * math.pi)
        return (p0 <= p <= p1) if p0 <= p1 else (p >= p0 or p <= p1)

    if theta0 <= theta <= theta1 and in_phi(phi):
        theta_map = (math.pi - theta) if flip_theta else theta
        phi_map = -phi if flip_phi else phi
        u = int((theta_map - theta0) / (theta1 - theta0) * (h - 1))
        v = int(((phi_map - phi0) % (2 * math.pi)) / phi_span * (w - 1))
        u = min(max(u, 0), h - 1)
        v = min(max(v, 0), w - 1)
        return tuple(bg[u, v])
    return (0, 0, 0)


def test_flat_matches_scalar_model():
    obs = np.array([30.0, 0.0, 0.0])
    h = w = 12
    fov = np.radians(100.0)
    rng = np.random.default_rng(5)
    bg = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    patch = (np.pi / 2, np.pi, np.deg2rad(120), np.deg2rad(200))
    dirs = np.asarray(flat_ray_dirs(obs, fov, h, w, dtype=jnp.float64))
    for flips in ((False, False), (True, True)):
        rgb, hit = flat_raytrace(
            obs, jnp.asarray(dirs), 31.0, patch[0], patch[1], patch[2],
            patch[3], jnp.asarray(bg), flip_theta=flips[0], flip_phi=flips[1])
        rgb = np.asarray(rgb)
        for i in range(h):
            for j in range(w):
                expected = scalar_flat(obs, dirs[i, j], 31.0, patch, bg,
                                       *flips)
                assert tuple(rgb[i, j]) == expected, (i, j)


def test_flat_default_patch_center_opposite_observer():
    """With the default patch centered opposite the observer (background.py:
    54-58), the central pixel must see the texture."""
    obs = np.array([30.0, 0.0, 0.0])
    h = w = 9
    bg = np.full((h, w, 3), 200, dtype=np.uint8)
    dirs = flat_ray_dirs(obs, np.radians(60.0), h, w, dtype=jnp.float64)
    # patch center opposite observer: theta = pi/2, phi = pi
    rgb, _ = flat_raytrace(obs, dirs, 31.0, np.pi / 2, np.pi,
                           np.deg2rad(40), np.deg2rad(40), jnp.asarray(bg))
    assert tuple(np.asarray(rgb)[h // 2, w // 2]) == (200, 200, 200)


def test_flat_trajectories_shape():
    hits = jnp.asarray(np.array([[0.0, 0.0, 31.0], [31.0, 0.0, 0.0]]))
    trajs = np.asarray(flat_trajectories(np.array([30.0, 0.0, 0.0]), hits,
                                         n_points=100))
    assert trajs.shape == (2, 100, 3)
    np.testing.assert_allclose(trajs[:, 0],
                               [[30.0, 0.0, 0.0], [30.0, 0.0, 0.0]],
                               atol=1e-12)
    np.testing.assert_allclose(trajs[0, -1], [0.0, 0.0, 31.0], atol=1e-12)
