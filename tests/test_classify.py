"""Vectorized classification vs a scalar transcription of the reference's
host loop (simulation/raytracing.py:164-273)."""
import math

import jax.numpy as jnp
import numpy as np

from grtrace.engine import classify as C

RS = 2.0
OBS_X = 30.0
BOUNDARY = 31.0


def scalar_classify(final_q, alpha0, beta, patch, bg_shape, flip_theta,
                    flip_phi, has_bg=True):
    """Scalar model of the reference classify/composite loop."""
    pc_th, pc_ph, ps_th, ps_ph = patch
    theta0 = pc_th - ps_th / 2
    theta1 = pc_th + ps_th / 2
    phi0 = pc_ph - ps_ph / 2
    phi_span = ps_ph
    h, w = bg_shape

    r_bh, th, ph = final_q[1], final_q[2], final_q[3]
    # unfold by beta
    x = r_bh * math.sin(th) * math.cos(ph)
    y = r_bh * math.sin(th) * math.sin(ph)
    z = r_bh * math.cos(th)
    c, s = math.cos(beta), math.sin(beta)
    y, z = c * y - s * z, s * y + c * z
    rr = math.sqrt(x * x + y * y + z * z)
    th_hit = math.acos(z / rr)
    ph_hit = math.atan2(y, x)

    b_crit = 3 * math.sqrt(3) * RS
    bh_angle = math.asin(b_crit / OBS_X) / 2
    uv = None
    if r_bh <= RS * 1.2 or alpha0 <= bh_angle:
        cls = C.CLS_BH
    elif r_bh >= 100:
        cls = C.CLS_NUMERICAL
    elif r_bh >= BOUNDARY:
        if has_bg:
            th_hit = th_hit % (2 * math.pi)
            ph_hit = ph_hit % (2 * math.pi)
            dtheta = abs(th_hit - pc_th)
            if flip_phi:
                ph_hit = -ph_hit
            phi_rel = (ph_hit - phi0) % (2 * math.pi)
            dphi = abs((ph_hit - pc_ph + math.pi) % (2 * math.pi) - math.pi)
            if dtheta <= ps_th / 2 and dphi <= phi_span / 2:
                theta_map = (math.pi - th_hit) if flip_theta else th_hit
                u = int((theta_map - theta0) / (theta1 - theta0) * (h - 1) + 0.5)
                v = int(phi_rel / phi_span * (w - 1) + 0.5)
                u = min(max(u, 0), h - 1)
                v = min(max(v, 0), w - 1)
                cls = C.CLS_ESCAPE_BG
                uv = (u, v)
            else:
                cls = C.CLS_ESCAPE_NO_PATCH
        else:
            cls = C.CLS_ESCAPE_NO_PATCH
    else:
        cls = C.CLS_IN_DOMAIN
    return cls, th_hit, ph_hit, uv


def _synthetic_finals(n=400, seed=7):
    rng = np.random.default_rng(seed)
    fq = np.zeros((n, 4))
    # spread radii across every class boundary
    fq[:, 1] = rng.choice(
        [1.8, 2.3, 5.0, 15.0, 31.5, 32.0, 150.0], size=n) * rng.uniform(
        0.98, 1.02, size=n)
    fq[:, 2] = rng.uniform(0.05, np.pi - 0.05, n)
    fq[:, 3] = rng.uniform(-np.pi, np.pi, n)
    alpha0 = rng.uniform(0.0, 1.2, n)
    beta = rng.uniform(-np.pi, np.pi, n)
    return fq, alpha0, beta


def test_classify_matches_scalar_model():
    fq, alpha0, beta = _synthetic_finals()
    patch = (np.pi / 2, np.pi, np.deg2rad(170), np.deg2rad(300))
    bg = np.zeros((64, 64, 3), dtype=np.uint8)
    for flip_theta in (False, True):
        for flip_phi in (False, True):
            cls, th, ph, u01, v01 = C.classify_rays(
                jnp.asarray(fq), jnp.asarray(alpha0), jnp.asarray(beta),
                rs=RS, r_obs_x=OBS_X, boundary_radius=BOUNDARY,
                patch_center_theta=patch[0], patch_center_phi=patch[1],
                patch_size_theta=patch[2], patch_size_phi=patch[3],
                flip_theta=flip_theta, flip_phi=flip_phi)
            cls = np.asarray(cls)
            u = np.clip((np.asarray(u01) * 63 + 0.5).astype(int), 0, 63)
            v = np.clip((np.asarray(v01) * 63 + 0.5).astype(int), 0, 63)
            for i in range(fq.shape[0]):
                scls, sth, sph, suv = scalar_classify(
                    fq[i], alpha0[i], beta[i], patch, (64, 64),
                    flip_theta, flip_phi)
                assert cls[i] == scls, (i, cls[i], scls)
                if suv is not None:
                    assert (u[i], v[i]) == suv, (i, (u[i], v[i]), suv)
                np.testing.assert_allclose(float(np.asarray(th)[i]), sth,
                                           atol=1e-10)
                np.testing.assert_allclose(float(np.asarray(ph)[i]), sph,
                                           atol=1e-10)


def test_composite_colors():
    cls = jnp.asarray([C.CLS_BH, C.CLS_NUMERICAL, C.CLS_ESCAPE_BG,
                       C.CLS_ESCAPE_NO_PATCH, C.CLS_IN_DOMAIN])
    u01 = jnp.zeros(5)
    v01 = jnp.zeros(5)
    bg = jnp.full((4, 4, 3), 77, dtype=jnp.uint8)
    rgb = np.asarray(C.composite(cls, u01, v01, bg))
    np.testing.assert_array_equal(rgb[0], [0, 0, 0])
    np.testing.assert_array_equal(rgb[1], [255, 0, 0])
    np.testing.assert_array_equal(rgb[2], [77, 77, 77])
    np.testing.assert_array_equal(rgb[3], [0, 0, 0])
    np.testing.assert_array_equal(rgb[4], [0, 0, 0])


def test_summary_counts():
    cls = jnp.asarray([0, 0, 2, 3, 4, 1, 2])
    counts = {k: int(v) for k, v in C.summary_counts(cls).items()}
    assert counts == {"captured": 2, "in_domain": 1, "escaped": 3,
                      "background": 2, "numerical_error": 1}
