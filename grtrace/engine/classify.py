"""Ray classification + RGB compositing as device-side masks and gathers.

Vectorized re-derivation of the reference's O(H*W) host classification loop
(reference: simulation/raytracing.py:164-280).  Every branch of the
reference's if/elif chain becomes a mask; the winning class is selected with
the same precedence.  The background lookup is a single `gather`.

Classification codes (also used in photon_data.csv export, io/artifacts.py):
    0 'bh'               captured: r <= 1.2*rs OR alpha0 <= bh_angle
                         (raytracing.py:205-211)
    1 'numerical error'  r >= 100 -> red pixel (raytracing.py:213-215)
    2 'escape_bg'        on the boundary sphere, inside the background patch
    3 'escape_no_patch'  on the boundary sphere, outside the patch
    4 'in_domain'        step budget exhausted inside the domain

Reference quirks reproduced deliberately (SURVEY.md section 7):
  * b_crit = 3*sqrt(3)*rs — the reference uses rs where the textbook critical
    impact parameter has M (raytracing.py:205), and halves the resulting
    angle: bh_angle = arcsin(b_crit / r_obs) / 2 (raytracing.py:207).
  * escape direction = final *position* angles on the boundary sphere
    (not momentum), un-folded by the per-ray beta rotation
    (raytracing.py:181-194).
  * patch membership via center-distance with wrapped delta-phi
    (raytracing.py:219-232), unlike the flat renderer's interval test.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..physics.coords import cartesian_to_spherical, rotate_x, spherical_to_cartesian

CLS_BH = 0
CLS_NUMERICAL = 1
CLS_ESCAPE_BG = 2
CLS_ESCAPE_NO_PATCH = 3
CLS_IN_DOMAIN = 4

COLLISION_NAMES = ("bh", "numerical error", "escape_bg", "escape_no_patch",
                   "in_domain", "disk")  # code 5 = engine.disk.CLS_DISK


def unfold_hit(final_q, beta):
    """Rotate final positions back by +beta about +x (raytracing.py:186-194).

    final_q: (..., 4) -> (r, theta, phi) after un-folding.
    """
    r = final_q[..., 1]
    x, y, z = spherical_to_cartesian(r, final_q[..., 2], final_q[..., 3])
    x, y, z = rotate_x(x, y, z, beta)
    _, th, ph = cartesian_to_spherical(x, y, z)
    return r, th, ph


def classify_rays(final_q, alpha0, beta, *, rs, r_obs_x, boundary_radius,
                  patch_center_theta, patch_center_phi,
                  patch_size_theta, patch_size_phi,
                  flip_theta=False, flip_phi=False, has_background=True):
    """Return (cls, th_hit, ph_hit, patch_u01, patch_v01).

    cls is the int class per ray; (th_hit, ph_hit) are the reported hit angles
    after the reference's mod-2pi/flip massaging (these exact values go into
    photon_data.csv, raytracing.py:275-280); patch_u01/patch_v01 are
    continuous texture coordinates in [0, 1] for escape_bg rays (undefined
    elsewhere), resolution-independent so any texture size can sample them.
    """
    r_bh, th_hit, ph_hit = unfold_hit(final_q, beta)

    theta0 = patch_center_theta - patch_size_theta / 2
    theta1 = patch_center_theta + patch_size_theta / 2
    phi0 = patch_center_phi - patch_size_phi / 2
    phi_span = patch_size_phi  # "method b" — no modulo (raytracing.py:174)

    two_pi = 2.0 * jnp.pi
    # raytracing.py:219-220 — theta already in [0, pi] so the mod is a no-op,
    # phi lands in [0, 2pi).
    th_m = th_hit % two_pi
    ph_m = ph_hit % two_pi

    dtheta = jnp.abs(th_m - patch_center_theta)
    ph_f = jnp.where(flip_phi, -ph_m, ph_m)  # raytracing.py:227
    phi_rel = (ph_f - phi0) % two_pi
    dphi = jnp.abs((ph_f - patch_center_phi + jnp.pi) % two_pi - jnp.pi)
    inside_patch = (dtheta <= patch_size_theta / 2) & (dphi <= phi_span / 2)

    # Texture coordinates ("method b", raytracing.py:241-245) in [0, 1].
    theta_map = jnp.where(flip_theta, jnp.pi - th_m, th_m)
    u01 = (theta_map - theta0) / (theta1 - theta0)
    v01 = phi_rel / phi_span

    # --- precedence chain (raytracing.py:210-272) ---
    b_crit = 3.0 * jnp.sqrt(3.0) * rs
    bh_angle = jnp.arcsin(b_crit / r_obs_x) / 2.0
    is_bh = (r_bh <= rs * 1.2) | (alpha0 <= bh_angle)
    is_numerical = r_bh >= 100.0
    is_boundary = r_bh >= boundary_radius

    cls = jnp.full(r_bh.shape, CLS_IN_DOMAIN, dtype=jnp.int32)
    if has_background:
        cls = jnp.where(is_boundary,
                        jnp.where(inside_patch, CLS_ESCAPE_BG,
                                  CLS_ESCAPE_NO_PATCH), cls)
    else:
        cls = jnp.where(is_boundary, CLS_ESCAPE_NO_PATCH, cls)
    cls = jnp.where(is_numerical, CLS_NUMERICAL, cls)
    cls = jnp.where(is_bh, CLS_BH, cls)

    # photon_data.csv parity: the reference mutates (th_hit, ph_hit) with the
    # mod-2pi/flip massaging ONLY inside the boundary-with-background branch
    # (raytracing.py:219-227); other classes record the raw unfolded angles.
    reaches_patch_branch = (~is_bh) & (~is_numerical) & is_boundary
    ph_csv = jnp.where(reaches_patch_branch & bool(has_background), ph_f, ph_hit)

    return cls, th_m, ph_csv, u01, v01


def composite(cls, u01, v01, bg_array):
    """Class + texture coords -> (..., 3) uint8 RGB.

    bg_array: (th, tw, 3) uint8 device array (the reference resizes the
    texture to the *output* resolution, raytracing.py:36 — the pipeline keeps
    that default but any texture size works here).  Index rounding matches
    raytracing.py:241-245: int(x * (n-1) + 0.5), clipped.
    """
    th, tw = bg_array.shape[0], bg_array.shape[1]
    u = jnp.clip((u01 * (th - 1) + 0.5).astype(jnp.int32), 0, th - 1)
    v = jnp.clip((v01 * (tw - 1) + 0.5).astype(jnp.int32), 0, tw - 1)
    texel = bg_array[u, v]  # gather

    rgb = jnp.zeros(cls.shape + (3,), dtype=jnp.uint8)
    red = jnp.array([255, 0, 0], dtype=jnp.uint8)
    rgb = jnp.where((cls == CLS_NUMERICAL)[..., None], red, rgb)
    rgb = jnp.where((cls == CLS_ESCAPE_BG)[..., None], texel, rgb)
    return rgb


def summary_counts(cls):
    """Captured / in-domain / escaped / background counts — the reference's
    cheapest cross-implementation invariants (main.py:147-155)."""
    return {
        "captured": jnp.sum(cls == CLS_BH),
        "in_domain": jnp.sum(cls == CLS_IN_DOMAIN),
        "escaped": jnp.sum((cls == CLS_ESCAPE_NO_PATCH) | (cls == CLS_ESCAPE_BG)),
        "background": jnp.sum(cls == CLS_ESCAPE_BG),
        "numerical_error": jnp.sum(cls == CLS_NUMERICAL),
    }
