"""Thin accretion disks around Kerr-de Sitter black holes.

Closes the family matrix's last cell: the equatorial-crossing capture of
engine/disk.py (Cartesian Kerr-Schild, z sign change) restated on the
BL-like Carter chart — the disk plane is theta = pi/2, so the crossing
monitor is a cos(theta) sign change with in-step interpolation, riding
the same masked `lax.while_loop` + guard structure as
integrate_batch_generic.  Shading reuses the shared blackbody/tone
pipeline with the Kerr-de Sitter circular-orbit algebra
(physics/kerr_de_sitter.py): E = -p_t and L_z = p_phi are Killing
charges read at the crossing (conserved to the FANTASY copy-split), the
emitter is the KdS Keplerian circle, the receiver the static observer
u^t = 1/sqrt(-g_tt) at the camera's BL position.

Physics the cosmological constant adds (validated in
tests/test_kerr_de_sitter.py):
  * the disk must live INSIDE the Lambda tide's outermost stable
    circular orbit — `kds_disk_bounds` enforces r_out < OSCO, the same
    constraint the Kottler planar-fold disk carries;
  * Lambda = 0 reduces to the Kerr disk: cross-chart parity against the
    Kerr-Schild pipeline at the distribution level (the two cameras
    differ by the documented O(2M/r_obs) pixel gauge,
    physics/camera.py:386-400).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.hamiltonian import substep_schedule
from ..physics.kerr_de_sitter import (circular_u_t_kds, isco_kds,
                                      kds_functions, osco_kds)
from ..physics.spacetime import METRICS, make_step
from .disk import CLS_DISK, STATUS_DISK, _temp_profile, blackbody_rgb
from .integrate_generic import _domain_tools


@partial(jax.jit, static_argnames=("steps", "order"))
def integrate_batch_disk_kds(q0s, p0s, steps, delta, params, r_max, omega,
                             r_in, r_out, order=2):
    """BL-chart batch integration with first theta = pi/2 crossing
    capture inside [r_in, r_out].  Same early-exit/guard semantics as
    integrate_batch_generic on the 'KerrDS' chart; the exact
    conserved-quantity rescue settles guard-parked non-disk rays.

    Returns (final_q, final_p, status, n_steps, hit_q, hit_p)."""
    metric = "KerrDS"
    g_inv_fn = METRICS[metric]
    step1 = make_step(g_inv_fn)

    dtype = q0s.dtype
    delta = jnp.asarray(delta, dtype)
    params = jnp.asarray(params, dtype)
    r_max = jnp.asarray(r_max, dtype)
    r_in = jnp.asarray(r_in, dtype)
    r_out = jnp.asarray(r_out, dtype)
    subs = substep_schedule(delta, jnp.asarray(omega, dtype), order)

    vstep = jax.vmap(lambda q1, p1, q2, p2: step1(q1, p1, q2, p2, params,
                                                  subs))
    cap_radius, esc_radius, active_mask, guard, r_cap = _domain_tools(
        metric, params, delta, r_max, dtype, g_inv_fn)

    n = q0s.shape[0]
    n_steps0 = jnp.zeros(n, dtype=jnp.int32)
    hit0 = jnp.zeros(n, dtype=bool)
    carry0 = (q0s, p0s, q0s, p0s, n_steps0, jnp.int32(0), hit0, q0s, p0s)

    def cond(c):
        q1, _, _, _, _, k, hit, _, _ = c
        return (k < steps) & jnp.any(active_mask(q1) & ~hit)

    def body(c):
        q1, p1, q2, p2, ns, k, hit, hq, hp = c
        act = active_mask(q1) & ~hit
        nq1, np1, nq2, np2 = vstep(q1, p1, q2, p2)
        bad, nq1 = guard(q1, p1, nq1, np1)
        np1 = jnp.where(bad[:, None], p1, np1)
        nq2 = jnp.where(bad[:, None], q2, nq2)
        np2 = jnp.where(bad[:, None], p2, np2)

        # --- equatorial crossing: cos(theta) sign change ---
        c0 = jnp.cos(q1[:, 2])
        c1_ = jnp.cos(nq1[:, 2])
        crossed = (c0 * c1_) < 0.0
        t = c0 / (c0 - c1_)
        t = jnp.where(crossed, t, 0.0)
        cq = q1 + t[:, None] * (nq1 - q1)
        cp = p2 + t[:, None] * (np2 - p2)
        r_hit = cq[:, 1]
        new_hit = (act & ~bad & crossed
                   & (r_hit >= r_in) & (r_hit <= r_out))
        hq = jnp.where(new_hit[:, None], cq, hq)
        hp = jnp.where(new_hit[:, None], cp, hp)
        hit = hit | new_hit

        ns_new = ns + act.astype(jnp.int32)
        ns_new = jnp.where(act & bad, -ns_new, ns_new)

        def masked(new, old):
            return jnp.where(act[:, None], new, old)
        return (masked(nq1, q1), masked(np1, p1), masked(nq2, q2),
                masked(np2, p2), ns_new, k + 1, hit, hq, hp)

    q1, p1, q2, _, ns, _, hit, hq, hp = jax.lax.while_loop(cond, body,
                                                           carry0)

    # exact rescue of guard-parked non-disk rays (BL park semantics)
    from ..physics.kerr_de_sitter import kds_escape_pred
    from ..physics.spacetime import _charge
    from .integrate_ks import apply_bardeen_rescue_bl
    pred = kds_escape_pred(q0s, p0s, params)
    q1, p1, status, n_steps = apply_bardeen_rescue_bl(
        q1, p1, ns, q2, q0s, p0s, params[0], params[1],
        _charge(params), r_cap, r_max, pred=pred)
    status = jnp.where(hit, STATUS_DISK, status)
    return q1, p1, status, n_steps, hq, hp


def kds_static_u_t(r, th, params):
    """u^t of the static observer at BL (r, theta):
    1/sqrt(-g_tt) with g_tt = (-Delta_r + Delta_th a^2 sin^2 th)/
    (chi^2 Sigma)."""
    a = params[1]
    delta_r, delta_th, chi, sigma = kds_functions(r, th, params)
    sin2 = jnp.sin(th) ** 2
    g_tt = (-delta_r + delta_th * a * a * sin2) / (chi * chi * sigma)
    return 1.0 / jnp.sqrt(-g_tt)


def redshift_factor_kds(energy, l_z, r_em, r_obs, params, prograde=True,
                        theta_obs=jnp.pi / 2):
    """g = nu_obs/nu_em: KdS Keplerian emitter at r_em, static observer
    at (r_obs, theta_obs) — the Carter-family twin of
    orbits.redshift_factor."""
    u_t_em, omega = circular_u_t_kds(r_em, params, prograde)
    u_t_obs = kds_static_u_t(r_obs, theta_obs, params)
    return (energy * u_t_obs) / (u_t_em * (energy - omega * l_z))


def shade_disk_kds(hit_q, hit_p, params, r_obs, th_obs, r_in, *,
                   prograde=True, t_peak=9000.0, exposure=2.5,
                   r_out=14.0):
    """(N, 4) BL crossings -> (g, rgb01), Shakura-Sunyaev profile (the
    Page-Thorne quadrature is available through the same autodiff layer
    but the Lambda corrections to the flux are < 1e-3 at disk radii for
    the Lambda ranges the horizon structure allows — documented scope)."""
    energy = -hit_p[:, 0]
    l_z = hit_p[:, 3]
    r_em = hit_q[:, 1]
    g = jax.vmap(lambda e, l, r: redshift_factor_kds(
        e, l, r, r_obs, params, prograde, th_obs))(energy, l_z, r_em)
    t_norm = _temp_profile(r_em, r_in)
    t_obs = g * t_norm
    intensity = exposure * t_obs ** 4
    tone = 1.0 - jnp.exp(-intensity)
    tone = tone ** (1.0 / 2.2)
    rgb = blackbody_rgb(t_obs * t_peak) * tone[:, None]
    return g, rgb


@partial(jax.jit,
         static_argnames=("height", "width", "steps", "order", "flip_theta",
                          "flip_phi", "has_background", "dtype",
                          "prograde"))
def render_pixels_disk_kds(bg_array, obs_pos, fov, mass, spin, lam,
                           boundary_radius, steps, delta, omega,
                           r_in, r_out, t_peak, exposure,
                           patch_center_theta, patch_center_phi,
                           patch_size_theta, patch_size_phi,
                           *, height, width, order=2, flip_theta=False,
                           flip_phi=False, has_background=True,
                           dtype=jnp.float32, prograde=True):
    """One compiled program: inclined look-at camera -> BL disk
    integration -> shade + classify -> RGB, for Kerr-de Sitter."""
    from ..physics.camera import pixel_grid_lookat, unfolded_ics_from_pixels
    from ..physics.coords import cartesian_to_spherical
    from ..physics.kerr_de_sitter import kds_capture_radius
    from . import classify as _classify

    g_inv_fn = METRICS["KerrDS"]
    params = jnp.stack([jnp.asarray(mass, dtype), jnp.asarray(spin, dtype),
                        jnp.asarray(lam, dtype)])
    obs_pos = jnp.asarray(obs_pos, dtype)
    r_obs = jnp.linalg.norm(obs_pos)
    th_obs = jnp.arccos(jnp.clip(obs_pos[2] / jnp.maximum(r_obs, 1e-30),
                                 -1.0, 1.0))
    pix = pixel_grid_lookat(obs_pos, fov, height, width, dtype=dtype)
    q0, p0, alpha0 = unfolded_ics_from_pixels(obs_pos, pix, params=params,
                                              g_inv_fn=g_inv_fn)
    n = height * width
    final_q, final_p, status, n_steps, hit_q, hit_p = \
        integrate_batch_disk_kds(
            q0.reshape(n, 4), p0.reshape(n, 4), steps, delta, params,
            boundary_radius, omega, r_in, r_out, order=order)

    disk_mask = status == STATUS_DISK
    g_fac, disk_rgb01 = shade_disk_kds(
        hit_q, hit_p, params, r_obs, th_obs, r_in, prograde=prograde,
        t_peak=t_peak, exposure=exposure, r_out=r_out)
    g_fac = jnp.where(disk_mask, g_fac, 0.0)

    r_plus = kds_capture_radius(params) / 1.1
    rs_classify = (1.1 / 1.2) * r_plus
    fq = final_q.reshape(height, width, 4)
    cls, th_csv, ph_csv, u01, v01 = _classify.classify_rays(
        fq, jnp.full((height, width), jnp.pi, dtype),
        jnp.zeros((height, width), dtype),
        rs=rs_classify, r_obs_x=obs_pos[0],
        boundary_radius=boundary_radius,
        patch_center_theta=patch_center_theta,
        patch_center_phi=patch_center_phi,
        patch_size_theta=patch_size_theta,
        patch_size_phi=patch_size_phi,
        flip_theta=flip_theta, flip_phi=flip_phi,
        has_background=has_background)
    image = _classify.composite(cls, u01, v01, bg_array if has_background
                                else jnp.zeros((1, 1, 3), dtype=jnp.uint8))

    disk_u8 = jnp.clip(disk_rgb01 * 255.0 + 0.5, 0.0,
                       255.0).astype(jnp.uint8).reshape(height, width, 3)
    dm2 = disk_mask.reshape(height, width)
    image = jnp.where(dm2[:, :, None], disk_u8, image)
    cls = jnp.where(dm2, CLS_DISK, cls)

    count_vec = jnp.stack([
        jnp.sum(cls == _classify.CLS_BH),
        jnp.sum(cls == _classify.CLS_IN_DOMAIN),
        jnp.sum((cls == _classify.CLS_ESCAPE_NO_PATCH)
                | (cls == _classify.CLS_ESCAPE_BG)),
        jnp.sum(cls == _classify.CLS_ESCAPE_BG),
        jnp.sum(cls == _classify.CLS_NUMERICAL),
        jnp.sum(cls == CLS_DISK),
    ])
    return {
        "image": image, "cls": cls, "final_q": fq, "final_th": th_csv,
        "final_ph": ph_csv, "q0": q0, "p0": p0, "alpha0": alpha0,
        "n_steps": n_steps.reshape(height, width),
        "status": status.reshape(height, width),
        "hit_q": hit_q.reshape(height, width, 4),
        "hit_p": hit_p.reshape(height, width, 4),
        "redshift": g_fac.reshape(height, width),
        "count_vec": count_vec,
    }


def kds_disk_bounds(mass, spin, lam, r_in, r_out, boundary_radius,
                    prograde=True):
    """Host-side edge resolution + the Lambda-tide constraint: the disk
    must live inside the outermost stable circular orbit."""
    params = jnp.array([mass, spin, lam], jnp.result_type(float))
    if r_in is None:
        r_in = float(isco_kds(params, prograde))
        if not np.isfinite(r_in):
            raise ValueError(
                f"kerr-ds at (a, Lambda) = ({spin:g}, {lam:g}) has no "
                "stable circular orbits — no ISCO to anchor the disk")
    if lam > 0.0:
        r_osco = float(osco_kds(params, prograde))
        if np.isfinite(r_osco) and r_out > r_osco:
            raise ValueError(
                f"kerr-ds disk outer edge r_out = {r_out:g} lies beyond "
                f"the outermost stable circular orbit {r_osco:.4g} "
                "(the cosmological tide forbids Keplerian emitters "
                "there) — shrink r_out or Lambda")
    if not r_in < r_out:
        raise ValueError(f"disk edges must satisfy r_in < r_out, got "
                         f"[{r_in:g}, {r_out:g}]")
    if r_out >= boundary_radius:
        raise ValueError(f"disk outer edge {r_out:g} must sit inside the "
                         f"boundary sphere {boundary_radius:g}")
    return float(r_in), float(r_out)


def render_disk_kds(scene, disk=None, *, bg_array=None, dtype=None,
                    metrics=None):
    """SceneConfig-driven Kerr-de Sitter disk render ->
    engine.render.RenderResult (scene.metric = 'kerr-ds', scene.spin,
    scene.metric_param = Lambda)."""
    from .disk import DiskConfig, disk_observer_position
    from .metrics import RenderMetrics
    from .render import RenderResult

    disk = disk or DiskConfig()
    if disk.bfield is not None:
        raise NotImplementedError(
            "polarized imaging rides the Kerr-Newman disk path")
    if disk.camera_omega is not None:
        raise NotImplementedError(
            "orbiting cameras ride the Kerr-Newman disk path")
    if disk.profile == "novikov":
        raise NotImplementedError(
            "the Novikov-Thorne profile is wired for the Kerr-Newman "
            "and static families; kerr-ds disks use Shakura-Sunyaev")

    want_metrics = metrics is not None
    if metrics is None:
        metrics = RenderMetrics()
    h, w = scene.image_size
    integ = scene.integrator
    if dtype is None:
        dtype = jnp.float64 if integ.dtype == "float64" else jnp.float32
    has_bg = bg_array is not None and disk.show_background
    bg_dev = (jnp.asarray(bg_array, dtype=jnp.uint8) if has_bg
              else jnp.zeros((1, 1, 3), dtype=jnp.uint8))

    r_in, r_out = kds_disk_bounds(
        scene.bh_mass, scene.spin, scene.metric_param, disk.r_in,
        disk.r_out, scene.boundary_radius, disk.prograde)
    obs_pos = disk_observer_position(scene, disk)

    with metrics.stage("device_pipeline"):
        out = render_pixels_disk_kds(
            bg_dev,
            jnp.asarray(obs_pos, dtype),
            jnp.asarray(scene.fov, dtype),
            jnp.asarray(scene.bh_mass, dtype),
            jnp.asarray(scene.spin, dtype),
            jnp.asarray(scene.metric_param, dtype),
            jnp.asarray(scene.boundary_radius, dtype),
            integ.steps,
            jnp.asarray(integ.delta, dtype),
            jnp.asarray(integ.omega, dtype),
            jnp.asarray(r_in, dtype),
            jnp.asarray(r_out, dtype),
            jnp.asarray(disk.t_peak, dtype),
            jnp.asarray(disk.exposure, dtype),
            jnp.asarray(scene.patch.center_theta, dtype),
            jnp.asarray(scene.patch.center_phi, dtype),
            jnp.asarray(scene.patch.size_theta, dtype),
            jnp.asarray(scene.patch.size_phi, dtype),
            height=h, width=w, order=integ.order,
            flip_theta=scene.patch.flip_theta,
            flip_phi=scene.patch.flip_phi,
            has_background=has_bg, dtype=dtype, prograde=disk.prograde)
        cv = np.asarray(out.pop("count_vec"))
    counts = {"captured": int(cv[0]), "in_domain": int(cv[1]),
              "escaped": int(cv[2]), "background": int(cv[3]),
              "numerical_error": int(cv[4]), "disk": int(cv[5])}
    metrics.rays = h * w
    if want_metrics:
        metrics.geodesic_steps = int(np.asarray(out["n_steps"],
                                                np.int64).sum())
    out["beta"] = jnp.zeros((h, w), dtype)
    out["heading"] = jnp.zeros((h, w, 3), dtype)
    return RenderResult(out, counts)
