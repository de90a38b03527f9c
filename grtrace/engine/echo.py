"""Lamp-post reverberation mapping: X-ray echo transfer functions.

The standard model for X-ray reverberation in AGN / X-ray binaries: a
point "corona" at height h on the spin axis flares; the flare's photons
rain onto the disk (GR-bent, Shapiro-delayed), the disk reprocesses them
into fluorescence (Fe K-alpha), and the observer sees the direct flare
followed by its energy-shifted, lensed, delayed echo.  The observable is
the 2D transfer function Psi(tau, g) — response vs (lag, line shift) —
whose marginals are the lag profile and the time-integrated line.

Two geodesic legs, both from existing machinery:

  * SOURCE leg (this module): a 1D fan from the lamp post.  The lamp
    sits on the axis, so the illumination is axisymmetric and ONE
    meridional fan parametrized by the rest-frame polar emission angle
    psi resolves it — the fan rides engine/disk.integrate_batch_disk
    (first-crossing capture over the whole plane) with initial
    conditions from the static-observer tetrad
    (physics/camera.boosted_ics_from_pixels, omega_cam = 0): the
    recorded alpha0 IS the rest-frame angle and the momentum is
    normalized to unit lamp-frame frequency, so the received disk-frame
    frequency is the lamp->disk shift g_sd with no further
    normalization.  Conserved L_z = 0 exactly (launched on the axis),
    so g_sd = |u_disk . p| with the Keplerian receiver — pure Killing
    algebra at the crossing.
  * OBSERVER leg: any disk render (engine/disk.py) already carries
    per-pixel (t_obs, g_obs, r_em) — the transfer function is a
    weighted 2D histogram over pixels, zero extra geodesics.

Timing convention: both legs trace PAST-directed rays from their vertex
(t decreases along the trace; see engine/hotspot.py's time-axis note);
the stationary metric makes |t| the physical light-travel coordinate
time of the corresponding future-directed photon (for the L_z = 0
source leg the t -> -t, phi -> -phi isometry gives the exact mirror).
Lags are quoted relative to the direct lamp->observer line of sight, so
tau = t_src(r_em) + t_obs(pixel) - t_direct >= 0 with equality only in
flat spacetime at the disk's inner line-of-sight edge.

Emissivity convention: isotropic emission in the lamp rest frame ->
dN ~ d(cos psi)/2; the illumination per unit PROPER disk area uses the
equatorial area measure dA = 2 pi sqrt(g_rr g_phiphi) dr (BL, theta =
pi/2), and the standard two powers of the lamp->disk shift (energy x
arrival rate): epsilon(r) ~ g_sd^2 |d cos psi / dA|.  In the Newtonian
far field this reduces to the point-source plane illumination
h / (2 pi (h^2 + r^2)^{3/2}) — pinned by test.

No reference counterpart: the reference has no emitters at all
(simulation/raytracing.py renders background lensing only).
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.spacetime import METRICS, _charge, horizon_radius, ks_radius
from .disk import STATUS_DISK, integrate_batch_disk
from .hotspot import bl_time_azimuth_offsets


def lamppost_ics(h, params, psi, dtype=jnp.float64):
    """Null ICs at the lamp post (0, 0, h) for rest-frame polar emission
    angles `psi` (radians from straight down), unit lamp-frame frequency.

    Uses the static-observer tetrad on the Cartesian Kerr-Schild chart
    (regular on the axis — the BL helpers are not), via
    physics/camera.boosted_ics_from_pixels with omega_cam = 0: "pixel"
    positions at unit offsets cos(psi) down + sin(psi) sideways give
    rest-frame direction angles of exactly psi (alpha0 == psi, asserted
    cheaply by the caller's tests).
    """
    from ..physics.camera import boosted_ics_from_pixels

    psi = jnp.asarray(psi, dtype)
    obs = jnp.array([0.0, 0.0, float(h)], dtype)
    # look-at frame at (0,0,h): axis = (0,0,-1); 'right' falls back to
    # (0,1,0) on the pole (physics/camera._lookat_frame convention)
    axis = jnp.array([0.0, 0.0, -1.0], dtype)
    side = jnp.array([0.0, 1.0, 0.0], dtype)
    pix = (obs[None, :] + jnp.cos(psi)[:, None] * axis[None, :]
           + jnp.sin(psi)[:, None] * side[None, :])
    q0, p0, alpha0 = boosted_ics_from_pixels(
        obs, pix, params=jnp.asarray(params, dtype),
        g_inv_fn=METRICS["KerrSchild"], omega_cam=jnp.zeros((), dtype))
    return q0, p0, alpha0


def trace_lamppost(h, params, *, n_rays=512, psi_max=None, steps=40_000,
                   delta=0.05, r_max=None, order=2, prograde=True,
                   dtype=jnp.float64):
    """Trace the lamp-post fan; return per-ray crossing data (host numpy).

    Returns dict of (n_rays,) arrays: psi, hit (bool), r (BL crossing
    radius), t_src (positive BL light-travel time lamp -> crossing),
    energy (|E| = |-p_t|), g_sd (lamp -> Keplerian-disk shift),
    g_sd_static (lamp -> static-receiver shift; the exact
    sqrt(f(h)/f(r)) of Schwarzschild — test anchor), plus scalars.
    """
    from ..physics.orbits import circular_u_t, static_u_t

    params = jnp.asarray(params, dtype)
    r_plus = float(horizon_radius("Kerr", params[0], params[1],
                                  _charge(params)))
    if r_max is None:
        r_max = max(4.0 * float(h), 60.0)
    if psi_max is None:
        psi_max = np.pi * 0.75
    # open interval: psi = 0 is the exact axis ray (crosses at r = 0)
    psi = jnp.linspace(1e-4, float(psi_max), n_rays, dtype=dtype)
    q0, p0, alpha0 = lamppost_ics(h, params, psi, dtype)

    # first plane crossing ANYWHERE outside the horizon: annulus spans
    # [just above r_plus, just inside the escape sphere]
    r_in = 1.0001 * r_plus
    r_out = 0.999 * r_max
    fq, fp, status, ns, hit_q, hit_p = integrate_batch_disk(
        q0, p0, steps, jnp.asarray(delta, dtype), params,
        jnp.asarray(r_max, dtype), 0.0, jnp.asarray(r_in, dtype),
        jnp.asarray(r_out, dtype), order=order)

    hit = np.asarray(status) == STATUS_DISK
    r_bl = ks_radius(hit_q[:, 1], hit_q[:, 2], hit_q[:, 3], params[1])
    t_off = jax.vmap(lambda r: bl_time_azimuth_offsets(r, params)[0])(r_bl)
    t_src = jnp.abs(hit_q[:, 0] - t_off)

    energy = jnp.abs(hit_p[:, 0])           # |E| = |-p_t|, conserved
    # L_z = 0 exactly (axis launch): receiver frequency is u^t |E| terms
    u_t_kep, omega_k = jax.vmap(
        lambda r: circular_u_t(r, params, prograde))(r_bl)
    x, y = hit_q[:, 1], hit_q[:, 2]
    l_z = x * hit_p[:, 2] - y * hit_p[:, 1]
    g_sd = jnp.abs(u_t_kep * (hit_p[:, 0] + omega_k * l_z))
    u_t_st = jax.vmap(lambda r: static_u_t(r, params))(r_bl)
    g_sd_static = u_t_st * energy

    return {
        "psi": np.asarray(psi),
        "alpha0": np.asarray(alpha0),
        "hit": hit,
        "r": np.where(hit, np.asarray(r_bl), np.nan),
        "t_src": np.where(hit, np.asarray(t_src), np.nan),
        "energy": np.asarray(energy),
        "l_z": np.asarray(l_z),
        "g_sd": np.where(hit, np.asarray(g_sd), np.nan),
        "g_sd_static": np.where(hit, np.asarray(g_sd_static), np.nan),
        "h": float(h),
        "r_plus": r_plus,
        "params": np.asarray(params),
    }


def emissivity_profile(fan, params, r_lo=None, r_hi=None):
    """GR lamp-post emissivity epsilon(r) ~ g_sd^2 |d cos psi / dA| on
    the primary (monotone-in-psi) illumination branch of the fan.

    dA is the PROPER equatorial annulus area 2 pi sqrt(g_rr g_phiphi) dr
    (Boyer-Lindquist, theta = pi/2).  Host-side numpy (a table producer,
    not a hot loop).  Returns (r, eps, t_src, g_sd) sorted by r.
    """
    from ..physics.orbits import equatorial_g_cov

    hit = fan["hit"]
    r = fan["r"][hit]
    psi = fan["psi"][hit]
    g_sd = fan["g_sd"][hit]
    t_src = fan["t_src"][hit]
    if r.size < 8:
        raise ValueError("fan too sparse: fewer than 8 disk crossings")
    # primary branch: the contiguous run where r increases with psi
    # (wound higher-order illumination is e^{-pi}-suppressed; see
    # engine/subring.py for where it IS resolved)
    dr = np.diff(r)
    mono = np.concatenate([[True], dr > 0])
    # longest contiguous True run
    best_s = best_e = 0
    s = 0
    for i in range(1, len(mono) + 1):
        if i == len(mono) or not mono[i]:
            if i - s > best_e - best_s:
                best_s, best_e = s, i
            s = i + 1
    sel = slice(best_s, best_e)
    r, psi, g_sd, t_src = r[sel], psi[sel], g_sd[sel], t_src[sel]
    if r_lo is not None:
        keep = (r >= r_lo) & (r <= (r_hi or np.inf))
        r, psi, g_sd, t_src = r[keep], psi[keep], g_sd[keep], t_src[keep]

    dcos = np.gradient(np.cos(psi))
    drad = np.gradient(r)
    g_cov = jax.vmap(lambda rr: equatorial_g_cov(
        jnp.asarray(rr), jnp.asarray(fan["params"])))(jnp.asarray(r))
    g_rr = np.asarray(g_cov[:, 1, 1])
    g_ph = np.asarray(g_cov[:, 3, 3])
    area = 2.0 * np.pi * np.sqrt(np.maximum(g_rr * g_ph, 0.0)) * drad
    eps = g_sd ** 2 * np.abs(dcos) / np.maximum(np.abs(area), 1e-300)
    order_idx = np.argsort(r)
    return (r[order_idx], eps[order_idx], t_src[order_idx],
            g_sd[order_idx])


def transfer_function(disk_result, fan, *, n_tau=96, n_g=64, tau_max=None,
                      weight_power=4.0, t_direct=0.0):
    """2D reverberation transfer function Psi(tau, g_obs) from a disk
    render + a lamp-post fan.

    Per disk pixel: lag tau = t_src(r_em) + t_obs - t_direct (t_src by
    interpolation of the fan's primary branch; t_direct = the flat
    lamp->camera distance — a pure zero-point), line shift g_obs (the
    render's exact per-pixel redshift), weight epsilon(r_em) *
    g_obs^weight_power (Liouville beaming of the reflected intensity; 4
    = bolometric, 3 = photon counts).

    Accepts a render_disk RenderResult or a raw dict with hit_q /
    status / redshift.  Returns dict with the histogram, axes, the lag
    profile (Psi summed over g), and scalar lag metrics.
    """
    get = (disk_result.device if hasattr(disk_result, "device")
           else disk_result.__getitem__)
    hit_q = np.asarray(get("hit_q"), dtype=np.float64)
    status = np.asarray(get("status"))
    g_obs = np.asarray(get("redshift"), dtype=np.float64)
    params = fan["params"]

    disk_mask = status == STATUS_DISK
    x, y, z = hit_q[..., 1], hit_q[..., 2], hit_q[..., 3]
    r_em = np.asarray(ks_radius(jnp.asarray(x), jnp.asarray(y),
                                jnp.asarray(z), jnp.asarray(params[1])))
    t_off = np.asarray(jax.vmap(
        lambda r: bl_time_azimuth_offsets(r, jnp.asarray(params))[0]
    )(jnp.asarray(r_em.reshape(-1)))).reshape(r_em.shape)
    t_obs = np.abs(hit_q[..., 0] - t_off)

    r_tab, eps_tab, t_tab, _ = emissivity_profile(fan, params)
    in_range = disk_mask & (r_em >= r_tab[0]) & (r_em <= r_tab[-1])
    t_src = np.interp(r_em, r_tab, t_tab)
    eps = np.interp(r_em, r_tab, eps_tab)

    # zero-point: the direct lamp -> camera time (the echo lag is quoted
    # relative to the continuum flash; callers pass the flat distance
    # |camera - lamp| or 0 to keep absolute light-travel times)
    tau = t_src + t_obs - float(t_direct)

    w = eps * np.power(np.maximum(g_obs, 0.0), weight_power)
    tau_v = tau[in_range]
    g_v = g_obs[in_range]
    w_v = w[in_range]
    if tau_max is None:
        tau_max = float(np.percentile(tau_v, 99.5)) if tau_v.size else 1.0
    hist, tau_edges, g_edges = np.histogram2d(
        tau_v, g_v, bins=[n_tau, n_g],
        range=[[float(tau_v.min()) if tau_v.size else 0.0, tau_max],
               [float(g_v.min()) if g_v.size else 0.0,
                float(g_v.max()) if g_v.size else 1.0]],
        weights=w_v)
    lag_profile = hist.sum(axis=1)
    tau_centers = 0.5 * (tau_edges[:-1] + tau_edges[1:])
    g_centers = 0.5 * (g_edges[:-1] + g_edges[1:])
    total = float(w_v.sum())
    return {
        "psi_tau_g": hist,
        "tau": tau_centers,
        "g": g_centers,
        "lag_profile": lag_profile,
        "tau_peak": float(tau_centers[np.argmax(lag_profile)])
        if lag_profile.size else float("nan"),
        "tau_centroid": float((tau_v * w_v).sum() / total)
        if total > 0 else float("nan"),
        "response_total": total,
        "pixels": int(in_range.sum()),
    }


def save_echo_artifacts(fan, tf, out_dir, params):
    """Write the echo products: emissivity table/plot, transfer-function
    heatmap, lag profile, JSON summary.  Returns (paths, summary)."""
    os.makedirs(out_dir, exist_ok=True)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    r, eps, t_src, g_sd = emissivity_profile(fan, params)
    written = []

    p = os.path.join(out_dir, "echo_emissivity.csv")
    with open(p, "w") as f:
        f.write("r,emissivity,t_src_M,g_sd\n")
        for row in zip(r, eps, t_src, g_sd):
            f.write(",".join(f"{v:.9g}" for v in row) + "\n")
    written.append(p)

    fig, ax = plt.subplots(figsize=(5.5, 4))
    ax.loglog(r, eps / eps.max(), lw=1.5, label="GR lamp-post")
    h = fan["h"]
    newt = h / (2.0 * np.pi * (h * h + r * r) ** 1.5)
    ax.loglog(r, newt / newt.max(), "--", lw=1.0,
              label=r"Newtonian $h/2\pi(h^2+r^2)^{3/2}$")
    ax.set_xlabel("r [M]")
    ax.set_ylabel("emissivity (normalized)")
    ax.set_title(f"lamp-post emissivity, h = {h:g} M")
    ax.legend()
    p = os.path.join(out_dir, "echo_emissivity.png")
    fig.savefig(p, dpi=110, bbox_inches="tight")
    plt.close(fig)
    written.append(p)

    fig, ax = plt.subplots(figsize=(6, 4.5))
    im = ax.pcolormesh(tf["g"], tf["tau"],
                       tf["psi_tau_g"] / max(tf["psi_tau_g"].max(), 1e-300),
                       cmap="inferno", shading="auto")
    ax.set_xlabel("line shift g = E_obs / E_rest")
    ax.set_ylabel("lag tau [M]")
    ax.set_title("reverberation transfer function Psi(tau, g)")
    fig.colorbar(im, ax=ax, fraction=0.046)
    p = os.path.join(out_dir, "echo_transfer.png")
    fig.savefig(p, dpi=110, bbox_inches="tight")
    plt.close(fig)
    written.append(p)

    p = os.path.join(out_dir, "echo_lag_profile.csv")
    with open(p, "w") as f:
        f.write("tau_M,response\n")
        for t, v in zip(tf["tau"], tf["lag_profile"]):
            f.write(f"{t:.9g},{v:.9g}\n")
    written.append(p)

    summary = {
        "h": fan["h"],
        "tau_peak_M": tf["tau_peak"],
        "tau_centroid_M": tf["tau_centroid"],
        "response_total": tf["response_total"],
        "pixels": tf["pixels"],
        "fan_hits": int(fan["hit"].sum()),
    }
    p = os.path.join(out_dir, "echo_summary.json")
    with open(p, "w") as f:
        json.dump(summary, f, indent=2)
    written.append(p)
    return written, summary
