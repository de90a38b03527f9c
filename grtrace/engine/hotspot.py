"""Orbiting hot-spot flares: time-resolved light curves from ONE geodesic pass.

An orbiting over-density ("hot spot") in the Keplerian disk flow is the
standard model for Sgr A* / GRAVITY near-infrared flares.  Rendering its
movie naively costs one full geodesic integration per frame.  This module
exploits stationarity instead: the spacetime (and the camera) are static,
so the bundle of null geodesics from the camera to the disk NEVER changes
— only the emissivity pattern painted on the disk does.  One disk render
(engine/disk.py) captures, per pixel, the equatorial crossing event
(hit_q) and the Keplerian redshift factor g; every frame of the movie is
then a cheap elementwise shading of those per-pixel invariants, batched
over frame times in a single fused XLA program.  A full light curve at
1024^2 x 64 frames costs one render plus milliseconds.

Physics of the time axis.  The camera launches PAST-directed rays
(physics/camera.py's null closure yields p_t > 0, i.e. dt/dlambda < 0 —
verified numerically in tests/test_hotspot.py): the traced worldline IS
the received photon's worldline run backwards, so a hit at coordinate
time t_hit < 0 is the physical emission event, |t_hit| the light-travel
coordinate time (geometric + Shapiro).  The disk shading never noticed
the orientation because the redshift g = E u_obs^t / (u_em^t (E - Omega
L_z)) is homogeneous of degree zero in (E, L_z) — negating the momentum
cancels.  For the hot spot the orientation matters: a photon observed at
camera time tau was emitted at  tau + t_bl(hit)  (earlier — causality),
where the blob azimuth was  phi0 + Omega_s (tau + t_bl).  The per-pixel
blob-coincidence phase is therefore

    psi = phi_bl(hit) - Omega_s * t_bl(hit),
    blob at this pixel  <=>  wrap(psi - phi0 - Omega_s * tau) ~ 0,

with Omega_s the SIGNED Keplerian angular velocity at the blob radius
(physics/orbits.keplerian_omega).  Both light-travel delays (Shapiro +
geometric — the far side lags) and lensed secondary images (the blob
passing behind the hole flares through its Einstein arcs, with their own
delays) come out for free, because each image-plane pixel carries its own
(t_bl, phi_bl, g).

Chart bookkeeping: hits are recorded on the Cartesian Kerr-Schild chart,
whose time and azimuth differ from Boyer-Lindquist by pure functions of r
(t_ks = t_bl + T(r), phit = phi_bl + Phi(r); the sign conventions are
pinned numerically in physics/polarization._ks_chart_geometry and its
tests).  The blob orbits at fixed r, so only the VARIATION of these
offsets across hit radii matters; `bl_time_azimuth_offsets` integrates
T' = (2 M r - Q^2) / Delta and Phi' = a / Delta in closed form (partial
fractions over the horizon roots) and the conversion is exact.

No reference counterpart: the reference renders one static background-
lensing view (simulation/raytracing.py); it has no disk, no emitters, no
time axis.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.orbits import keplerian_omega
from ..physics.spacetime import _charge, ks_radius
from .disk import STATUS_DISK, blackbody_rgb

# geometrized-time unit: GM_sun/c^3 in seconds — multiply coordinate
# times (in M) by mass_msun * T_SUN_S for seconds (defined with the other
# orbit-dynamics constants; re-exported here for the flare clock)
from ..physics.epicyclic import T_SUN_S  # noqa: E402,F401


@dataclasses.dataclass
class HotspotConfig:
    """Orbiting-blob geometry, photometry and movie sampling."""
    r_blob: Optional[float] = None  # orbit radius; None -> inside the annulus
    sigma: float = 0.5              # Gaussian blob radius (geometrized length)
    phi0: float = 0.0               # blob azimuth at observer time tau = 0
    t_blob: float = 12000.0         # blob color temperature (K) at g = 1
    amplitude: float = 4.0          # emissivity gain vs the disk tone map
    n_frames: int = 64              # movie frames
    n_periods: float = 1.0          # movie length in orbital periods

    def __post_init__(self):
        if self.sigma <= 0.0:
            raise ValueError(f"sigma must be > 0, got {self.sigma}")
        if self.n_frames < 2:
            raise ValueError(f"n_frames must be >= 2, got {self.n_frames}")
        if self.n_periods <= 0.0:
            raise ValueError(f"n_periods must be > 0, got {self.n_periods}")

    def orbit_radius(self, r_in, r_out):
        """Blob radius: configured, else placed well inside the annulus."""
        if self.r_blob is not None:
            return float(self.r_blob)
        return float(max(1.6 * r_in, r_in + 3.0 * self.sigma))


def bl_time_azimuth_offsets(r, params):
    """Closed-form T(r), Phi(r) with T' = (2 M r - Q^2)/Delta, Phi' = a/Delta.

    Delta = (r - r_plus)(r - r_minus); partial fractions give
    T = c_plus ln(r - r_plus) + c_minus ln(r - r_minus) with
    c_pm = +-(2 M r_pm - Q^2)/(r_plus - r_minus), and
    Phi = a/(r_plus - r_minus) ln((r - r_plus)/(r - r_minus)).
    The derivative identities are pinned by autodiff in
    tests/test_hotspot.py; the underlying chart relations (signs included)
    by the Hamiltonian-invariance test of physics/polarization.bl_from_ks.
    Schwarzschild (a = Q = 0) degenerates to T = 2M ln(r - 2M), Phi = 0.
    """
    mass, a = params[0], params[1]
    qc = _charge(params)
    disc = jnp.sqrt(jnp.maximum(mass * mass - a * a - qc * qc, 1e-30))
    r_p, r_m = mass + disc, mass - disc
    two = r_p - r_m
    c_p = (2.0 * mass * r_p - qc * qc) / two
    c_m = -(2.0 * mass * r_m - qc * qc) / two
    lp = jnp.log(jnp.maximum(r - r_p, 1e-30))
    lm = jnp.log(jnp.maximum(r - r_m, 1e-30))
    return c_p * lp + c_m * lm, (a / two) * (lp - lm)


def hotspot_statics(hit_q, status, redshift, params, omega_s):
    """Per-pixel frame-independent invariants from one disk render.

    Returns (psi, r_hit, g, valid): the blob-coincidence phase
    psi = phi_bl - Omega_s t_bl (see module docstring), the BL emission
    radius, the Keplerian redshift factor, and the disk-hit mask.
    Shapes follow hit_q's leading dims.
    """
    x, y, z = hit_q[..., 1], hit_q[..., 2], hit_q[..., 3]
    a = params[1]
    r = ks_radius(x, y, z, a)
    # KS azimuth phit from  x + i y = sin(theta) (r + i a) e^{i phit}
    # (physics/polarization._ks_chart_geometry convention)
    phit = jnp.arctan2(y * r - x * a, x * r + y * a)
    t_off, phi_off = bl_time_azimuth_offsets(r, params)
    t_bl = hit_q[..., 0] - t_off
    phi_bl = phit - phi_off
    psi = phi_bl - omega_s * t_bl
    valid = status == STATUS_DISK
    return psi, r, redshift, valid


def _wrap_pi(x):
    """Wrap to (-pi, pi]."""
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


@partial(jax.jit, static_argnames=("t_blob", "amplitude"))
def shade_hotspot_frames(image, psi, r_hit, g, valid, times, omega_s,
                         r_blob, sigma, phi0, *, t_blob=12000.0,
                         amplitude=4.0):
    """All movie frames + the light curve in one fused program.

    image: (H, W, 3) uint8 base disk render.  times: (F,) observer times.
    Per frame the blob weight is a Gaussian in disk-plane distance,
    w = exp(-[ (r - r_b)^2 + (r_b dphi)^2 ] / (2 sigma^2)),
    dphi = wrap(psi - phi0 - Omega_s tau);  bolometric Liouville beaming
    I_obs = g^4 I_em scales the excess, and each pixel subtends equal
    camera solid angle, so the light curve is a plain pixel sum — lensing
    magnification is automatically included through the pixel count of
    each (possibly multiple) blob image.

    Returns (frames (F, H, W, 3) uint8, flux (F,), weighted_g (F,),
    centroid (F, 2) — the flux-weighted image position in pixels about
    the frame center, (column/right, row/up)).
    """
    dtype = psi.dtype
    times = jnp.asarray(times, dtype)
    dphi = _wrap_pi(psi[None] - phi0 - omega_s * times[:, None, None])
    d2 = (r_hit - r_blob) ** 2 + (r_blob * dphi) ** 2
    w = jnp.where(valid[None], jnp.exp(-0.5 * d2 / (sigma * sigma)), 0.0)
    g4 = jnp.where(valid, g ** 4, 0.0)
    lum = w * g4[None]                                    # (F, H, W)
    flux = jnp.sum(lum, axis=(1, 2))
    safe = jnp.maximum(flux, jnp.asarray(1e-30, dtype))
    weighted_g = jnp.sum(lum * g[None], axis=(1, 2)) / safe
    # flux-weighted image centroid: GRAVITY's astrometric observable —
    # the flare's apparent position wobbles on the sky as the blob (and
    # its lensed secondary images) orbit.  Pixel units about the frame
    # center; columns advance along camera-right, rows along camera-up.
    h_px, w_px = psi.shape
    ii = jnp.arange(h_px, dtype=dtype) - (h_px - 1) / 2.0
    jj = jnp.arange(w_px, dtype=dtype) - (w_px - 1) / 2.0
    cen_col = jnp.sum(lum * jj[None, None, :], axis=(1, 2)) / safe
    cen_row = jnp.sum(lum * ii[None, :, None], axis=(1, 2)) / safe
    centroid = jnp.stack([cen_col, cen_row], axis=-1)     # (F, 2)

    # overlay: blackbody color at the observed blob temperature, additive
    # glow with the disk's tone-map/gamma conventions (engine/disk.py)
    tone = (1.0 - jnp.exp(-amplitude * lum)) ** (1.0 / 2.2)
    rgb = blackbody_rgb(jnp.where(valid, g, 1.0) * t_blob)  # (H, W, 3)
    glow = tone[..., None] * rgb[None] * 255.0
    frames = jnp.clip(image[None].astype(jnp.float32) + glow, 0.0,
                      255.0).astype(jnp.uint8)
    return frames, flux, weighted_g, centroid


def hotspot_movie(image, hit_q, status, redshift, params, r_in, r_out,
                  prograde=True, hotspot=None, *, frames_per_chunk=None,
                  camera_omega=0.0):
    """Movie + light curve from per-pixel invariants — no geodesic work.

    The inputs are exactly what a disk render (or a saved
    io.transfer.TransferMap) carries: the base image, the crossing events
    hit_q, the status mask and the redshift map, plus the annulus
    geometry.  Returns the render_hotspot dict minus the 'result' entry.

    `camera_omega` is the camera worldline's angular velocity when the
    render used a rotating camera (DiskConfig.camera_omega).  By
    axisymmetry a rotating camera sees the whole scene rotate with it:
    the pixel's disk point at observer time tau sits at BL azimuth
    phi_bl + camera_omega tau while the blob sits at
    phi0 + Omega_s (tau + t_bl), so the pattern speed in the frame-time
    term becomes Omega_s - camera_omega; the per-pixel statics
    (psi = phi_bl - Omega_s t_bl) and the light-travel delays are
    unchanged (circular worldline — the camera-scene distances are
    constant).

    `frames_per_chunk` bounds device memory for big frames x resolution
    products (the shading is elementwise, so chunking is exact).
    """
    hotspot = hotspot if hotspot is not None else HotspotConfig()
    params = np.asarray(params, np.float64)

    r_blob = hotspot.orbit_radius(r_in, r_out)
    if not (r_in <= r_blob <= r_out):
        raise ValueError(f"blob radius {r_blob} outside the disk annulus "
                         f"[{r_in:.3g}, {r_out:.3g}]")
    omega_s = float(keplerian_omega(r_blob, params[0], params[1],
                                    params[2], prograde))
    period = 2.0 * np.pi / abs(omega_s)
    times = np.linspace(0.0, hotspot.n_periods * period, hotspot.n_frames,
                        endpoint=False)

    hit_q = jnp.asarray(hit_q)
    psi, r_hit, g, valid = hotspot_statics(
        hit_q, jnp.asarray(status), jnp.asarray(redshift),
        jnp.asarray(params, hit_q.dtype), omega_s)

    image = jnp.asarray(image)
    omega_pattern = omega_s - float(camera_omega)   # see docstring
    chunk = frames_per_chunk or hotspot.n_frames
    frames, flux, wg, cen = [], [], [], []
    for k in range(0, hotspot.n_frames, chunk):
        ts = times[k:k + chunk]
        f, fl, w, c = shade_hotspot_frames(
            image, psi, r_hit, g, valid,
            jnp.asarray(ts), omega_pattern, r_blob, hotspot.sigma,
            hotspot.phi0, t_blob=hotspot.t_blob,
            amplitude=hotspot.amplitude)
        frames.append(np.asarray(f))
        flux.append(np.asarray(fl, np.float64))
        wg.append(np.asarray(w, np.float64))
        cen.append(np.asarray(c, np.float64))
    flux = np.concatenate(flux)
    return {
        "frames": np.concatenate(frames),
        "times": times,
        "flux": flux,
        "flux_norm": flux / max(flux.max(), 1e-30),
        "weighted_g": np.concatenate(wg),
        "centroid": np.concatenate(cen),
        "period": period,
        "omega": omega_s,
        "r_blob": r_blob,
    }


def render_hotspot(scene, disk=None, hotspot=None, *, bg_array=None,
                   metrics=None, frames_per_chunk=None):
    """Disk render + hot-spot movie.  Returns a dict:

    result     — the engine.render.RenderResult of the base disk render
    frames     — (F, H, W, 3) uint8 movie
    times      — (F,) observer coordinate times (tau = 0 at frame 0)
    flux       — (F,) excess bolometric blob flux (arbitrary units)
    flux_norm  — flux / max(flux)
    weighted_g — (F,) flux-weighted mean redshift factor (Doppler tracker)
    period     — the blob's coordinate orbital period 2 pi / |Omega_s|
    """
    from .disk import DiskConfig, render_disk, resolve_camera_omega

    disk = disk if disk is not None else DiskConfig()

    result = render_disk(scene, disk, bg_array=bg_array, metrics=metrics)

    r_in = disk.inner_edge(scene.bh_mass, scene.spin, scene.charge)
    _, camera_omega = resolve_camera_omega(scene, disk)
    out = hotspot_movie(
        result.device("image"), result.device("hit_q"),
        result.device("status"), result.device("redshift"),
        np.array([scene.bh_mass, scene.spin, scene.charge]),
        r_in, disk.r_out, disk.prograde, hotspot,
        frames_per_chunk=frames_per_chunk, camera_omega=camera_omega)
    out["result"] = result
    return out


def closure_phase_series(frames, pixel_rad, triangles):
    """(F, T) closure phases of a movie — the dynamical-imaging
    observable: an orbiting hot spot swings the closure phases on
    Earth-sized triangles far more robustly than amplitudes (station
    gains and image translation cancel exactly; engine/visibility.py).
    This is what the EHT's Sgr A* dynamics analyses fit.

    frames: (F, H, W, 3) uint8; `triangles` as
    engine.visibility.closure_phases.  One device FFT per frame.
    """
    from .visibility import closure_phases, complex_visibility

    series = []
    for fr in frames:
        vis, u, v = complex_visibility(fr, pixel_rad, pad=2)
        series.append(closure_phases(vis, u, v, triangles))
    return np.asarray(series)


def save_hotspot_artifacts(out, out_dir, gif=True, mass_msun=None):
    """Write the hot-spot science products:

    frames/frame_%04d.png — the movie
    hotspot.gif           — animated (optional)
    lightcurve.csv        — tau, flux, flux_norm, weighted_g, and the
                            flux-weighted centroid (cx, cy px) per frame
    lightcurve.png        — the flare light curve with the Doppler tracker
    astrometry.png        — the centroid track on the sky (GRAVITY's
                            flare-orbit observable), time-colored

    `mass_msun` (optional) adds physical time: the light-curve x axis
    gains a minutes scale and the title quotes the period in minutes
    (coordinate time x mass_msun x GM_sun/c^3).
    """
    import os

    frames_dir = os.path.join(out_dir, "frames")
    os.makedirs(frames_dir, exist_ok=True)

    from PIL import Image
    pils = []
    for k, fr in enumerate(out["frames"]):
        im = Image.fromarray(fr)
        im.save(os.path.join(frames_dir, f"frame_{k:04d}.png"))
        pils.append(im)
    if gif:
        pils[0].save(os.path.join(out_dir, "hotspot.gif"), save_all=True,
                     append_images=pils[1:], duration=70, loop=0)

    rows = np.column_stack([out["times"], out["flux"], out["flux_norm"],
                            out["weighted_g"], out["centroid"]])
    np.savetxt(os.path.join(out_dir, "lightcurve.csv"), rows, delimiter=",",
               header="tau,flux,flux_norm,weighted_g,centroid_x_px,"
                      "centroid_y_px", comments="", fmt="%.8g")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(out["times"] / out["period"], out["flux_norm"],
            label="blob flux (normalized)")
    ax2 = ax.twinx()
    ax2.plot(out["times"] / out["period"], out["weighted_g"], color="C1",
             alpha=0.7, label="flux-weighted g")
    ax2.axhline(1.0, color="C1", lw=0.5, ls=":")
    ax.set_xlabel("observer time (orbital periods)")
    ax.set_ylabel("normalized flux")
    ax2.set_ylabel("weighted redshift g")
    title = (f"hot-spot light curve (r = {out['r_blob']:.3g} M, "
             f"P = {out['period']:.4g} M")
    if mass_msun:
        p_min = out["period"] * mass_msun * T_SUN_S / 60.0
        title += f" = {p_min:.1f} min at {mass_msun:.3g} M_sun"
        sec = ax.secondary_xaxis(
            -0.18, functions=(lambda t: t * p_min, lambda m: m / p_min))
        sec.set_xlabel("observer time (minutes)")
    ax.set_title(title + ")")
    lines = ax.get_lines() + ax2.get_lines()[:1]
    ax.legend(lines, [ln.get_label() for ln in lines], loc="upper right")
    fig.savefig(os.path.join(out_dir, "lightcurve.png"), dpi=110,
                bbox_inches="tight")
    plt.close(fig)

    # astrometric track (GRAVITY-style): centroid wobble on the sky,
    # flux-sized markers time-colored over the movie
    cen = out["centroid"]
    fig, ax = plt.subplots(figsize=(5.4, 5))
    sc = ax.scatter(cen[:, 0], cen[:, 1],
                    c=out["times"] / out["period"],
                    s=8.0 + 60.0 * out["flux_norm"], cmap="viridis")
    ax.plot(cen[:, 0], cen[:, 1], color="gray", lw=0.5, alpha=0.6)
    ax.set_xlabel("centroid offset, camera-right (px)")
    ax.set_ylabel("centroid offset, camera-up (px)")
    ax.set_title("flare centroid track (flux-weighted)")
    ax.set_aspect("equal")
    ax.invert_yaxis()       # image rows advance along up; match imshow
    fig.colorbar(sc, ax=ax, label="observer time (periods)")
    fig.savefig(os.path.join(out_dir, "astrometry.png"), dpi=110,
                bbox_inches="tight")
    plt.close(fig)
