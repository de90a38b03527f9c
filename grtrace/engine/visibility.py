"""Interferometric visibilities: the u-v-plane observables of a render.

Radio interferometers (the EHT) never see the image — they sample its
2-D Fourier transform, the complex visibility V(u, v), at baselines
u, v measured in wavelengths.  This module turns any grtrace render into
those observables in one fused device program (jnp.fft.fft2 — FFTs map
straight onto the accelerator):

  * the normalized visibility amplitude map |V(u, v)| (V(0,0) = 1),
  * the azimuthally averaged radial profile |V|(b) vs baseline length,
  * the first-null baseline, the classic ring-diameter estimator: an
    infinitesimally thin ring of angular diameter theta_d has
    V(b) = J0(pi theta_d b), first null at b = j01/(pi theta_d),
    j01 = 2.4048 — so theta_d = j01/(pi b_null) (EHT 2019 Paper IV's
    crest-line logic).  Validated in tests/test_visibility.py against a
    synthetic thin ring and a Gaussian (whose visibility is Gaussian).

Angular scale.  The camera sits at r_obs (30 M by default), not at
infinity; pixel angles are camera angles.  For physical baselines the
CLI converts with theta = alpha_pixel * (M_geom / D): the O(M/r_obs)
difference between the camera angle and the asymptotic angle is ~3% at
the headline scene and is quoted, not hidden (metrics carry the raw
per-radian baselines too).

No reference counterpart: the reference produces images only.
"""
from __future__ import annotations

import numpy as np

J01 = 2.404825557695773        # first zero of the Bessel J0
M_SUN_M = 1476.62504           # geometrized solar mass GM_sun/c^2 (m)
PC_M = 3.0856775814913673e16   # meters per parsec

# the two sources black-hole imaging actually targets (EHT 2019/2022;
# GRAVITY 2018): mass in solar masses, distance in Mpc
PRESETS = {
    "m87": {"mass_msun": 6.5e9, "distance_mpc": 16.8},
    "sgra": {"mass_msun": 4.297e6, "distance_mpc": 8.277e-3},
}


def camera_to_earth(r_obs, mass, mass_msun, distance_mpc):
    """Camera-angle -> Earth-angle conversion factor.

    The camera sits at r_obs (geometrized), not at infinity; a small
    camera angle alpha maps to impact parameter b = alpha r_obs /
    sqrt(1 - 2 mass / r_obs), which subtends b M_geom / D at Earth.
    One source of truth for the CLI and the examples."""
    return (r_obs / np.sqrt(1.0 - 2.0 * mass / r_obs)
            * mass_msun * M_SUN_M / (distance_mpc * 1e6 * PC_M))


def _luminance(image):
    """(H, W [,3]) uint8/float -> (H, W) float64 intensity (Rec.601)."""
    img = np.asarray(image, np.float64)
    if img.ndim == 3:
        img = img @ np.array([0.299, 0.587, 0.114])
    return img


def visibility_map(image, pixel_rad, pad=4):
    """|V(u, v)| of an image with square pixels of `pixel_rad` radians.

    Returns (amp (pH, pW) with the zero baseline at the center, u (pW,),
    v (pH,) baselines in wavelengths (= cycles per radian)).  Computed
    on device (jnp.fft.fft2) in one jit; output is host numpy.  `pad`
    zero-pads the image by that factor — padding adds no information but
    interpolates the u-v plane, sharpening null localization (the
    frequency resolution of the raw FFT is 1 cycle per field of view).
    """
    import jax
    import jax.numpy as jnp

    lum = _luminance(image)
    h, w = lum.shape
    ph, pw = int(pad) * h, int(pad) * w

    @jax.jit
    def run(x):
        vis = jnp.fft.fft2(x, s=(ph, pw))
        amp = jnp.abs(vis) / jnp.maximum(jnp.abs(vis[0, 0]), 1e-30)
        return jnp.fft.fftshift(amp)

    amp = np.asarray(run(jnp.asarray(lum)))
    u = np.fft.fftshift(np.fft.fftfreq(pw, d=pixel_rad))
    v = np.fft.fftshift(np.fft.fftfreq(ph, d=pixel_rad))
    return amp, u, v


def radial_profile(amp, u, v, n_bins=None, b_max=None):
    """Azimuthal average of |V|: (baseline (B,), mean amp (B,)).

    `b_max` crops the profile (the physical structure usually lives at a
    small fraction of the Nyquist baseline)."""
    uu, vv = np.meshgrid(u, v)
    b = np.hypot(uu, vv).ravel()
    a = np.asarray(amp).ravel()
    if b_max is None:
        b_max = min(u.max(), v.max())
    if n_bins is None:
        n_bins = min(len(u), len(v)) // 2
    edges = np.linspace(0.0, b_max, n_bins + 1)
    idx = np.clip(np.digitize(b, edges) - 1, 0, n_bins - 1)
    keep = b <= b_max
    sums = np.bincount(idx[keep], weights=a[keep], minlength=n_bins)
    cnts = np.bincount(idx[keep], minlength=n_bins)
    centers = 0.5 * (edges[1:] + edges[:-1])
    # drop empty bins (bin width below the frequency-grid spacing) —
    # keeping them as zeros would fabricate visibility nulls
    filled = cnts > 0
    return centers[filled], sums[filled] / cnts[filled]


def first_null(baselines, amps, prominence=0.005, depth=0.25):
    """Baseline of the first SIGNIFICANT local minimum of |V|(b)
    (parabolic sub-bin refine).

    Significant = the minimum is deep (a[k] < `depth`: a true null dips
    toward zero) AND the profile rebounds by at least `prominence` (in
    V(0) = 1 units) afterwards — together these reject both the sparse-
    bin ripple near V ~ 1 and the numerical noise of a null-free (e.g.
    Gaussian) tail.  Returns np.nan when no such null exists in the
    sampled range."""
    a = np.asarray(amps)
    for k in range(1, len(a) - 1):
        if a[k] <= a[k - 1] and a[k] < a[k + 1]:
            if a[k] >= depth:
                continue
            rebound = a[k + 1:min(k + 1 + max(3, len(a) // 20),
                                  len(a))].max() - a[k]
            if rebound < prominence:
                continue
            denom = a[k - 1] - 2.0 * a[k] + a[k + 1]
            shift = 0.5 * (a[k - 1] - a[k + 1]) / denom if denom != 0 \
                else 0.0
            db = 0.5 * (baselines[k + 1] - baselines[k - 1])
            return float(baselines[k] + shift * db)
    return float("nan")


def ring_diameter_from_null(b_null):
    """Thin-ring estimator: angular diameter (radians) from the first
    visibility null, theta_d = j01 / (pi b_null)."""
    return J01 / (np.pi * b_null)


def complex_visibility(image, pixel_rad, pad=4):
    """Complex V(u, v) (fftshifted, V(0,0) = 1) + (u, v) axes — the
    phase-bearing twin of visibility_map, for closure quantities."""
    import jax
    import jax.numpy as jnp

    lum = _luminance(image)
    h, w = lum.shape
    ph, pw = int(pad) * h, int(pad) * w

    @jax.jit
    def run(x):
        vis = jnp.fft.fft2(x, s=(ph, pw))
        return jnp.fft.fftshift(vis / vis[0, 0])

    vis = np.asarray(run(jnp.asarray(lum, jnp.complex64)))
    u = np.fft.fftshift(np.fft.fftfreq(pw, d=pixel_rad))
    v = np.fft.fftshift(np.fft.fftfreq(ph, d=pixel_rad))
    return vis, u, v


def closure_phases(vis, u, v, triangles):
    """Closure phases (radians) on baseline triangles.

    `triangles`: (T, 3, 2) array of (u, v) baselines per leg, with the
    three legs summing to ~zero (a closed antenna triangle: AB + BC +
    CA = 0).  Each leg's V is sampled at the nearest grid point; the
    closure phase arg(V1 V2 V3) cancels any station-based phase (and,
    exactly, any image translation — a shift multiplies V by
    e^{-2 pi i (u dx + v dy)}, which telescopes to 1 around a closed
    triangle; pinned in tests/test_visibility.py).

    Returns (T,) phases in (-pi, pi].
    """
    tri = np.asarray(triangles, np.float64)
    if tri.ndim != 3 or tri.shape[1:] != (3, 2):
        raise ValueError(f"triangles must be (T, 3, 2), got {tri.shape}")

    du = u[1] - u[0]
    dv = v[1] - v[0]
    ju = np.clip(np.round((tri[..., 0] - u[0]) / du).astype(int),
                 0, len(u) - 1)
    jv = np.clip(np.round((tri[..., 1] - v[0]) / dv).astype(int),
                 0, len(v) - 1)
    # closure must hold on the SNAPPED baselines — that is what makes
    # the shift phase telescope exactly on the FFT lattice
    snapped_sum = np.abs(u[ju].sum(axis=1)).max() + \
        np.abs(v[jv].sum(axis=1)).max()
    if snapped_sum > 1e-6 * max(u.max(), v.max()):
        raise ValueError("triangle legs do not close on the u-v grid "
                         "(snapped sum != 0)")
    legs = np.asarray(vis)[jv, ju]                     # (T, 3)
    return np.angle(legs.prod(axis=1))
