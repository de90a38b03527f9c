"""Orbiting hot-spot mode (engine/hotspot.py).

Strategy: the chart bookkeeping (closed-form BL time/azimuth offsets) is
pinned by autodiff against the derivative identities the chart map
defines; the physics invariants (exact periodicity, Doppler-beamed flux
peak, light-travel-time ordering) are asserted on a real small disk
render; the fused frame shader is pinned against a plain NumPy
restatement.  No reference counterpart exists (the reference renders one
static lensing view) — the oracles here are closed-form GR and
independent recomputation.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grtrace import IntegratorConfig, PatchConfig, SceneConfig
from grtrace.engine.disk import STATUS_DISK, DiskConfig
from grtrace.engine.hotspot import (HotspotConfig, bl_time_azimuth_offsets,
                                    hotspot_statics, render_hotspot,
                                    shade_hotspot_frames)


def test_bl_offsets_match_chart_derivatives():
    """T'(r) = (2Mr - Q^2)/Delta and Phi'(r) = a/Delta by autodiff —
    the same right-hand sides physics/polarization._ks_chart_geometry
    pinned numerically against the Hamiltonian."""
    params = jnp.array([1.0, 0.7, 0.2])
    mass, a, qc = params
    delta = lambda r: r * r - 2 * mass * r + a * a + qc * qc  # noqa: E731
    for r in [2.5, 4.0, 7.3, 19.0]:
        r = jnp.asarray(r, jnp.float64)
        dt = jax.grad(lambda r: bl_time_azimuth_offsets(r, params)[0])(r)
        dp = jax.grad(lambda r: bl_time_azimuth_offsets(r, params)[1])(r)
        np.testing.assert_allclose(dt, (2 * mass * r - qc ** 2) / delta(r),
                                   rtol=1e-12)
        np.testing.assert_allclose(dp, a / delta(r), rtol=1e-12)


def test_bl_offsets_schwarzschild_closed_form():
    params = jnp.array([1.0, 0.0])
    r = jnp.asarray(8.0, jnp.float64)
    t_off, phi_off = bl_time_azimuth_offsets(r, params)
    np.testing.assert_allclose(t_off, 2.0 * jnp.log(r - 2.0), rtol=1e-12)
    assert phi_off == 0.0


@pytest.fixture(scope="module")
def small_hotspot():
    """One shared small inclined disk render + hot-spot movie.

    Schwarzschild keeps the Doppler geometry clean (no frame dragging in
    the expected-blueshift argument); 35 deg elevation gives a strong
    approaching/receding asymmetry.
    """
    scene = SceneConfig(
        size=28, metric="schwarzschild", n_samples=0,
        integrator=IntegratorConfig(steps=1500, delta=0.06, backend="xla",
                                    dtype="float64"),
        patch=PatchConfig())
    disk = DiskConfig(elevation_deg=35.0)
    hs = HotspotConfig(r_blob=8.0, sigma=0.8, n_frames=48)
    rng = np.random.default_rng(3)
    bg = rng.integers(0, 255, (28, 28, 3), dtype=np.uint8)
    return render_hotspot(scene, disk, hs, bg_array=bg), scene, disk, hs


def test_lightcurve_periodicity(small_hotspot):
    """F(tau + P) = F(tau): the shader depends on tau only through
    wrap(psi - phi0 - Omega tau)."""
    out, scene, disk, hs = small_hotspot
    res = out["result"]
    params = jnp.asarray(np.array([1.0, 0.0]), jnp.float64)
    psi, r_hit, g, valid = hotspot_statics(
        res.device("hit_q"), res.device("status"), res.device("redshift"),
        params, out["omega"])
    ts = jnp.asarray(out["times"][:8])
    args = (res.device("image"), psi, r_hit, g, valid)
    kw = dict(t_blob=hs.t_blob, amplitude=hs.amplitude)
    _, f0, g0, c0 = shade_hotspot_frames(*args, ts, out["omega"],
                                         out["r_blob"], hs.sigma, hs.phi0,
                                         **kw)
    _, f1, g1, c1 = shade_hotspot_frames(*args, ts + out["period"],
                                         out["omega"], out["r_blob"],
                                         hs.sigma, hs.phi0, **kw)
    np.testing.assert_allclose(f0, f1, rtol=1e-9)
    np.testing.assert_allclose(g0, g1, rtol=1e-9)
    np.testing.assert_allclose(c0, c1, rtol=1e-9, atol=1e-9)


def test_flux_peaks_blueshifted(small_hotspot):
    """Doppler beaming: the flare flux peaks when the blob approaches —
    the flux-weighted redshift factor at the light-curve maximum is
    blueshifted relative to the orbit average, and the modulation is
    strong at 35 deg inclination."""
    out, *_ = small_hotspot
    flux, wg = out["flux"], out["weighted_g"]
    assert flux.min() > 0.0                     # blob visible all orbit
    assert flux.max() / flux.min() > 1.5        # real modulation
    k = int(np.argmax(flux))
    assert wg[k] > wg.mean()                    # peak is blue-leaning
    # and the peak's g sits in the top third of the g excursion
    assert wg[k] > wg.min() + 0.66 * (wg.max() - wg.min())


def test_time_orientation_and_light_travel(small_hotspot):
    """Pins the time conventions the hot-spot physics rests on:

    1. the camera launches PAST-directed rays (dt/dlambda < 0), so hit
       times are negative = physical emission times (causality);
    2. |t_bl| is at least the Euclidean camera->hit distance (gravity
       only ever DELAYS: Shapiro + geometric bending are positive);
    3. the far side of the disk (behind the hole) lags the near side.
    """
    from grtrace.physics.camera import camera_rays_cartesian
    from grtrace.physics.spacetime import METRICS

    out, scene, disk, _ = small_hotspot
    res = out["result"]
    params = jnp.asarray(np.array([1.0, 0.0]), jnp.float64)

    # 1. direct: dt/dlambda at the camera ICs
    obs = jnp.array([30.0, 0.0, 0.0], jnp.float64)
    q0, p0, _ = camera_rays_cartesian(obs, jnp.deg2rad(80.0), 3, 3,
                                      params=params,
                                      g_inv_fn=METRICS["KerrSchild"],
                                      dtype=jnp.float64)
    gi = METRICS["KerrSchild"](q0[1, 1], params)
    assert float(gi[0] @ p0[1, 1]) < 0.0

    hq = np.asarray(res.device("hit_q"))
    status = np.asarray(res.device("status"))
    _, r_hit, _, _ = hotspot_statics(
        res.device("hit_q"), res.device("status"), res.device("redshift"),
        params, out["omega"])
    t_off, _ = bl_time_azimuth_offsets(jnp.asarray(r_hit), params)
    t_bl = np.asarray(hq[..., 0] - np.asarray(t_off))
    dm = status == STATUS_DISK

    # 2. emission precedes arrival by at least the flat travel time.
    #    (t_bl carries an r-dependent additive gauge vs the KS hit time;
    #    compare against the BL-time lapse camera->hit, i.e. include the
    #    camera's own offset.)
    el = np.deg2rad(disk.elevation_deg)
    cam = 30.0 * np.array([np.cos(el), 0.0, np.sin(el)])
    t_cam_off = float(bl_time_azimuth_offsets(jnp.asarray(30.0), params)[0])
    dist = np.sqrt(((hq[..., 1:] - cam) ** 2).sum(-1))
    lapse = -(t_bl + t_cam_off)          # positive light-travel BL time
    assert (lapse[dm] >= dist[dm] - 1e-6).all()
    assert lapse[dm].min() > 0.0

    # 3. near side (camera on +x) arrives earlier than the far side
    x, y = hq[..., 1], hq[..., 2]
    r = np.asarray(r_hit)
    band = dm & (np.abs(y) < 0.5 * np.abs(x)) & (r > 4.0) & (r < 12.0)
    near = band & (x > 0)
    far = band & (x < 0)
    assert near.sum() > 3 and far.sum() > 3
    assert lapse[near].mean() < lapse[far].mean()


def test_frames_match_numpy_restatement(small_hotspot):
    """The fused shader against a plain NumPy recomputation of one frame
    (weights, flux, weighted g, and the additive glow overlay)."""
    out, scene, disk, hs = small_hotspot
    res = out["result"]
    params = jnp.asarray(np.array([1.0, 0.0]), jnp.float64)
    psi, r_hit, g, valid = hotspot_statics(
        res.device("hit_q"), res.device("status"), res.device("redshift"),
        params, out["omega"])
    tau = float(out["times"][int(np.argmax(out["flux"]))])
    frames, flux, wg, cen = shade_hotspot_frames(
        res.device("image"), psi, r_hit, g, valid, jnp.asarray([tau]),
        out["omega"], out["r_blob"], hs.sigma, hs.phi0,
        t_blob=hs.t_blob, amplitude=hs.amplitude)

    psi_n, r_n, g_n, v_n = (np.asarray(a) for a in (psi, r_hit, g, valid))
    d = psi_n - hs.phi0 - out["omega"] * tau
    d -= 2 * np.pi * np.round(d / (2 * np.pi))
    d2 = (r_n - out["r_blob"]) ** 2 + (out["r_blob"] * d) ** 2
    w = np.where(v_n, np.exp(-0.5 * d2 / hs.sigma ** 2), 0.0)
    lum = w * np.where(v_n, g_n ** 4, 0.0)
    np.testing.assert_allclose(flux[0], lum.sum(), rtol=1e-12)
    np.testing.assert_allclose(wg[0], (lum * g_n).sum() / lum.sum(),
                               rtol=1e-12)
    h_px, w_px = lum.shape
    jj = np.arange(w_px) - (w_px - 1) / 2.0
    ii = np.arange(h_px) - (h_px - 1) / 2.0
    np.testing.assert_allclose(
        np.asarray(cen)[0],
        [(lum * jj[None, :]).sum() / lum.sum(),
         (lum * ii[:, None]).sum() / lum.sum()], rtol=1e-12)
    assert int(np.asarray(frames).max()) <= 255
    # the glow brightens pixels near the blob and leaves the rest intact
    base = np.asarray(res.device("image")).astype(np.int32)
    fr = np.asarray(frames[0]).astype(np.int32)
    hot = w > 0.5
    cold = w < 1e-12
    assert (fr[hot] >= base[hot]).all() and (fr[hot] > base[hot]).any()
    np.testing.assert_array_equal(fr[cold], base[cold])


def test_sgra_flare_period_matches_gravity_ballpark(small_hotspot,
                                                    tmp_path):
    """Physical units sanity: a blob near the Sgr A* ISCO orbits in tens
    of minutes (GRAVITY 2018 observed ~30-50 min centroid loops), and
    the mass_msun plotting path runs."""
    from grtrace.engine.hotspot import T_SUN_S, save_hotspot_artifacts
    from grtrace.physics.orbits import keplerian_omega

    om = float(keplerian_omega(4.0, 1.0, 0.9))
    p_min = 2.0 * np.pi / om * 4.297e6 * T_SUN_S / 60.0
    assert 15.0 < p_min < 45.0

    out, *_ = small_hotspot
    save_hotspot_artifacts(out, str(tmp_path), gif=False,
                           mass_msun=4.297e6)
    import os
    assert os.path.exists(tmp_path / "lightcurve.png")


def test_closure_phase_series_swings_and_freezes(small_hotspot):
    """The orbiting blob swings the movie's closure phases (dynamics
    detected); a frozen movie (identical frames) gives a constant
    series — the discriminant the EHT Sgr A* dynamics analyses use."""
    from grtrace.engine.hotspot import closure_phase_series

    out, *_ = small_hotspot
    size = out["frames"].shape[1]
    pixel_rad = 1e-6
    du = 1.0 / (2 * size * pixel_rad)
    tris = np.asarray([[[3 * du, 0.0], [0.0, 3 * du],
                        [-3 * du, -3 * du]],
                       [[7 * du, du], [du, 7 * du],
                        [-8 * du, -8 * du]]])
    series = closure_phase_series(out["frames"][:12], pixel_rad, tris)
    assert series.shape == (12, 2)
    assert np.isfinite(series).all()
    assert np.degrees(np.ptp(series, axis=0)).max() > 2.0   # swings

    frozen = np.repeat(out["frames"][:1], 5, axis=0)
    fseries = closure_phase_series(frozen, pixel_rad, tris)
    assert np.ptp(fseries, axis=0).max() == 0.0             # constant


def test_astrometric_track_wobbles_and_stays_on_disk(small_hotspot,
                                                     tmp_path):
    """The flux-weighted centroid (GRAVITY's observable) traces a real
    track: nonzero wobble in both screen axes, bounded by the frame, and
    written to the lightcurve CSV + astrometry plot."""
    import os

    from grtrace.engine.hotspot import save_hotspot_artifacts

    out, *_ = small_hotspot
    cen = out["centroid"]
    h = out["frames"].shape[1]
    assert cen.shape == (len(out["times"]), 2)
    assert np.ptp(cen[:, 0]) > 0.5 and np.ptp(cen[:, 1]) > 0.5
    assert np.abs(cen).max() < h / 2.0

    save_hotspot_artifacts(out, str(tmp_path), gif=False)
    assert os.path.exists(tmp_path / "astrometry.png")
    rows = np.genfromtxt(tmp_path / "lightcurve.csv", delimiter=",",
                         names=True)
    np.testing.assert_allclose(rows["centroid_x_px"], cen[:, 0],
                               rtol=1e-6)


def test_movie_period_covers_full_cycle(small_hotspot):
    """n_periods = 1 with endpoint=False: frame 0 repeats after the last
    frame; the brightest azimuth sweeps the whole orbit (the argmax frame
    is neither pinned at 0 nor constant)."""
    out, *_ = small_hotspot
    assert len(out["times"]) == 48
    np.testing.assert_allclose(np.diff(out["times"]),
                               out["period"] / 48, rtol=1e-12)
    assert out["flux_norm"].max() == 1.0


def test_cli_artifacts(tmp_path):
    from grtrace.cli import hotspot as cli
    out_dir = tmp_path / "hs"
    cli.main(["--size", "16", "--steps", "800", "--delta", "0.08",
              "--frames", "6", "--blob-sigma", "1.0",
              "--out-dir", str(out_dir), "--bench",
              "--out-json", str(tmp_path / "hs.json")])
    lc = np.genfromtxt(out_dir / "lightcurve.csv", delimiter=",", names=True)
    assert set(lc.dtype.names) == {"tau", "flux", "flux_norm",
                                   "weighted_g", "centroid_x_px",
                                   "centroid_y_px"}
    assert lc.shape == (6,)
    assert (out_dir / "hotspot.gif").exists()
    assert (out_dir / "lightcurve.png").exists()
    for k in range(6):
        assert (out_dir / "frames" / f"frame_{k:04d}.png").exists()
    import json
    line = json.loads((tmp_path / "hs.json").read_text())
    assert line["metric"] == "hotspot_16_shading_frames_per_s"
    assert line["value"] > 0
