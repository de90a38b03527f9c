"""Relativistically boosted camera (physics/camera.boosted_ics_from_pixels
+ the omega_obs receiver leg): exact aberration + Doppler.

The tetrad construction has no small-velocity or weak-field expansion in
it, so the pins are exact: null rays with unit camera-frame frequency in
full Kerr, the special-relativistic aberration/Doppler closed forms in
the flat limit, Killing-algebra identities for the redshift, and render-
level Doppler monotonicity (a co-rotating camera chases the approaching
limb; a counter-rotating one meets it).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grtrace import IntegratorConfig, PatchConfig, SceneConfig
from grtrace.engine.disk import (DiskConfig, render_disk,
                                 resolve_camera_omega)
from grtrace.physics.camera import (boosted_ics_from_pixels,
                                    cartesian_ics_from_pixels,
                                    pixel_grid_lookat)
from grtrace.physics.orbits import (keplerian_omega, redshift_factor,
                                    rotating_u_t, static_u_t, zamo_omega)
from grtrace.physics.spacetime import METRICS

DT = jnp.float64
GFN = METRICS["KerrSchild"]


def _pix(obs, n=8, fov=60.0):
    return pixel_grid_lookat(jnp.asarray(obs, DT), DT(np.deg2rad(fov)),
                             n, n, dtype=DT)


def test_null_and_unit_frequency_full_kerr():
    """p = d - e0 must be exactly null with p.u = 1 for every pixel —
    elevated camera, a = 0.9, ZAMO angular velocity (no flat-limit
    crutch; this is the tetrad orthonormality in disguise)."""
    obs = jnp.asarray([26.0, 0.0, 15.0], DT)
    params = jnp.asarray([1.0, 0.9, 0.0], DT)
    r_bl = float(np.sqrt(
        ((26.0**2 + 15.0**2) - 0.81
         + np.sqrt(((26.0**2 + 15.0**2) - 0.81) ** 2
                   + 4 * 0.81 * 15.0**2)) / 2.0))
    th = np.arccos(15.0 / r_bl)
    om = DT(zamo_omega(jnp.asarray(r_bl, DT), params, DT(th)))
    q0, p0, _ = boosted_ics_from_pixels(obs, _pix(obs), params=params,
                                        g_inv_fn=GFN, omega_cam=om)
    g_inv = GFN(jnp.concatenate([jnp.zeros((1,), DT), obs]), params)
    pf = np.asarray(p0).reshape(-1, 4)
    h_val = 0.5 * np.einsum("ni,ij,nj->n", pf, np.asarray(g_inv), pf)
    assert np.abs(h_val).max() < 1e-13

    g_cov = np.linalg.inv(np.asarray(g_inv))
    v0 = np.array([1.0, -float(om) * 0.0, float(om) * 26.0, 0.0])
    u = v0 / np.sqrt(-(v0 @ g_cov @ v0))
    assert np.abs(pf @ u - 1.0).max() < 1e-13


def test_flat_limit_static_reduces_to_reference_camera():
    """M -> 0: the tetrad is the Euclidean look-at frame, so omega = 0
    must reproduce cartesian_ics_from_pixels (whose sqrt(1-2M/r) radial
    convention becomes the identity)."""
    obs = jnp.asarray([30.0, 0.0, 0.0], DT)
    params = jnp.asarray([1e-12, 0.0, 0.0], DT)
    pix = _pix(obs)
    _, p_a, al_a = boosted_ics_from_pixels(obs, pix, params=params,
                                           g_inv_fn=GFN, omega_cam=DT(0.0))
    _, p_b, al_b = cartesian_ics_from_pixels(obs, pix, params=params,
                                             g_inv_fn=GFN)
    na = np.asarray(p_a)
    nb = np.asarray(p_b)
    na = na / np.linalg.norm(na[..., 1:], axis=-1, keepdims=True)
    nb = nb / np.linalg.norm(nb[..., 1:], axis=-1, keepdims=True)
    np.testing.assert_allclose(na, nb, atol=1e-9)
    np.testing.assert_allclose(np.asarray(al_a), np.asarray(al_b),
                               atol=1e-9)


def test_sr_doppler_and_aberration_flat_limit():
    """beta = 0.3 at M ~ 0: nu_moving/nu_static = gamma (1 - beta.n_hat)
    and cos th_static = (cos th_cam + beta)/(1 + beta cos th_cam), with
    n_hat the photon PROPAGATION direction (= -spatial p: the traced
    momentum is past-directed and scene-ward)."""
    obs = jnp.asarray([30.0, 0.0, 0.0], DT)
    params = jnp.asarray([1e-12, 0.0, 0.0], DT)
    pix = _pix(obs)
    beta = 0.3
    gamma = 1.0 / np.sqrt(1.0 - beta * beta)
    _, p_s, _ = boosted_ics_from_pixels(obs, pix, params=params,
                                        g_inv_fn=GFN, omega_cam=DT(0.0))
    _, p_m, _ = boosted_ics_from_pixels(obs, pix, params=params,
                                        g_inv_fn=GFN,
                                        omega_cam=DT(beta / 30.0))
    ps = np.asarray(p_s).reshape(-1, 4)
    pm = np.asarray(p_m).reshape(-1, 4)
    u_m = gamma * np.array([1.0, 0.0, beta, 0.0])
    u_s = np.array([1.0, 0.0, 0.0, 0.0])
    y_hat = np.array([0.0, 1.0, 0.0])

    # Doppler: one fixed photon (the static camera's), two observers
    nhat = -ps[:, 1:] / np.linalg.norm(ps[:, 1:], axis=1, keepdims=True)
    ratio = (ps @ u_m) / (ps @ u_s)
    np.testing.assert_allclose(ratio,
                               gamma * (1.0 - beta * (nhat @ y_hat)),
                               atol=1e-12)

    # aberration: the moving camera's pixel directions, seen statically
    nh_m = -pm[:, 1:] / np.linalg.norm(pm[:, 1:], axis=1, keepdims=True)
    cos_c = nhat @ y_hat                       # camera-frame pixel angle
    np.testing.assert_allclose(nh_m @ y_hat,
                               (cos_c + beta) / (1.0 + beta * cos_c),
                               atol=1e-12)


def test_redshift_killing_identities():
    """omega_obs = 0 is the static observer; emitter == observer gives
    g = 1 exactly for ANY Killing charges (same worldline, same clock)."""
    params = jnp.asarray([1.0, 0.7, 0.0], DT)
    r = DT(8.0)
    assert float(rotating_u_t(r, params, omega=0.0)) == pytest.approx(
        float(static_u_t(r, params)), rel=1e-14)

    om = float(keplerian_omega(r, 1.0, 0.7))
    for e, lz in [(1.0, 2.0), (-0.3, 4.0), (2.5, -1.0)]:
        g = float(redshift_factor(DT(e), DT(lz), r, r, params,
                                  prograde=True, theta_obs=jnp.pi / 2,
                                  omega_obs=om))
        assert g == pytest.approx(1.0, rel=1e-12)

    # ZAMO degenerates to static in Schwarzschild
    schw = jnp.asarray([1.0, 0.0, 0.0], DT)
    assert abs(float(zamo_omega(DT(10.0), schw))) < 1e-15


SIZE = 28
INTEG = IntegratorConfig(steps=2500, delta=0.1, dtype="float64")


def _render(camera_omega, spin=0.9):
    scene = SceneConfig(size=SIZE, metric="kerr", spin=spin, n_samples=0,
                        integrator=INTEG, patch=PatchConfig())
    return render_disk(scene,
                       DiskConfig(r_out=10.0, camera_omega=camera_omega),
                       bg_array=None)


def test_corotating_camera_softens_blue_limb():
    """Receiver-leg Doppler on a FIXED photon bundle: for the same
    traced crossings, a co-rotating (Keplerian) camera chases the
    approaching limb -> max g drops; a counter-rotating one meets it ->
    max g rises.  (Comparing across separate boosted renders would
    confound this with aberration resampling the coarse pixel grid onto
    different disk points — the receiver leg is the physical claim.)"""
    from grtrace.engine.disk import shade_disk

    res = _render(None)
    scene = SceneConfig(size=SIZE, metric="kerr", spin=0.9, n_samples=0,
                        integrator=INTEG, patch=PatchConfig())
    disk = DiskConfig(r_out=10.0)
    _, om_kep = resolve_camera_omega(
        scene, DiskConfig(r_out=10.0, camera_omega="keplerian"))
    assert om_kep > 0.0

    hq = np.asarray(res.device("hit_q")).reshape(-1, 4)
    hp = np.asarray(res.device("hit_p")).reshape(-1, 4)
    dm = np.asarray(res.device("status")).ravel() == 3
    assert dm.sum() > 10
    params = jnp.asarray([1.0, 0.9, 0.0], DT)
    from grtrace.engine.disk import disk_observer_position
    from grtrace.physics.spacetime import ks_radius
    obs = disk_observer_position(scene, disk)
    r_bl = float(ks_radius(obs[0], obs[1], obs[2], 0.9))
    th = float(np.arccos(obs[2] / r_bl))

    def max_g(omega_obs):
        g, _ = shade_disk(jnp.asarray(hq, DT), jnp.asarray(hp, DT),
                          params, DT(r_bl), DT(disk.inner_edge(1.0, 0.9)),
                          theta_obs=DT(th), omega_obs=DT(omega_obs),
                          r_out=10.0)
        return float(np.asarray(g)[dm].max())

    assert max_g(om_kep) < max_g(0.0) < max_g(-om_kep)


def test_zamo_value_equals_explicit_float():
    """'zamo' is pure sugar for its resolved float -> identical render."""
    scene = SceneConfig(size=SIZE, metric="kerr", spin=0.9, n_samples=0,
                        integrator=INTEG, patch=PatchConfig())
    _, om = resolve_camera_omega(scene, DiskConfig(r_out=10.0,
                                                   camera_omega="zamo"))
    assert om != 0.0
    a = _render("zamo")
    b = _render(om)
    np.testing.assert_array_equal(a.image, b.image)
    np.testing.assert_array_equal(np.asarray(a.device("redshift")),
                                  np.asarray(b.device("redshift")))


def test_superluminal_camera_rejected():
    scene = SceneConfig(size=SIZE, metric="kerr", spin=0.9, n_samples=0,
                        integrator=INTEG, patch=PatchConfig())
    with pytest.raises(ValueError, match="superluminal"):
        resolve_camera_omega(scene, DiskConfig(r_out=10.0,
                                               camera_omega=0.05))


def test_bfield_with_moving_camera_accepted():
    """Polarized imaging composes with every camera worldline since
    round 4 (the EVPA screen basis is built from the boosted tetrad,
    physics.polarization.observer_evpa omega_obs)."""
    disk = DiskConfig(bfield="vertical", camera_omega="zamo")
    assert disk.bfield == "vertical" and disk.camera_omega == "zamo"


def test_hotspot_corotating_camera_freezes_light_curve():
    """A camera riding the blob's angular velocity sees a stationary
    pattern: every movie frame and flux sample identical (pattern speed
    Omega_s - camera_omega = 0 exactly)."""
    from grtrace.engine.hotspot import HotspotConfig, hotspot_movie

    res = _render(None)
    scene_params = np.array([1.0, 0.9, 0.0])
    disk = DiskConfig(r_out=10.0)
    r_in = disk.inner_edge(1.0, 0.9)
    hs = HotspotConfig(n_frames=5)
    r_blob = hs.orbit_radius(r_in, 10.0)
    om_s = float(keplerian_omega(r_blob, 1.0, 0.9))
    out = hotspot_movie(res.device("image"), res.device("hit_q"),
                        res.device("status"), res.device("redshift"),
                        scene_params, r_in, 10.0, True, hs,
                        camera_omega=om_s)
    assert np.ptp(out["flux"]) == 0.0
    assert (out["frames"] == out["frames"][0]).all()


def test_transfer_roundtrip_with_moving_camera(tmp_path):
    """reshade of a moving-camera map reproduces the render bit-exactly
    (the aberration lives in the saved rays; omega_obs rides meta)."""
    from grtrace.io.transfer import TransferMap, reshade

    scene = SceneConfig(size=SIZE, metric="kerr", spin=0.9, n_samples=0,
                        integrator=INTEG, patch=PatchConfig())
    disk = DiskConfig(r_out=10.0, camera_omega="zamo")
    res = render_disk(scene, disk, bg_array=None)
    tm = TransferMap.from_result(res, scene, disk)
    assert tm.meta["camera_omega"] != 0.0
    path = tmp_path / "cam.npz"
    tm.save(path)
    r2 = reshade(TransferMap.load(path))
    np.testing.assert_array_equal(r2.image, res.image)
    np.testing.assert_array_equal(np.asarray(r2.device("redshift")),
                                  np.asarray(res.device("redshift")))
    # re-polarizing a MOVING-camera map works (round 4): the EVPA screen
    # solve rebuilds the boosted rays from the saved geometry
    rp = reshade(tm, bfield="vertical")
    evpa = np.asarray(rp.device("evpa"))
    chk = np.asarray(rp.device("pol_check"))
    dm = np.asarray(rp.device("status")) == 3
    assert dm.any()
    assert np.isfinite(evpa[dm]).all()
    # screen solve healthy: residual ~1 in the bulk (single inner-edge
    # pixels carry the coarse-delta crossing-lerp error; the exact-limit
    # EVPA is pinned by the SR closed-form test in test_polarization)
    assert np.median(np.abs(chk[dm] - 1.0)) < 1e-3
    assert (np.abs(chk[dm] - 1.0) < 0.3).all()

    # the hotspot path must carry the camera angular velocity too: the
    # transfer-shaded movie equals the direct render_hotspot (which
    # resolves camera_omega itself) frame for frame
    from grtrace.engine.hotspot import HotspotConfig, render_hotspot
    from grtrace.io.transfer import hotspot_from_transfer

    hs = HotspotConfig(n_frames=4)
    direct = render_hotspot(scene, disk, hs, bg_array=None)
    via_tm = hotspot_from_transfer(tm, hs)
    np.testing.assert_array_equal(via_tm["frames"], direct["frames"])
    np.testing.assert_array_equal(via_tm["flux"], direct["flux"])
