"""Seeded property sweep over scene-parameter space.

Cheap randomized-but-deterministic coverage of corners no single example
test hits (odd/tiny sizes, extreme fov, non-unit mass, near/far observer,
random spins), asserting the invariants every render must satisfy:

  * classification counts partition the pixel grid;
  * STATUS codes are consistent with final radii (captured inside the
    shell, escaped beyond the boundary);
  * outputs are finite where they are meaningful;
  * rendering is deterministic (same scene twice -> identical pixels).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace import IntegratorConfig, PatchConfig, SceneConfig, render
from grtrace.engine import classify
from grtrace.engine.integrate import STATUS_CAPTURED, STATUS_ESCAPED


def _check_invariants(scene, res):
    n = scene.size * scene.size
    c = res.counts
    assert (c["captured"] + c["in_domain"] + c["escaped"]
            + c["numerical_error"] == n), c
    assert c["background"] <= c["escaped"]

    cls = np.asarray(res.cls)
    assert cls.shape == (scene.size, scene.size)
    img = np.asarray(res.image)
    assert img.shape == (scene.size, scene.size, 3)
    assert img.dtype == np.uint8

    status = np.asarray(res.status).reshape(-1)
    final_r = np.asarray(res.final_q)[..., 1].reshape(-1)
    rs = 2.0 * scene.bh_mass
    cap = status == STATUS_CAPTURED
    esc = status == STATUS_ESCAPED
    assert np.isfinite(final_r[esc]).all()
    assert (final_r[cap] <= 1.1 * rs + 1e-6).all()
    assert (final_r[esc] >= scene.boundary_radius - 1e-6).all()


CASES = [
    # (size, fov_deg, mass, obs_dist, boundary, steps, delta)
    (3, 80.0, 1.0, 30.0, 31.0, 500, 0.05),      # sub-tile batch
    (17, 150.0, 1.0, 30.0, 31.0, 1500, 0.05),   # odd size, extreme fov
    (8, 10.0, 1.0, 30.0, 31.0, 1500, 0.05),     # narrow fov: all shadow
    (12, 80.0, 2.0, 40.0, 45.0, 1500, 0.05),    # heavy hole, scaled scene
    (12, 80.0, 0.5, 12.0, 14.0, 1500, 0.02),    # light hole, close camera
    (10, 120.0, 1.0, 6.0, 31.0, 2000, 0.02),    # observer near the hole
]


@pytest.mark.parametrize("size,fov,mass,dist,boundary,steps,delta", CASES)
def test_schwarzschild_scene_invariants(size, fov, mass, dist, boundary,
                                        steps, delta):
    scene = SceneConfig(
        size=size, fov_deg=fov, bh_mass=mass, observer_distance=dist,
        boundary_radius=boundary,
        integrator=IntegratorConfig(steps=steps, delta=delta, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)
    tex = np.random.default_rng(0).integers(0, 255, (16, 16, 3),
                                            dtype=np.uint8)
    res = render(scene, bg_array=tex)
    _check_invariants(scene, res)
    # determinism: identical scene -> identical pixels
    res2 = render(scene, bg_array=tex)
    np.testing.assert_array_equal(res.image, res2.image)
    np.testing.assert_array_equal(res.cls, res2.cls)


@pytest.mark.parametrize("spin,charge", [(0.3, 0.0), (0.95, 0.0),
                                         (0.5, 0.5)])
def test_kerr_scene_invariants(spin, charge):
    scene = SceneConfig(
        size=10, fov_deg=80.0, metric="kerr", spin=spin, charge=charge,
        integrator=IntegratorConfig(steps=1500, delta=0.05, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)
    tex = np.random.default_rng(1).integers(0, 255, (16, 16, 3),
                                            dtype=np.uint8)
    res = render(scene, bg_array=tex)
    n = scene.size * scene.size
    c = res.counts
    assert (c["captured"] + c["in_domain"] + c["escaped"]
            + c["numerical_error"] == n), c
    img = np.asarray(res.image)
    assert img.shape == (10, 10, 3) and img.dtype == np.uint8
    res2 = render(scene, bg_array=tex)
    np.testing.assert_array_equal(res.image, res2.image)


# ---------------------------------------------------------------------------
# New observational surfaces: randomized-but-deterministic invariants
# ---------------------------------------------------------------------------

DISK_CASES = [
    # (spin, charge, elevation_deg, r_out, camera_omega)
    (0.0, 0.0, 12.0, 10.0, None),
    (0.93, 0.0, 25.0, 12.0, None),
    (0.5, 0.4, 5.0, 9.0, None),
    (0.9, 0.0, 18.0, 11.0, "zamo"),
    (0.7, 0.0, 40.0, 10.0, "keplerian"),
]


@pytest.mark.parametrize("spin,charge,elev,r_out,cam", DISK_CASES)
def test_disk_transfer_roundtrip_invariants(spin, charge, elev, r_out, cam,
                                            tmp_path):
    """For random disk scenes (incl. moving cameras): the transfer map
    round-trips bit-exactly, the redshift map is finite and positive on
    disk pixels, and hot-spot light curves are finite with a strictly
    positive peak."""
    from grtrace.engine.disk import DiskConfig, render_disk
    from grtrace.engine.hotspot import HotspotConfig
    from grtrace.io.transfer import (TransferMap, hotspot_from_transfer,
                                     reshade)

    scene = SceneConfig(
        size=12, metric="kerr", spin=spin, charge=charge, n_samples=0,
        integrator=IntegratorConfig(steps=1500, delta=0.1, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig())
    disk = DiskConfig(r_out=r_out, elevation_deg=elev, camera_omega=cam)
    res = render_disk(scene, disk, bg_array=None)
    assert res.counts["disk"] > 0, (spin, charge, elev)

    g = np.asarray(res.device("redshift"))
    dm = np.asarray(res.device("status")) == 3
    assert np.isfinite(g[dm]).all() and (g[dm] > 0).all()

    tm = TransferMap.from_result(res, scene, disk)
    path = tmp_path / "t.npz"
    tm.save(path)
    r2 = reshade(TransferMap.load(path))
    np.testing.assert_array_equal(r2.image, res.image)

    hs = HotspotConfig(n_frames=3, sigma=0.8)
    movie = hotspot_from_transfer(tm, hs)
    assert np.isfinite(movie["flux"]).all()
    assert movie["flux"].max() > 0
    assert np.isfinite(movie["centroid"]).all()


@pytest.mark.parametrize("spin,charge,elev,omega_frac", [
    (0.0, 0.0, 0.0, 0.5), (0.9, 0.0, 30.0, -0.8), (0.6, 0.5, 10.0, 0.9),
])
def test_boosted_camera_rays_always_null(spin, charge, elev, omega_frac):
    """Any timelike circular camera must emit exactly null rays with
    unit camera-frame frequency — parameter-independent tetrad algebra."""
    from grtrace.physics.camera import (boosted_ics_from_pixels,
                                        pixel_grid_lookat)
    from grtrace.physics.orbits import keplerian_omega
    from grtrace.physics.spacetime import METRICS

    dt = jnp.float64
    el = np.deg2rad(elev)
    obs = jnp.asarray([28.0 * np.cos(el), 0.0, 28.0 * np.sin(el)], dt)
    params = jnp.asarray([1.0, spin, charge], dt)
    om = dt(omega_frac * float(keplerian_omega(28.0, 1.0, spin, charge)))
    pix = pixel_grid_lookat(obs, dt(np.deg2rad(70)), 6, 6, dtype=dt)
    _, p0, _ = boosted_ics_from_pixels(obs, pix, params=params,
                                       g_inv_fn=METRICS["KerrSchild"],
                                       omega_cam=om)
    g_inv = METRICS["KerrSchild"](jnp.concatenate(
        [jnp.zeros((1,), dt), obs]), params)
    pf = np.asarray(p0).reshape(-1, 4)
    h_val = 0.5 * np.einsum("ni,ij,nj->n", pf, np.asarray(g_inv), pf)
    assert np.abs(h_val).max() < 1e-12
