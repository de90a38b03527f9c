"""Multi-chip sharding on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace import IntegratorConfig, PatchConfig, SceneConfig
from grtrace.engine.render import render_pixels
from grtrace.sharding.mesh import make_mesh, orbit_frames, render_frames_sharded


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _reference_frame(bg, size, steps):
    f = jnp.float64
    return render_pixels(bg, f(30.0), f(np.radians(80.0)), f(1.0), f(31.0),
                         steps, f(0.1), f(1.0), f(np.pi / 2), f(np.pi),
                         f(np.pi), f(2 * np.pi), height=size, width=size,
                         dtype=jnp.float64)


@requires_8
@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (4, 2)])
def test_sharded_matches_single_device(mesh_shape):
    mesh = make_mesh(*mesh_shape)
    size, steps = 16, 1500
    rng = np.random.default_rng(0)
    bg = jnp.asarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8))
    F = 2 * mesh_shape[0]
    out = render_frames_sharded(
        mesh, bg, np.full(F, 30.0), np.radians(80.0), 1.0, 31.0, steps, 0.1,
        1.0, np.pi / 2, np.full(F, np.pi), np.pi, 2 * np.pi,
        height=size, width=size, dtype=jnp.float64)
    ref = _reference_frame(bg, size, steps)
    # scene must actually contain escaped + captured rays for this to be
    # a meaningful test
    assert set(np.unique(np.asarray(ref["cls"]))) >= {0, 2}
    for k in range(F):
        np.testing.assert_array_equal(np.asarray(out["cls"][k]),
                                      np.asarray(ref["cls"]))
        np.testing.assert_array_equal(np.asarray(out["image"][k]),
                                      np.asarray(ref["image"]))


@requires_8
def test_orbit_frames_rotate_patch():
    scene = SceneConfig(size=16,
                        integrator=IntegratorConfig(steps=1500, delta=0.1))
    obs, phis = orbit_frames(scene, 8)
    assert obs.shape == (8,)
    assert np.isclose(phis[0], scene.patch.center_phi % (2 * np.pi))
    # frames rotate monotonically (mod 2pi)
    assert len(np.unique(np.round(phis, 6))) == 8

    mesh = make_mesh(2, 4)
    bg = jnp.asarray(np.eye(16, dtype=np.uint8)[:, :, None] * 255
                     + np.zeros((16, 16, 3), np.uint8))
    out = render_frames_sharded(
        mesh, bg, obs, np.radians(80.0), 1.0, 31.0, 1500, 0.1, 1.0,
        np.pi / 2, phis, np.deg2rad(90), np.deg2rad(90),
        height=16, width=16, dtype=jnp.float64)
    imgs = np.asarray(out["image"])
    # different patch centers -> not all frames identical
    assert not all((imgs[0] == imgs[k]).all() for k in range(1, 8))


def test_graft_entry_single():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    img = np.asarray(out[0])
    assert img.shape == (64, 64, 3)


@requires_8
def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)


def test_render_kerr_sharded_matches_single_device():
    """Kerr frames over the full 8-device mesh == unsharded generic render."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from grtrace.engine.render import render
    from grtrace.io.scene import IntegratorConfig, PatchConfig, SceneConfig
    from grtrace.sharding.mesh import make_mesh, render_kerr_sharded

    size, steps, delta, spin = 16, 1500, 0.05, 0.8
    rng = np.random.default_rng(3)
    bg = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)

    mesh = make_mesh(2, 4)
    f32 = jnp.float64
    out = render_kerr_sharded(
        mesh, jnp.asarray(bg), jnp.full(2, 30.0, jnp.float64),
        f32(np.radians(80.0)), f32(1.0), f32(spin), f32(31.0), steps,
        f32(delta), f32(1.0), f32(np.pi / 2), jnp.full(2, np.pi, jnp.float64),
        f32(np.pi), f32(2 * np.pi),
        height=size, width=size, dtype=jnp.float64)
    assert out["image"].shape == (2, size, size, 3)
    # both frames identical parameters -> identical output
    assert (np.asarray(out["cls"][0]) == np.asarray(out["cls"][1])).all()

    scene = SceneConfig(
        size=size, fov_deg=80.0, observer_distance=30.0, boundary_radius=31.0,
        metric="KerrSchild", spin=spin,
        integrator=IntegratorConfig(steps=steps, delta=delta, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)
    res = render(scene, bg_array=bg)
    assert (np.asarray(out["cls"][0]) == np.asarray(res.cls)).all()
    assert (np.asarray(out["image"][0]) == np.asarray(res.image)).all()


def test_render_disk_sharded_matches_single_device():
    """Disk frames over the full 8-device mesh == the single-device disk
    pipeline (render_pixels_disk), pixel-for-pixel — the inclined look-at
    camera, crossing capture, shading and overlay all survive sharding."""
    import jax.numpy as jnp
    import numpy as np
    from grtrace.engine.disk import DiskConfig, render_disk
    from grtrace.io.scene import IntegratorConfig, PatchConfig, SceneConfig
    from grtrace.physics.orbits import isco_radius
    from grtrace.sharding.mesh import make_mesh, render_disk_sharded

    size, steps, delta, spin = 16, 1500, 0.05, 0.8
    rng = np.random.default_rng(7)
    bg = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    elev = np.deg2rad(12.0)
    r_in = float(isco_radius(1.0, spin))

    mesh = make_mesh(2, 4)
    f64 = jnp.float64
    out = render_disk_sharded(
        mesh, jnp.asarray(bg), jnp.full(2, 30.0, jnp.float64),
        f64(np.radians(80.0)), f64(1.0), f64(spin), f64(31.0), steps,
        f64(delta), f64(1.0), f64(elev), f64(r_in), f64(14.0),
        f64(9000.0), f64(2.5),
        f64(np.pi / 2), jnp.full(2, np.pi, jnp.float64),
        f64(np.pi), f64(2 * np.pi),
        height=size, width=size, dtype=jnp.float64)
    assert out["image"].shape == (2, size, size, 3)
    assert (np.asarray(out["cls"][0]) == np.asarray(out["cls"][1])).all()
    assert (np.asarray(out["cls"][0]) == 5).sum() > 5  # disk pixels exist

    scene = SceneConfig(
        size=size, fov_deg=80.0, observer_distance=30.0,
        boundary_radius=31.0, metric="kerr", spin=spin,
        integrator=IntegratorConfig(steps=steps, delta=delta, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)
    res = render_disk(scene, DiskConfig(), bg_array=bg)
    assert (np.asarray(out["cls"][0]) == np.asarray(res.cls)).all()
    assert (np.asarray(out["image"][0]) == np.asarray(res.image)).all()


def test_render_disk_sharded_novikov_profile_matches_single_device():
    """The Novikov-Thorne temperature table (a quadrature with autodiff
    orbit quantities) builds identically inside every shard — sharded
    frames equal the single-device novikov render pixel-for-pixel."""
    import jax.numpy as jnp
    import numpy as np
    from grtrace.engine.disk import DiskConfig, render_disk
    from grtrace.io.scene import IntegratorConfig, PatchConfig, SceneConfig
    from grtrace.physics.orbits import isco_radius
    from grtrace.sharding.mesh import make_mesh, render_disk_sharded

    size, steps, delta, spin = 16, 1500, 0.05, 0.8
    rng = np.random.default_rng(7)
    bg = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    elev = np.deg2rad(12.0)
    r_in = float(isco_radius(1.0, spin))

    mesh = make_mesh(2, 4)
    f64 = jnp.float64
    out = render_disk_sharded(
        mesh, jnp.asarray(bg), jnp.full(2, 30.0, jnp.float64),
        f64(np.radians(80.0)), f64(1.0), f64(spin), f64(31.0), steps,
        f64(delta), f64(1.0), f64(elev), f64(r_in), f64(14.0),
        f64(9000.0), f64(2.5),
        f64(np.pi / 2), jnp.full(2, np.pi, jnp.float64),
        f64(np.pi), f64(2 * np.pi),
        height=size, width=size, dtype=jnp.float64, profile="novikov")

    scene = SceneConfig(
        size=size, fov_deg=80.0, observer_distance=30.0,
        boundary_radius=31.0, metric="kerr", spin=spin,
        integrator=IntegratorConfig(steps=steps, delta=delta, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)
    res = render_disk(scene, DiskConfig(profile="novikov"), bg_array=bg)
    assert (np.asarray(out["cls"][0]) == np.asarray(res.cls)).all()
    assert (np.asarray(out["image"][0]) == np.asarray(res.image)).all()


def test_render_disk_sharded_boosted_camera_matches_single_device():
    """The orbiting camera survives sharding: the boosted tetrad ICs and
    the omega_obs receiver leg produce identical frames on the mesh and
    on one device (orbit --disk --camera-omega rides this path)."""
    import jax.numpy as jnp
    import numpy as np
    from grtrace.engine.disk import (DiskConfig, render_disk,
                                     resolve_camera_omega)
    from grtrace.io.scene import IntegratorConfig, PatchConfig, SceneConfig
    from grtrace.physics.orbits import isco_radius
    from grtrace.sharding.mesh import make_mesh, render_disk_sharded

    size, steps, delta, spin = 16, 1500, 0.05, 0.9
    rng = np.random.default_rng(11)
    bg = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    elev = np.deg2rad(12.0)
    r_in = float(isco_radius(1.0, spin))

    scene = SceneConfig(
        size=size, fov_deg=80.0, observer_distance=30.0,
        boundary_radius=31.0, metric="kerr", spin=spin,
        integrator=IntegratorConfig(steps=steps, delta=delta, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)
    disk = DiskConfig(camera_omega="zamo")
    moving, cam_omega = resolve_camera_omega(scene, disk)
    assert moving and cam_omega != 0.0

    mesh = make_mesh(2, 4)
    f64 = jnp.float64
    out = render_disk_sharded(
        mesh, jnp.asarray(bg), jnp.full(2, 30.0, jnp.float64),
        f64(np.radians(80.0)), f64(1.0), f64(spin), f64(31.0), steps,
        f64(delta), f64(1.0), f64(elev), f64(r_in), f64(14.0),
        f64(9000.0), f64(2.5),
        f64(np.pi / 2), jnp.full(2, np.pi, jnp.float64),
        f64(np.pi), f64(2 * np.pi), f64(cam_omega),
        height=size, width=size, dtype=jnp.float64,
        camera_moving=True)

    res = render_disk(scene, disk, bg_array=bg)
    assert (np.asarray(out["cls"][0]) == 5).sum() > 5
    assert (np.asarray(out["cls"][0]) == np.asarray(res.cls)).all()
    assert (np.asarray(out["image"][0]) == np.asarray(res.image)).all()


def test_render_rotating_regular_sharded_matches_single_device():
    """Rotating-Bardeen frames over the full 8-device mesh == the
    unsharded generic render — the mass-function families shard through
    the identical Cartesian-chart machinery (axisymmetry is all the
    orbit trick needs)."""
    import jax.numpy as jnp
    import numpy as np
    from grtrace.engine.render import render
    from grtrace.io.scene import IntegratorConfig, PatchConfig, SceneConfig
    from grtrace.sharding.mesh import make_mesh, render_kerr_sharded

    size, steps, delta, spin, g_reg = 16, 1200, 0.05, 0.8, 0.25
    rng = np.random.default_rng(5)
    bg = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)

    mesh = make_mesh(2, 4)
    f64 = jnp.float64
    out = render_kerr_sharded(
        mesh, jnp.asarray(bg), jnp.full(2, 30.0, jnp.float64),
        f64(np.radians(80.0)), f64(1.0), f64(spin), f64(31.0), steps,
        f64(delta), f64(1.0), f64(np.pi / 2),
        jnp.full(2, np.pi, jnp.float64), f64(np.pi), f64(2 * np.pi),
        height=size, width=size, dtype=jnp.float64, charge=g_reg,
        metric="RotatingBardeen")
    assert out["image"].shape == (2, size, size, 3)

    scene = SceneConfig(
        size=size, fov_deg=80.0, observer_distance=30.0,
        boundary_radius=31.0, metric="rotating-bardeen", spin=spin,
        metric_param=g_reg,
        integrator=IntegratorConfig(steps=steps, delta=delta, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)
    res = render(scene, bg_array=bg)
    assert (np.asarray(out["cls"][0]) == np.asarray(res.cls)).all()
    assert (np.asarray(out["image"][0]) == np.asarray(res.image)).all()
