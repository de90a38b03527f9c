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
