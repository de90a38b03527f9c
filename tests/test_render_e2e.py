"""End-to-end render invariants on a small scene (CPU, float64)."""
import numpy as np

from grtrace import IntegratorConfig, PatchConfig, SceneConfig, render


def small_scene(size=24, steps=4000):
    return SceneConfig(
        size=size, fov_deg=80.0, background=None, bh_mass=1.0,
        boundary_radius=31.0, observer_distance=30.0,
        integrator=IntegratorConfig(steps=steps, delta=0.1, omega=1.0,
                                    dtype="float64"),
        patch=PatchConfig(center_theta=np.pi / 2, center_phi=np.pi,
                          size_theta=np.deg2rad(180),
                          size_phi=np.deg2rad(360)),
        n_samples=0)


def test_render_shapes_and_counts():
    scene = small_scene()
    rng = np.random.default_rng(3)
    bg = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    res = render(scene, bg_array=bg)
    h = w = 24
    assert res.image.shape == (h, w, 3)
    assert res.cls.shape == (h, w)
    total = sum(res.counts[k] for k in
                ("captured", "in_domain", "escaped", "numerical_error"))
    assert total == h * w
    # center of the image is the shadow
    assert res.cls[h // 2, w // 2] == 0
    # a large fov corner ray escapes
    assert res.counts["escaped"] > 0
    # full-sphere patch: every escaped ray hits the background
    assert res.counts["background"] == res.counts["escaped"]


def test_shadow_is_round_and_centered():
    scene = small_scene(size=32)
    bg = np.full((32, 32, 3), 128, dtype=np.uint8)
    res = render(scene, bg_array=bg)
    shadow = res.cls == 0
    h = w = 32
    ii, jj = np.nonzero(shadow)
    # centroid at image center
    np.testing.assert_allclose(ii.mean(), (h - 1) / 2, atol=0.5)
    np.testing.assert_allclose(jj.mean(), (w - 1) / 2, atol=0.5)
    # 4-fold symmetry of the classification map
    np.testing.assert_array_equal(shadow, shadow[::-1, :])
    np.testing.assert_array_equal(shadow, shadow[:, ::-1])


def test_sampled_trajectories():
    scene = small_scene(size=8, steps=2000)
    scene.n_samples = 5
    res = render(scene, bg_array=None, seed=11)
    assert res.sampled_indices.shape == (5, 2)
    assert len(res.sampled_trajectories) == 5
    for traj in res.sampled_trajectories:
        assert traj.shape[1] == 3
        # first point is the observer
        np.testing.assert_allclose(traj[0], [30.0, 0.0, 0.0], atol=1e-8)


def test_no_background_render():
    scene = small_scene(size=12, steps=2000)
    res = render(scene, bg_array=None)
    assert res.counts["background"] == 0
    # image is black everywhere except numerical-error pixels
    non_red = res.cls != 1
    assert (res.image[non_red] == 0).all()
