"""Kerr full-frame rendering (engine.render_generic) — beyond-reference
capability; the reference pipeline is Schwarzschild-only
(simulation/cuda_geodesic.py:432-447)."""
import numpy as np
import pytest

from grtrace.engine.render import render
from grtrace.io.scene import IntegratorConfig, PatchConfig, SceneConfig


def _scene(spin, size=24, steps=8000, delta=0.02):
    # delta=0.02: near-axis rays turn very close to the Boyer-Lindquist
    # polar coordinate singularity; coarser fixed steps overshoot the theta
    # turning point and blow up (honestly flagged as 'numerical error' by
    # the r>=100 failure detector, reference raytracing.py:213-215).
    return SceneConfig(
        size=size, fov_deg=80.0, observer_distance=30.0, boundary_radius=31.0,
        metric="kerr-bl", spin=spin,
        integrator=IntegratorConfig(steps=steps, delta=delta, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)


def test_kerr_render_basic():
    tex = np.full((32, 32, 3), 180, np.uint8)
    res = render(_scene(0.9), bg_array=tex)
    assert res.image.shape == (24, 24, 3)
    c = res.counts
    assert c["captured"] > 0
    assert c["escaped"] > 0
    assert c["numerical_error"] == 0
    assert c["escaped"] == c["background"]  # full-sphere patch
    assert c["captured"] + c["escaped"] + c["in_domain"] == 24 * 24


def test_kerr_spin_changes_shadow():
    """The shadow must differ between a=0 and a=0.95 (frame dragging makes
    it asymmetric and slightly smaller in area)."""
    r0 = render(_scene(0.0))
    r9 = render(_scene(0.95))
    assert r0.counts["captured"] != r9.counts["captured"]
    # and the captured masks differ pixelwise, not just in count
    assert (np.asarray(r0.cls) != np.asarray(r9.cls)).any()


def test_kerr_shadow_asymmetry():
    """At high spin the equatorial shadow profile is left-right asymmetric
    (prograde photons approach closer); at a=0 it is symmetric."""
    def lr_asym(res, size):
        cap = (np.asarray(res.cls) == 0)
        mid = cap[size // 2]            # equatorial row
        return int(mid[: size // 2].sum()) - int(mid[size // 2:].sum())

    size = 32
    r0 = render(_scene(0.0, size=size))
    r9 = render(_scene(0.95, size=size))
    assert lr_asym(r0, size) == 0
    assert lr_asym(r9, size) != 0


def test_numerical_error_flagging_at_coarse_delta():
    """Coarse fixed steps near the BL polar singularity blow up — but the
    Kerr family is integrable, so the guard-parked rays are reclassified
    EXACTLY from their conserved quantities (the analytic Bardeen rescue,
    BL front-end): the frame composites with zero 'numerical error'
    pixels where the pre-rescue engine honestly flagged a few near-axis
    rays red, and every pixel lands in a real class."""
    res = render(_scene(0.9, steps=3000, delta=0.05))
    c = res.counts
    assert c["numerical_error"] == 0
    assert c["captured"] + c["escaped"] + c["in_domain"] == 24 * 24


def test_kerr_a0_counts_match_schwarzschild_radius_capture():
    """At a=0 the generic path must classify like the Schwarzschild engine
    with the analytic b_crit shortcut removed: every generically-captured
    pixel is also captured by the fast path (the shortcut only ADDS
    captures), and escape sets agree."""
    sc_kerr = _scene(0.0)
    res_k = render(sc_kerr)

    sc_schw = SceneConfig(
        size=24, fov_deg=80.0, observer_distance=30.0, boundary_radius=31.0,
        integrator=IntegratorConfig(steps=8000, delta=0.02, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)
    res_s = render(sc_schw)

    cap_k = np.asarray(res_k.cls) == 0
    cap_s = np.asarray(res_s.cls) == 0
    assert (cap_s | ~cap_k).all()          # cap_k subset of cap_s
    assert res_k.counts["numerical_error"] == 0


def test_cli_spin_requires_kerr():
    from grtrace.cli.args import parse_args, scene_from_args
    with pytest.raises(SystemExit):
        scene_from_args(parse_args(["--spin", "0.5"]))
    sc = scene_from_args(parse_args(["--metric", "kerr", "--spin", "0.5"]))
    assert sc.metric == "KerrSchild"   # kerr maps to the best-numerics chart
    assert sc.spin == 0.5
    sc = scene_from_args(parse_args(["--metric", "kerr-bl", "--spin", "0.5"]))
    assert sc.metric == "kerr-bl"


def test_library_metric_kerr_routes_to_ks_chart(monkeypatch):
    """SceneConfig(metric='kerr') must render through the Kerr-Schild
    chart exactly like the CLI's --metric kerr; 'kerr-bl' opts into the
    Boyer-Lindquist chart.  Routing is observed directly (a spy on
    render_generic's metric argument) plus a pixel-identity check against
    the explicit 'KerrSchild' spelling."""
    import grtrace.engine.render_generic as rg
    from grtrace.io.scene import IntegratorConfig, PatchConfig, SceneConfig

    routed = []
    orig = rg.render_generic

    def spy(scene, *, metric, **kw):
        routed.append(metric)
        return orig(scene, metric=metric, **kw)

    monkeypatch.setattr(rg, "render_generic", spy)

    def scene(metric):
        return SceneConfig(
            size=16, fov_deg=60.0, observer_distance=30.0,
            boundary_radius=31.0, metric=metric, spin=0.8,
            integrator=IntegratorConfig(steps=3000, delta=0.05, omega=1.0,
                                        backend="xla", dtype="float64"),
            patch=PatchConfig(), n_samples=0)

    r_kerr = render(scene("kerr"))
    r_ks = render(scene("KerrSchild"))
    render(scene("kerr-bl"))
    assert routed == ["KerrSchild", "KerrSchild", "Kerr"]
    assert r_kerr.counts == r_ks.counts
    np.testing.assert_array_equal(r_kerr.cls, r_ks.cls)


def test_sampled_trajectories_respect_guard():
    """The diagnostic sampler applies the SAME blow-up guard as the render
    integrator: a ray the image flags 'numerical error' must freeze at the
    parked sentinel (r = 150) in sampled_rays too, not record its
    unphysical ejection."""
    res = render(_scene(0.9, size=16, steps=3000, delta=0.05),
                 n_samples=16 * 16, seed=0)
    radii = [np.linalg.norm(t, axis=1).max() for t in res.sampled_trajectories]
    assert max(radii) <= 150.5


def test_alive_rays_never_classified_captured():
    """On the generic path the capture verdict belongs to the INTEGRATOR
    (status-pinned), never to the classifier's radius threshold: a
    budget-exhausted ALIVE ray frozen just above the capture shell must
    classify 'in_domain'.  Regression for the rs_classify band where the
    single-device and sharded Kerr renderers used different thresholds."""
    sc = SceneConfig(
        size=32, fov_deg=80.0, observer_distance=30.0, boundary_radius=31.0,
        metric="KerrSchild", spin=0.9,
        integrator=IntegratorConfig(steps=700, delta=0.05, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)
    res = render(sc)
    cls = np.asarray(res.cls)
    status = np.asarray(res.status)
    alive = status == 0
    assert alive.any()                      # the budget does leave stragglers
    assert (cls[alive] == 4).all()          # CLS_IN_DOMAIN
    assert ((cls == 0) <= (status == 1)).all()   # BH pixels <=> captured


def test_kerr_sampled_trajectories():
    """Sampled-ray diagnostics on the generic path: same surface as the
    Schwarzschild sampler (list of (n_pts, 3) Cartesian trajectories)."""
    res = render(_scene(0.9, size=16, steps=2000), n_samples=4, seed=1)
    assert res.sampled_indices.shape == (4, 2)
    assert len(res.sampled_trajectories) == 4
    for t in res.sampled_trajectories:
        assert t.ndim == 2 and t.shape[1] == 3
        assert np.isfinite(t).all()
        keep = ~np.all(t == 0, axis=1)
        pts = t[keep]
        assert len(pts) > 2
        r0 = np.linalg.norm(pts[0])
        assert 29.0 < r0 < 31.0          # starts at the observer
