"""Real equirectangular panorama, exercised end-to-end.

Round 1 only ever rendered procedural/synthetic textures; the reference's
*default* background is a materialized 156 KB milky-way panorama
(reference config.py:8, images/backgrounds/milky-way-equirec.jpg).  These
tests load that actual file (guarded on the read-only reference mount
being present) and push it through the curved and flat pipelines, plus pin
the default-path resolution that makes `python -m grtrace.cli.main` work
from any cwd.
"""
import os

import numpy as np
import pytest

MILKY_WAY = "images/backgrounds/milky-way-equirec.jpg"
HAVE_REF = os.path.exists(os.path.join("/root/reference", MILKY_WAY))

needs_ref = pytest.mark.skipif(
    not HAVE_REF, reason="reference asset mount not present")


def test_resolve_relative_default_from_any_cwd(tmp_path, monkeypatch):
    """The reference's repo-relative default must resolve regardless of
    cwd (reference behavior: silently falls back when cwd != repo root)."""
    from grtrace.io import artifacts
    monkeypatch.chdir(tmp_path)
    resolved = artifacts.resolve_background(MILKY_WAY)
    if HAVE_REF:
        assert os.path.isabs(resolved) and os.path.exists(resolved)
        assert artifacts.background_available(MILKY_WAY)
    # a procedural spec always resolves
    assert artifacts.background_available("procedural:starfield")
    # absolute + existing paths pass through untouched
    p = tmp_path / "x.png"
    p.write_bytes(b"")
    assert artifacts.resolve_background(str(p)) == str(p)


def test_asset_path_env_resolution(tmp_path, monkeypatch):
    from grtrace.io import artifacts
    d = tmp_path / "assets"
    (d / "images").mkdir(parents=True)
    (d / "images" / "sky.png").write_bytes(b"")
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("GRTRACE_ASSET_PATH", str(d))
    assert artifacts.resolve_background("images/sky.png") == str(
        d / "images" / "sky.png")


@needs_ref
def test_milky_way_loads_and_resizes():
    from grtrace.io.artifacts import load_background
    tex = load_background(MILKY_WAY, size=(64, 64))
    assert tex.shape == (64, 64, 3) and tex.dtype == np.uint8
    # a real panorama: non-trivial dynamic range and many distinct colors
    assert tex.max() > 100 and len(np.unique(tex.reshape(-1, 3), axis=0)) > 50


@needs_ref
def test_curved_render_with_milky_way():
    """Full curved render compositing the reference's actual default sky."""
    from grtrace import IntegratorConfig, PatchConfig, SceneConfig, render
    from grtrace.io.artifacts import load_background

    tex = load_background(MILKY_WAY, size=(64, 64))
    scene = SceneConfig(
        size=64, fov_deg=80.0, background=MILKY_WAY, bh_mass=1.0,
        boundary_radius=31.0, observer_distance=30.0,
        integrator=IntegratorConfig(steps=4000, delta=0.05, omega=1.0,
                                    backend="xla"),
        patch=PatchConfig(), n_samples=0)
    res = render(scene, bg_array=tex)
    assert res.counts["captured"] > 0
    assert res.counts["numerical_error"] == 0
    assert res.counts["background"] == res.counts["escaped"]
    # the shadow is black, the sky carries real panorama texture
    from grtrace.engine.classify import CLS_ESCAPE_BG
    bg_px = res.image[np.asarray(res.cls) == CLS_ESCAPE_BG]
    assert bg_px.size > 0
    assert len(np.unique(bg_px.reshape(-1, 3), axis=0)) > 20
    assert bg_px.mean() > 5.0


@needs_ref
def test_flat_render_with_milky_way(tmp_path):
    """Flat (no-gravity) path with the real panorama; the full-sphere phi
    patch is degenerate by reference parity (_in_phi_patch with
    phi0 == phi1 mod 2pi, background.py:8-17), so probe with a 340-degree
    patch."""
    from grtrace.engine.flat import flat_render_scene
    from grtrace.io.artifacts import load_background
    from grtrace.io.scene import Observer

    tex = load_background(MILKY_WAY, size=(64, 64))
    obs = Observer(position=(30.0, 0.0, 0.0), fov=np.radians(80.0),
                   image_size=(64, 64))
    img, _trajs = flat_render_scene(
        obs, tex, boundary_radius=31.0,
        patch_center_theta=np.pi / 2, patch_center_phi=np.pi,
        patch_size_theta=np.pi, patch_size_phi=np.radians(340.0),
        override_patch_center=True, n_sampled=0)
    img = np.asarray(img)
    assert img.shape == (64, 64, 3)
    assert img.mean() > 5.0 and len(
        np.unique(img.reshape(-1, 3), axis=0)) > 20
