"""Semi-analytic disk renderer vs the traced disk engine.

The two pipelines share ONLY the shading core
(disk.shade_disk_constants) and the camera; the crossing physics is
computed two entirely different ways (20k-step symplectic integration
vs separated-Hamiltonian quadrature).  Agreement is therefore a
whole-pipeline cross-validation: the disk MASKS must be identical
pixel-for-pixel and the redshift factors equal to the integrator's
crossing-discretization floor.
"""
import numpy as np
import pytest

from grtrace import IntegratorConfig, PatchConfig, SceneConfig
from grtrace.engine.disk import CLS_DISK, DiskConfig, render_disk
from grtrace.engine.render_exact import render_disk_exact


@pytest.fixture(scope="module")
def scene_pair():
    scene = SceneConfig(size=40, metric="kerr", spin=0.7, n_samples=0,
                        integrator=IntegratorConfig(steps=20_000,
                                                    delta=0.02),
                        patch=PatchConfig())
    disk = DiskConfig(elevation_deg=25.0, show_background=False)
    traced = render_disk(scene, disk)
    exact = render_disk_exact(scene, disk, n_orders=3)
    return scene, disk, traced, exact


def test_disk_masks_agree(scene_pair):
    scene, _, traced, exact = scene_pair
    hw = exact["shape"]
    m_tr = np.asarray(traced.device("cls")).reshape(hw) == CLS_DISK
    m_ex = np.asarray(exact["g"]).reshape(hw) > 0.0
    assert m_tr.sum() > 100          # the scene really shows disk
    # identical classification: the exact solver finds the same first
    # in-annulus crossing the tracer does, every pixel (a 1-2 pixel
    # edge disagreement would indicate a convention drift)
    assert (m_tr ^ m_ex).sum() <= 1, (m_tr.sum(), m_ex.sum())


def test_redshift_parity(scene_pair):
    _, _, traced, exact = scene_pair
    hw = exact["shape"]
    m = (np.asarray(traced.device("cls")).reshape(hw) == CLS_DISK) \
        & (np.asarray(exact["g"]).reshape(hw) > 0.0)
    g_tr = np.asarray(traced.device("redshift")).reshape(hw)[m]
    g_ex = np.asarray(exact["g"]).reshape(hw)[m]
    dg = np.abs(g_tr - g_ex)
    # the tracer locates each crossing to O(delta * |dr/dlambda|); its
    # g follows; the exact value is inside that envelope
    assert dg.max() < 1e-4, dg.max()
    assert np.median(dg) < 3e-6


def test_emission_radius_parity(scene_pair):
    from grtrace.physics.spacetime import ks_radius

    scene, _, traced, exact = scene_pair
    hw = exact["shape"]
    m = (np.asarray(traced.device("cls")).reshape(hw) == CLS_DISK) \
        & (np.asarray(exact["g"]).reshape(hw) > 0.0)
    hq = np.asarray(traced.device("hit_q")).reshape(hw + (4,))[m]
    r_tr = np.asarray(ks_radius(hq[:, 1], hq[:, 2], hq[:, 3],
                                scene.spin))
    r_ex = np.asarray(exact["r_em"]).reshape(hw)[m]
    assert np.abs(r_tr - r_ex).max() < 2e-3


def test_higher_orders_present():
    """With a widened inner gap, some pixels shade from the k >= 1
    crossing (the far underside seen through the gap) — the exact
    table's per-order layering at work (measured: 2 such pixels at
    this tiny scene, 16 at lower elevation)."""
    scene = SceneConfig(size=40, metric="kerr", spin=0.7, n_samples=0,
                        integrator=IntegratorConfig(steps=1000,
                                                    delta=0.02),
                        patch=PatchConfig())
    exact = render_disk_exact(scene, DiskConfig(
        elevation_deg=8.0, show_background=False), n_orders=3)
    order = np.asarray(exact["order"])
    assert (order == 0).sum() > 50
    assert (order >= 1).sum() > 0


def test_cli_exact(tmp_path):
    import json

    from grtrace.cli.exact import main

    metrics = main(["--size", "32", "--spin", "0.7", "--elevation",
                    "25", "--compare", "--steps", "12000",
                    "--out-dir", str(tmp_path)])
    json.dumps(metrics)
    for f in ["exact_disk.png", "exact_g_map.csv", "exact_r_em.csv"]:
        assert (tmp_path / f).exists(), f
    assert metrics["disk_pixels"] > 50
    assert metrics["mask_mismatch_pixels"] <= 1
    assert metrics["dg_max"] < 1e-3
