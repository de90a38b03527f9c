"""Geodesic transfer maps (io/transfer.py): persistence + exact reshading.

The load-bearing property is bit-exactness: reshading a saved map with
the trace-time knobs must reproduce the original render, and reshading
with NEW knobs must equal a fresh render traced with those knobs — the
crossing invariants fully determine every shading product.  All
comparisons here are therefore equalities, not tolerances (CPU/f64; the
reshade program calls the same shade_disk/polarization_fields the
full-frame program does, on identical saved inputs).
"""
import os

import numpy as np
import pytest

from grtrace import IntegratorConfig, PatchConfig, SceneConfig
from grtrace.engine.disk import DiskConfig, render_disk
from grtrace.engine.hotspot import HotspotConfig, render_hotspot
from grtrace.io.transfer import (TransferMap, hotspot_from_transfer,
                                 reshade)

SIZE = 32
STEPS = 2500
DELTA = 0.1
SPIN = 0.7


def _scene():
    return SceneConfig(size=SIZE, metric="kerr", spin=SPIN, n_samples=0,
                       integrator=IntegratorConfig(steps=STEPS, delta=DELTA,
                                                   dtype="float64"),
                       patch=PatchConfig())


def _bg():
    return np.full((SIZE, SIZE, 3), 120, np.uint8)


@pytest.fixture(scope="module")
def base():
    scene = _scene()
    disk = DiskConfig(r_out=10.0)
    res = render_disk(scene, disk, bg_array=_bg())
    tm = TransferMap.from_result(res, scene, disk)
    return scene, disk, res, tm


def test_roundtrip(base, tmp_path):
    _, _, _, tm = base
    path = tmp_path / "t.npz"
    tm.save(path)
    tm2 = TransferMap.load(path)
    for f in ("status", "hit_q", "hit_p", "image", "params", "obs_pos"):
        np.testing.assert_array_equal(getattr(tm, f), getattr(tm2, f),
                                      err_msg=f)
    assert (tm.fov, tm.r_in, tm.r_out, tm.prograde) == \
           (tm2.fov, tm2.r_in, tm2.r_out, tm2.prograde)
    assert tm.meta == tm2.meta
    assert tm2.meta["steps"] == STEPS and tm2.meta["profile"] == "shakura"


def test_newer_format_rejected(base, tmp_path):
    _, _, _, tm = base
    import dataclasses
    bad = dataclasses.replace(tm, meta=dict(tm.meta, format=999))
    path = tmp_path / "future.npz"
    bad.save(path)
    with pytest.raises(ValueError, match="newer"):
        TransferMap.load(path)


def test_reshade_identity(base):
    """Trace-time knobs -> the original render, bit for bit."""
    _, _, res, tm = base
    r2 = reshade(tm)
    np.testing.assert_array_equal(r2.image, res.image)
    np.testing.assert_array_equal(np.asarray(r2.device("redshift")),
                                  np.asarray(res.device("redshift")))
    assert r2.counts["disk"] == res.counts["disk"] > 0


def test_reshade_new_knobs_match_fresh_trace(base):
    """Novikov-Thorne + hotter peak from the saved map == a fresh render
    traced with those knobs (capture is shading-independent)."""
    scene, _, _, tm = base
    direct = render_disk(scene,
                         DiskConfig(r_out=10.0, profile="novikov",
                                    t_peak=12000.0, exposure=1.8),
                         bg_array=_bg())
    r2 = reshade(tm, profile="novikov", t_peak=12000.0, exposure=1.8)
    np.testing.assert_array_equal(r2.image, direct.image)
    np.testing.assert_array_equal(np.asarray(r2.device("redshift")),
                                  np.asarray(direct.device("redshift")))


def test_polarized_reshade_matches_fresh_trace(base):
    """EVPA maps for a bfield chosen AFTER tracing: the camera rays are
    recomputed from saved geometry, so the screen solve is identical."""
    scene, _, _, tm = base
    assert tm.meta["bfield"] is None            # map saved unpolarized
    direct = render_disk(scene,
                         DiskConfig(r_out=10.0, bfield="toroidal"),
                         bg_array=_bg())
    r2 = reshade(tm, bfield="toroidal")
    for f in ("evpa", "pol_weight", "pol_check"):
        np.testing.assert_array_equal(np.asarray(r2.device(f)),
                                      np.asarray(direct.device(f)),
                                      err_msg=f)


def test_retrograde_reshade_matches_fresh_trace(base):
    """Emitter-flow flip is a pure shading choice at fixed annulus."""
    scene, _, _, tm = base
    direct = render_disk(scene,
                         DiskConfig(r_in=tm.r_in, r_out=10.0,
                                    prograde=False),
                         bg_array=_bg())
    r2 = reshade(tm, prograde=False)
    np.testing.assert_array_equal(r2.image, direct.image)
    g2 = np.asarray(r2.device("redshift"))
    np.testing.assert_array_equal(g2, np.asarray(direct.device("redshift")))
    # and it genuinely flips the Doppler pattern
    g1 = np.asarray(reshade(tm).device("redshift"))
    dm = tm.status == 3
    assert np.abs(g1[dm] - g2[dm]).max() > 1e-3


def test_hotspot_from_transfer_matches_direct(base):
    scene, disk, _, tm = base
    hs = HotspotConfig(n_frames=4, sigma=0.6)
    direct = render_hotspot(scene, disk, hs, bg_array=_bg())
    via_tm = hotspot_from_transfer(tm, hs)
    np.testing.assert_array_equal(via_tm["frames"], direct["frames"])
    np.testing.assert_array_equal(via_tm["flux"], direct["flux"])
    assert via_tm["period"] == direct["period"]


def test_cli_roundtrip(tmp_path):
    """main --disk --save-transfer -> reshade CLI -> artifacts."""
    from grtrace.cli import main as cli_main
    from grtrace.cli import reshade as cli_reshade

    tpath = str(tmp_path / "scene.transfer.npz")
    out1 = str(tmp_path / "trace")
    cli_main.main(["--size", "24", "--steps", "1500", "--delta", "0.1",
                   "--dtype", "float64", "--metric", "kerr", "--spin",
                   "0.7", "--disk", "--disk-r-out", "10",
                   "--background", "checker", "--n-samples", "0",
                   "--no-plots", "--out-dir", out1,
                   "--save-transfer", tpath])
    assert os.path.exists(tpath)

    out2 = str(tmp_path / "reshade")
    cli_reshade.main(["--transfer", tpath, "--disk-profile", "novikov",
                      "--disk-emissivity", "2", "4",
                      "--out-dir", out2])
    for f in ("manual_output.png", "redshift_map.csv", "redshift_map.png",
              "q4/redshift_map.csv"):
        assert os.path.exists(os.path.join(out2, f)), f

    # hotspot CLI from the same map, no retrace
    from grtrace.cli import hotspot as cli_hotspot
    out3 = str(tmp_path / "hs")
    cli_hotspot.main(["--transfer", tpath, "--frames", "3", "--no-gif",
                      "--out-dir", out3])
    assert os.path.exists(os.path.join(out3, "lightcurve.csv"))


def test_save_transfer_requires_disk():
    from grtrace.cli import main as cli_main
    with pytest.raises(SystemExit, match="--disk"):
        cli_main.main(["--size", "8", "--steps", "10", "--no-plots",
                       "--save-transfer", "/tmp/never.npz"])


def test_reshade_byte_exact_charged_kerr_newman(tmp_path):
    """Round-3 verdict item 1, pinned: a Kerr-Newman (a=0.5, q=0.4) disk
    transfer map must reshade byte-exactly.  Two defects hid here: (a)
    render_disk resolved the ISCO WITHOUT the charge while
    TransferMap.from_result resolved it WITH it, so the reshade shaded
    against a 7%-smaller r_in (Kerr 4.233 vs exact charged 3.923) —
    visible as +-8 color steps on inner-edge pixels; (b) render and
    reshade shaded through two different jitted programs, leaving the
    byte contract at the mercy of cross-program XLA fusion choices.
    Both paths now resolve r_in identically and share ONE jitted shading
    executable (engine.disk.shading_program)."""
    import numpy as np

    from grtrace import IntegratorConfig, PatchConfig, SceneConfig
    from grtrace.engine.disk import DiskConfig, render_disk
    from grtrace.io.transfer import TransferMap, reshade

    scene = SceneConfig(
        size=12, metric="kerr", spin=0.5, charge=0.4, n_samples=0,
        integrator=IntegratorConfig(steps=1500, delta=0.1, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig())
    disk = DiskConfig(r_out=9.0, elevation_deg=5.0)
    # trace-time and save-time inner edges must agree (the exact charged
    # ISCO, not the Kerr closed form)
    assert disk.inner_edge(1.0, 0.5, 0.4) < disk.inner_edge(1.0, 0.5)

    res = render_disk(scene, disk, bg_array=None)
    tm = TransferMap.from_result(res, scene, disk)
    assert tm.r_in == disk.inner_edge(1.0, 0.5, 0.4)
    path = tmp_path / "t.npz"
    tm.save(path)
    r2 = reshade(TransferMap.load(path))
    np.testing.assert_array_equal(r2.image, res.image)
    np.testing.assert_array_equal(np.asarray(r2.device("redshift")),
                                  np.asarray(res.device("redshift")))
