"""Line-profile grid sweeps (sharding/grid.py + cli/line_grid.py).

Correctness anchor: the sharded histogram must equal a plain NumPy
histogram of a single-device disk render's (g, r_em) data with the same
bucket rule — same camera, same engine, same weights.  Mesh-shape
invariance then pins the collective layout, and the physics tests pin
the two monotonicities the diagnostic exists for (red wing vs spin,
blue horn vs inclination).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grtrace.sharding.grid import g_bin_centers, line_profile_grid_sharded
from grtrace.sharding.mesh import make_mesh

SIZE = 24
STEPS = 2000
DELTA = 0.1
R_OUT = 12.0
BINS = 48
G_LO, G_HI = 0.1, 1.6


def _sweep(mesh, spins, elevs, emissivity=(3.0,)):
    return np.asarray(line_profile_grid_sharded(
        mesh, np.asarray(spins, np.float64), np.asarray(elevs, np.float64),
        30.0, np.deg2rad(80.0), 1.0, 0.0, 31.0, STEPS, DELTA, 1.0, R_OUT,
        height=SIZE, width=SIZE, dtype=jnp.float64, n_bins=BINS,
        emissivity=emissivity, g_lo=G_LO, g_hi=G_HI), np.float64)


def test_matches_single_device_render_histogram():
    """Sharded psum histogram == NumPy histogram of a full disk render."""
    from grtrace import IntegratorConfig, PatchConfig, SceneConfig
    from grtrace.engine.disk import DiskConfig, render_disk

    spin, elev_deg, q = 0.9, 30.0, 3.0
    mesh = make_mesh(1, 8)
    hist = _sweep(mesh, [spin], [np.deg2rad(elev_deg)],
                  emissivity=(q,))[0, 0]

    scene = SceneConfig(size=SIZE, metric="kerr", spin=spin, n_samples=0,
                        integrator=IntegratorConfig(steps=STEPS,
                                                    delta=DELTA,
                                                    dtype="float64"),
                        patch=PatchConfig())
    res = render_disk(scene, DiskConfig(r_out=R_OUT,
                                        elevation_deg=elev_deg),
                      bg_array=None)
    g = np.asarray(res.device("redshift")).ravel()
    status = np.asarray(res.device("status")).ravel()
    hq = np.asarray(res.device("hit_q")).reshape(-1, 4)
    dm = status == 3
    # identical bucket rule: floor((g - lo)/dg), drop out-of-range
    from grtrace.physics.spacetime import ks_radius
    r_em = np.asarray(jax.vmap(
        lambda x, y, z: ks_radius(x, y, z, jnp.float64(spin)))(
        jnp.asarray(hq[:, 1]), jnp.asarray(hq[:, 2]), jnp.asarray(hq[:, 3])))
    keep = dm & (g >= G_LO) & (g < G_HI)
    b = np.floor((g - G_LO) / ((G_HI - G_LO) / BINS)).astype(int)
    ref = np.zeros(BINS)
    np.add.at(ref, np.clip(b[keep], 0, BINS - 1),
              (g ** 4 * r_em ** -q)[keep])
    # the sharded camera builds pixels by flat index
    # (pixel_positions_for_indices_lookat) vs the full grid
    # (pixel_grid_lookat): same math, ulp-level float differences ->
    # trajectories agree to ~1e-13, so compare at that scale
    np.testing.assert_allclose(hist, ref, rtol=1e-9, atol=1e-12)
    assert hist.sum() > 0


def test_mesh_shape_invariance():
    spins = [0.0, 0.5, 0.9, 0.9]
    elevs = np.deg2rad([15.0, 15.0, 15.0, 45.0])
    h18 = _sweep(make_mesh(1, 8), spins, elevs)
    h24 = _sweep(make_mesh(2, 4), spins, elevs)
    h41 = _sweep(make_mesh(4, 2), spins, elevs)
    np.testing.assert_allclose(h18, h24, rtol=1e-12)
    np.testing.assert_allclose(h18, h41, rtol=1e-12)


def test_red_wing_extends_with_spin_blue_horn_with_inclination():
    mesh = make_mesh(1, 8)
    spins = [0.0, 0.9, 0.9, 0.9]
    elevs = np.deg2rad([30.0, 30.0, 75.0, 15.0])
    h = _sweep(mesh, spins, elevs)[:, 0]
    c = g_bin_centers(BINS, G_LO, G_HI)

    def support(prof):
        s = c[prof > 0]
        return s.min(), s.max()

    lo0, _ = support(h[0])          # a=0
    lo9, _ = support(h[1])          # a=0.9, same view
    assert lo9 < lo0                # smaller ISCO -> longer red wing

    _, hi_face = support(h[2])      # elev 75 deg above plane (face-on-ish)
    _, hi_edge = support(h[3])      # elev 15 deg (edge-on-ish)
    assert hi_edge > hi_face        # line-of-sight Doppler boost


def test_emissivity_shares_geodesics():
    """q only reweights: support is q-independent, steeper q reddens the
    flux-weighted mean (inner disk is redder on near-face-on views)."""
    mesh = make_mesh(1, 8)
    h = _sweep(mesh, [0.9], [np.deg2rad(60.0)], emissivity=(2.0, 4.0))[0]
    c = g_bin_centers(BINS, G_LO, G_HI)
    np.testing.assert_array_equal(h[0] > 0, h[1] > 0)
    mean2 = (c * h[0]).sum() / h[0].sum()
    mean4 = (c * h[1]).sum() / h[1].sum()
    assert mean4 < mean2


def test_cli_artifacts(tmp_path):
    from grtrace.cli import line_grid as cli

    out = str(tmp_path)
    cli.main(["--spins", "0", "0.9", "--inclinations", "30", "60",
              "--size", "16", "--steps", "1500", "--delta", "0.1",
              "--dtype", "float64", "--disk-r-out", "10",
              "--bins", "32", "--emissivity", "2", "3",
              "--out-dir", out])
    csv = np.genfromtxt(os.path.join(out, "line_grid.csv"), delimiter=",",
                        names=True)
    assert csv.size == 2 * 2 * 2 * 32          # spins x incl x q x bins
    assert os.path.exists(os.path.join(out, "line_grid.png"))
    # every profile normalized to peak 1
    flux = csv["relative_flux"].reshape(8, 32)
    assert np.allclose(flux.max(axis=1), 1.0)


def test_cli_fisher_map(tmp_path):
    """--fisher adds the Fisher-forecast artifacts, with the inclination
    sign convention applied (sigma in deg, corr flipped vs elevation)."""
    from grtrace.cli import line_grid as cli

    out = str(tmp_path)
    cli.main(["--spins", "0.3", "0.9", "--inclinations", "30", "60",
              "--size", "16", "--steps", "800", "--delta", "0.1",
              "--dtype", "float64", "--bins", "24", "--no-plot",
              "--fisher", "0.01", "--out-dir", out])
    csv = np.genfromtxt(os.path.join(out, "fisher_grid.csv"),
                        delimiter=",", names=True)
    assert csv.size == 4
    assert (csv["sigma_spin"] > 0).all()
    assert (csv["sigma_inclination_deg"] > 0).all()
    assert (np.abs(csv["correlation_spin_incl"]) < 1.0).all()
    # the map's robust physics: a more inclined disk spreads the line
    # over more Doppler structure, so spin is better constrained at
    # i=60 than i=30 at BOTH spins.  (High spin is NOT uniformly better
    # constrained — at (0.9, 30) the spin-incl degeneracy, corr ~ -0.87,
    # inflates the marginalized error; that is exactly what this map is
    # for.)
    for a in (0.3, 0.9):
        face = csv["sigma_spin"][(csv["spin"] == a)
                                 & (csv["inclination_deg"] == 30)]
        edge = csv["sigma_spin"][(csv["spin"] == a)
                                 & (csv["inclination_deg"] == 60)]
        assert edge < face


def test_naked_singularity_rejected():
    from grtrace.cli import line_grid as cli
    with pytest.raises(SystemExit, match="naked"):
        cli.main(["--spins", "1.2", "--inclinations", "30"])
