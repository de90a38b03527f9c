"""Kerr-de Sitter: spin + cosmological constant.

physics/kerr_de_sitter.py plugs the Carter solution into the generic
autodiff engine with one g_inv.  Oracles, all independent:

  * exact limits: Lambda -> 0 == spacetime.kerr_g_inv component-for-
    component; a -> 0 == static_metrics.kottler_g_inv;
  * horizons vs np.roots of the Delta_r quartic;
  * the full render at Lambda = 0 must equal the kerr-bl render
    EXACTLY (same chart, same engine, and the KdS conserved-quantity
    rescue reduces to the Kerr quartic predicate);
  * the Kottler shadow phenomenology survives rotation: Lambda shrinks
    the static observer's apparent shadow (sin(alpha) carries
    sqrt(f(r_obs))).

No reference counterpart (Schwarzschild-only reference).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from grtrace.engine.render import render
from grtrace.io.scene import IntegratorConfig, SceneConfig
from grtrace.physics import kerr_de_sitter as kds
from grtrace.physics.spacetime import (COORDS, METRICS, horizon_radius,
                                       kerr_g_inv)
from grtrace.physics.static_metrics import kottler_g_inv

M = 1.0


def _rand_q(n, seed=2):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.stack([
        rng.uniform(0, 5, n), rng.uniform(2.5, 20, n),
        rng.uniform(0.3, 2.8, n), rng.uniform(0, 6, n)], axis=1))


def test_kerr_limit_exact():
    p = jnp.array([M, 0.8, 0.0])
    for q in _rand_q(8):
        np.testing.assert_allclose(
            np.asarray(kds.kerr_de_sitter_g_inv(q, p)),
            np.asarray(kerr_g_inv(q, p)), rtol=1e-12, atol=1e-14)


def test_kottler_limit_exact():
    lam = 1e-3
    p = jnp.array([M, 0.0, lam])
    for q in _rand_q(8, seed=4):
        np.testing.assert_allclose(
            np.asarray(kds.kerr_de_sitter_g_inv(q, p)),
            np.asarray(kottler_g_inv(q, jnp.array([M, lam, 0.0]))),
            rtol=1e-12, atol=1e-14)


def test_horizons_vs_quartic_roots():
    a, lam = 0.8, 1e-3
    p = jnp.array([M, a, lam])
    roots = np.roots([-lam / 3, 0.0, 1 - lam * a * a / 3, -2 * M, a * a])
    real = np.sort([r.real for r in roots
                    if abs(r.imag) < 1e-10 and r.real > 0])
    assert len(real) == 3           # r_-, r_+, r_c
    assert float(kds.kds_outer_horizon(p)) == pytest.approx(real[1],
                                                            abs=1e-6)
    assert float(kds.kds_cosmological_horizon(p)) == pytest.approx(
        real[2], abs=1e-6)
    # registry dispatch
    assert float(horizon_radius("KerrDS", M, a, lam)) == pytest.approx(
        real[1], abs=1e-6)
    assert "KerrDS" in METRICS and COORDS["KerrDS"] == "spherical"


def test_escape_pred_reduces_to_kerr_quartic():
    """Lambda = 0: the KdS predicate must agree ray-for-ray with the
    Kerr-Newman BL quartic predicate on real camera rays."""
    from grtrace.engine.integrate_ks import bardeen_escape_pred_bl
    from grtrace.physics.camera import camera_rays_unfolded

    p = jnp.array([M, 0.8, 0.0], jnp.float64)
    q0, p0, _ = camera_rays_unfolded(
        jnp.array([30.0, 0.0, 0.0], jnp.float64), jnp.radians(80.0),
        12, 12, params=p, g_inv_fn=METRICS["KerrDS"], dtype=jnp.float64)
    q0f, p0f = q0.reshape(-1, 4), p0.reshape(-1, 4)
    pred_kds = np.asarray(kds.kds_escape_pred(q0f, p0f, p))
    pred_kerr = np.asarray(bardeen_escape_pred_bl(
        q0f, p0f, p[0], p[1], jnp.zeros(())))
    np.testing.assert_array_equal(pred_kds, pred_kerr)


def _render(metric, spin, p1, size=32):
    scene = SceneConfig(size=size, metric=metric, spin=spin,
                        metric_param=p1, n_samples=0,
                        integrator=IntegratorConfig(steps=2500, delta=0.05,
                                                    dtype="float64"))
    bg = np.full((16, 16, 3), 100, np.uint8)
    return render(scene, bg_array=bg)


def test_render_matches_kerr_bl_at_zero_lambda():
    """Same chart, same engine, and the rescue reduces exactly: the
    Lambda = 0 KdS render equals the kerr-bl render pixel-for-pixel."""
    res_kds = _render("kerr-ds", 0.8, 0.0)
    scene_bl = SceneConfig(size=32, metric="kerr-bl", spin=0.8,
                           n_samples=0,
                           integrator=IntegratorConfig(steps=2500,
                                                       delta=0.05,
                                                       dtype="float64"))
    res_bl = render(scene_bl, bg_array=np.full((16, 16, 3), 100,
                                               np.uint8))
    assert res_kds.counts == res_bl.counts
    assert (np.asarray(res_kds.device("status"))
            == np.asarray(res_bl.device("status"))).all()
    assert (res_kds.image == res_bl.image).all()


def test_render_lambda_shrinks_apparent_shadow():
    """The static observer's clock runs slow toward the cosmological
    horizon: sin(alpha_shadow) carries sqrt(f(r_obs)), so Lambda SHRINKS
    the apparent shadow at fixed observer radius (the Kottler
    phenomenology, surviving rotation)."""
    res_l = _render("kerr-ds", 0.8, 1e-3)
    res_0 = _render("kerr-ds", 0.8, 0.0)
    assert res_l.counts["numerical_error"] == 0
    assert 0 < res_l.counts["captured"] < res_0.counts["captured"]


def test_cli_roundtrip_and_validation():
    from grtrace.cli.args import parse_args, scene_from_args

    scene = scene_from_args(parse_args(
        ["--metric", "kerr-ds", "--spin", "0.7",
         "--metric-param", "1e-3"]))
    assert scene.metric == "kerr-ds"
    assert scene.spin == 0.7 and scene.metric_param == 1e-3

    with pytest.raises(SystemExit):     # charge is KN-only
        scene_from_args(parse_args(
            ["--metric", "kerr-ds", "--charge", "0.3"]))
    with pytest.raises(SystemExit):     # boundary vs cosmological horizon
        scene_from_args(parse_args(
            ["--metric", "kerr-ds", "--spin", "0.5",
             "--metric-param", "0.01"]))
    with pytest.raises(SystemExit):     # over-spun
        scene_from_args(parse_args(
            ["--metric", "kerr-ds", "--spin", "1.2"]))


def test_shadow_cli_kerr_ds(tmp_path):
    """Shadow analysis for Kerr-de Sitter: the predicate-bisected curve
    through the unfolded spherical camera.  Lambda shrinks the apparent
    mean radius (the sqrt(f(r_obs)) clock factor); horizon-merged
    parameters are refused."""
    from grtrace.cli.shadow import main

    m_l = main(["--metric", "kerr-ds", "--spin", "0.8",
                "--metric-param", "1e-3", "--azimuths", "24",
                "--out-dir", str(tmp_path / "l")])
    m_0 = main(["--metric", "kerr-ds", "--spin", "0.8",
                "--metric-param", "0", "--azimuths", "24",
                "--out-dir", str(tmp_path / "zero")])
    assert m_l["mean_radius_px"] < m_0["mean_radius_px"]
    assert m_l["circularity_deviation"] > 0.005    # still D-shaped
    import os
    assert os.path.exists(str(tmp_path / "l" / "shadow_boundary.csv"))

    # strong Lambda: the fixed camera would sit outside the cosmological
    # horizon (r_c = sqrt(3/Lambda) ~ 5 M << 30 M) — refused up front
    with pytest.raises(SystemExit, match="cosmological horizon"):
        main(["--metric", "kerr-ds", "--spin", "0.5",
              "--metric-param", "0.12", "--azimuths", "8",
              "--out-dir", str(tmp_path / "bad")])


def test_orbits_reduce_to_kerr_layer():
    """Lambda = 0: Omega, E, L and all three epicyclic frequencies must
    equal the independent Kerr-Newman layer to roundoff."""
    from grtrace.physics import orbits
    from grtrace.physics.epicyclic import epicyclic_frequencies

    p = jnp.array([M, 0.8, 0.0])
    for r in (3.0, 6.0, 10.0):
        om = kds.keplerian_omega_kds(r, p, True)
        assert float(om) == pytest.approx(
            float(orbits.keplerian_omega(r, M, 0.8, 0.0, True)),
            rel=1e-13)
        e, l = kds.circular_e_l_kds(r, p, True)
        ek, lk = orbits.circular_e_lz(jnp.asarray(r), p, True)
        assert float(e) == pytest.approx(float(ek), rel=1e-13)
        assert float(l) == pytest.approx(float(lk), rel=1e-13)
        trip = kds.epicyclic_kds(r, p, True)
        trip_k = epicyclic_frequencies(jnp.asarray(r), p, True)
        for x, y in zip(trip, trip_k):
            assert float(x) == pytest.approx(float(y), abs=1e-12)
    assert float(kds.isco_kds(p)) == pytest.approx(
        float(orbits.isco_radius(M, 0.8, True)), abs=1e-8)


def test_orbits_reduce_to_kottler_layer():
    """a = 0: the Kottler closed form Omega^2 = M/r^3 - Lambda/3 and the
    static-family ISCO/OSCO/epicyclics."""
    from grtrace.physics.static_metrics import kottler_f
    from grtrace.physics.static_orbits import (epicyclic_static,
                                               isco_static, osco_static)

    lam = 1e-4
    p = jnp.array([M, 0.0, lam])
    ps = jnp.array([M, lam, 0.0])
    for r in (8.0, 12.0):
        om = float(kds.keplerian_omega_kds(r, p, True))
        assert om == pytest.approx(np.sqrt(M / r ** 3 - lam / 3),
                                   rel=1e-13)
        for x, y in zip(kds.epicyclic_kds(r, p, True),
                        epicyclic_static(r, kottler_f, ps)):
            assert float(x) == pytest.approx(float(y), abs=1e-12)
    assert float(kds.isco_kds(p)) == pytest.approx(
        float(isco_static(kottler_f, ps)), abs=1e-8)
    assert float(kds.osco_kds(p)) == pytest.approx(
        float(osco_static(kottler_f, ps,
                          r_hi=0.98 * (3 / lam) ** (1 / 3))), abs=1e-6)


def test_qpo_cli_kerr_ds(tmp_path):
    from grtrace.cli.qpo import main

    out = main(["--metric", "kerr-ds", "--spin", "0.8",
                "--metric-param", "1e-4", "--mass-msun", "10",
                "--n", "64", "--r-max", "40", "--out-dir", str(tmp_path)])
    assert out["metric"] == "kerr-ds"
    # band clipped at the Lambda tide's OSCO, not at --r-max
    assert out["nu_phi_isco"] > 0
    import os
    rows = np.loadtxt(os.path.join(str(tmp_path), "qpo_frequencies.csv"),
                      delimiter=",", skiprows=1, ndmin=2)
    assert rows[-1, 0] < 19.5          # OSCO ~ 18.98 M << 40 M
    # rotation splits nu_theta from nu_phi (nonzero nodal precession)
    nodal = rows[1:, 1] - rows[1:, 3]
    assert (nodal > 0).all()


def test_render_disk_kds_end_to_end():
    """Thin disk around a Kerr-de Sitter hole: theta-crossing capture on
    the BL chart, KdS Keplerian shading, Lambda-tide OSCO validation."""
    from grtrace.engine.disk import STATUS_DISK, DiskConfig
    from grtrace.engine.disk_kds import kds_disk_bounds, render_disk_kds

    bg = np.full((16, 16, 3), 90, np.uint8)
    integ = IntegratorConfig(steps=2500, delta=0.06, dtype="float64")
    sc = SceneConfig(size=40, metric="kerr-ds", spin=0.8,
                     metric_param=1e-4, n_samples=0, integrator=integ)
    res = render_disk_kds(sc, DiskConfig(), bg_array=bg)
    assert res.counts["disk"] > 50
    assert res.counts["numerical_error"] == 0
    assert res.counts["captured"] > 0
    dm = np.asarray(res.device("status")) == STATUS_DISK
    g = np.asarray(res.device("redshift"))[dm]
    assert g.max() > 1.2 and g.min() < 0.5
    # inner edge = the KdS ISCO (3.03 at a = 0.8), crossings inside it
    r_em = np.asarray(res.device("hit_q"))[dm, 1]
    r_in, _ = kds_disk_bounds(M, 0.8, 1e-4, None, 14.0, 30.0)
    assert (r_em >= r_in - 1e-6).all()

    # the Lambda tide forbids disks beyond the OSCO
    with pytest.raises(ValueError, match="outermost stable"):
        kds_disk_bounds(M, 0.8, 1e-3, None, 25.0, 30.0)


def test_render_disk_kds_lambda_zero_matches_kerr_distribution():
    """Lambda = 0 vs the Kerr-Schild disk pipeline: different charts and
    cameras (the documented O(2M/r_obs) pixel gauge), same physics — the
    redshift distributions on the disk must agree at the quantile level,
    and the disk pixel counts in the f^-2 solid-angle ratio."""
    from grtrace.engine.disk import STATUS_DISK, DiskConfig, render_disk
    from grtrace.engine.disk_kds import render_disk_kds

    bg = np.full((16, 16, 3), 90, np.uint8)
    integ = IntegratorConfig(steps=2500, delta=0.06, dtype="float64")
    r0 = render_disk_kds(
        SceneConfig(size=40, metric="kerr-ds", spin=0.8, metric_param=0.0,
                    n_samples=0, integrator=integ),
        DiskConfig(), bg_array=bg)
    rk = render_disk(
        SceneConfig(size=40, metric="kerr", spin=0.8, n_samples=0,
                    integrator=integ),
        DiskConfig(), bg_array=bg)
    d0 = np.asarray(r0.device("status")) == STATUS_DISK
    dk = np.asarray(rk.device("status")) == STATUS_DISK
    f = 1.0 - 2.0 * M / 30.0
    assert d0.sum() == pytest.approx(dk.sum() / f ** 2, rel=0.12)
    g0 = np.asarray(r0.device("redshift"))[d0]
    gk = np.asarray(rk.device("redshift"))[dk]
    np.testing.assert_allclose(np.quantile(g0, [0.1, 0.5, 0.9]),
                               np.quantile(gk, [0.1, 0.5, 0.9]),
                               atol=0.04)


def test_disk_cli_kerr_ds(tmp_path):
    from grtrace.cli.main import main

    out = str(tmp_path / "kds_disk")
    main(["--size", "24", "--metric", "kerr-ds", "--spin", "0.8",
          "--metric-param", "1e-4", "--disk", "--steps", "1500",
          "--delta", "0.06", "--out-dir", out, "--no-plots", "--no-flat",
          "--n-samples", "0"])
    import os
    rows = np.loadtxt(os.path.join(out, "redshift_map.csv"),
                      delimiter=",", skiprows=1, ndmin=2)
    assert rows.shape[0] > 3 and rows.shape[1] == 4
    # areal BL emission radii: inside the annulus, outside the ISCO
    assert (rows[:, 3] >= 3.0).all() and (rows[:, 3] <= 14.1).all()
