"""Accretion disks + orbit dynamics for the static beyond-Kerr families.

physics/static_orbits.py derives every quantity (Keplerian rate, Killing
charges, ISCO/OSCO, epicyclic frequencies, Page-Thorne flux, redshift)
from the lapse f(r) by autodiff; engine/disk_static.py renders thin disks
through the planar-fold crossing detector.  Oracles here are all
independent of the implementation:

  * closed-form Schwarzschild limits (ISCO = 6M, kappa^2 = (M/r^3)(1-6M/r),
    face-on g = sqrt(1 - 3M/r));
  * SciPy minimization of the hand-derived L^2(r) = r^3 f'/(2f - r f')
    for the ISCO/OSCO of the deformed families;
  * the INDEPENDENT Kerr-Newman orbit layer at a = 0 (physics/orbits.py
    inverts kerr_g_inv; the static layer never touches it) for the
    Page-Thorne flux and the redshift factor;
  * the Kerr-Schild-chart disk renderer (engine/disk.py) at a = 0 for
    full-image parity: an elevated camera over an equatorial disk and an
    x-axis camera over a tilted disk are isometric scenes in spherical
    symmetry, but the two pipelines share no chart, no camera and no
    crossing detector.

No reference counterpart: the reference has neither disks nor
non-Schwarzschild metrics (simulation/raytracing.py:164-280).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grtrace.engine.disk import STATUS_DISK, DiskConfig, render_disk
from grtrace.engine.disk_static import (integrate_batch_disk_static,
                                        render_disk_static,
                                        render_pixels_disk_static,
                                        static_disk_bounds)
from grtrace.io.scene import IntegratorConfig, SceneConfig
from grtrace.physics import static_orbits as so
from grtrace.physics.static_metrics import (STATIC_F, bardeen_f,
                                            hayward_f, kottler_f)

M = 1.0


def _np_l2(f, fp):
    """Hand-derived L^2(r) of the circular orbit (independent numpy)."""
    return lambda r, p: r ** 3 * fp(r, p) / (2 * f(r, p) - r * fp(r, p))


_NP_F = {
    "Kottler": (lambda r, p: 1 - 2 * M / r - p / 3 * r ** 2,
                lambda r, p: 2 * M / r ** 2 - 2 * p / 3 * r),
    "Bardeen": (lambda r, p: 1 - 2 * M * r ** 2 / (r ** 2 + p ** 2) ** 1.5,
                lambda r, p: 2 * M * r * (r ** 2 - 2 * p ** 2)
                / (r ** 2 + p ** 2) ** 2.5),
    "Hayward": (lambda r, p: 1 - 2 * M * r ** 2 / (r ** 3 + 2 * M * p ** 2),
                lambda r, p: 2 * M * r * (r ** 3 - 4 * M * p ** 2)
                / (r ** 3 + 2 * M * p ** 2) ** 2),
}


# ---------------------------------------------------------------------------
# orbit dynamics
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("f_fn", [kottler_f, bardeen_f, hayward_f])
def test_isco_schwarzschild_limit(f_fn):
    p = jnp.array([M, 0.0, 0.0])
    assert float(so.isco_static(f_fn, p)) == pytest.approx(6.0 * M,
                                                           abs=1e-8)


@pytest.mark.parametrize("name,p1", [("Kottler", 1e-4), ("Bardeen", 0.5),
                                     ("Hayward", 0.65)])
def test_isco_vs_scipy_oracle(name, p1):
    """ISCO = the L^2 minimum, located by SciPy on the hand-derived
    closed form — fully independent of the autodiff scan+bisection."""
    from scipy.optimize import minimize_scalar

    f, fp = _NP_F[name]
    l2 = _np_l2(f, fp)
    res = minimize_scalar(lambda r: l2(r, p1), bounds=(3.2, 20.0),
                          method="bounded",
                          options={"xatol": 1e-12})
    ours = float(so.isco_static(STATIC_F[name],
                                jnp.array([M, p1, 0.0])))
    assert ours == pytest.approx(res.x, abs=1e-6)


def test_kottler_osco_scipy_oracle():
    """Kottler's cosmological tide destabilizes distant orbits: L^2 has a
    MAXIMUM beyond the ISCO (the outermost stable circular orbit).  Pin
    it against SciPy on the closed form, and check the stability band
    ordering isco < osco < static radius."""
    from scipy.optimize import minimize_scalar

    lam = 1e-4
    f, fp = _NP_F["Kottler"]
    l2 = _np_l2(f, fp)
    r_static = (3 * M / lam) ** (1 / 3)
    res = minimize_scalar(lambda r: -l2(r, lam), bounds=(8.0,
                                                         0.98 * r_static),
                          method="bounded", options={"xatol": 1e-12})
    p = jnp.array([M, lam, 0.0])
    r_isco = float(so.isco_static(kottler_f, p))
    r_osco = float(so.osco_static(kottler_f, p, r_hi=0.98 * r_static))
    assert r_osco == pytest.approx(res.x, abs=1e-5)
    assert 6.0 < r_isco < r_osco < r_static


def test_osco_absent_for_flat_families():
    """Asymptotically flat families are stable to infinity: no OSCO."""
    p = jnp.array([M, 0.5, 0.0])
    assert np.isnan(float(so.osco_static(bardeen_f, p, r_hi=200.0)))


def test_epicyclic_schwarzschild_closed_forms():
    p = jnp.array([M, 0.0, 0.0])
    for r in (7.0, 8.0, 12.0):
        om, ka, ot = so.epicyclic_static(r, kottler_f, p)
        assert float(om) == pytest.approx(np.sqrt(M / r ** 3), rel=1e-12)
        assert float(ot) == pytest.approx(float(om), rel=1e-12)
        assert float(ka) == pytest.approx(
            np.sqrt(M / r ** 3 * (1 - 6 * M / r)), rel=1e-10)
    # the signed discriminant kappa^2 vanishes at the ISCO (marginal
    # stability) and is negative inside it
    assert abs(float(so.radial_stability_static(6.0 * M, kottler_f,
                                                p))) < 1e-12
    assert float(so.radial_stability_static(5.0 * M, kottler_f, p)) < 0


def test_epicyclic_matches_kerr_layer_at_a0():
    """The independent Kerr-Newman epicyclic layer (inverts kerr_g_inv)
    agrees with the static layer in their shared Schwarzschild limit."""
    from grtrace.physics.epicyclic import epicyclic_frequencies

    pk = jnp.array([M, 0.0, 0.0])
    for r in (6.5, 9.0, 15.0):
        om_s, ka_s, ot_s = so.epicyclic_static(r, bardeen_f, pk)
        om_k, ka_k, ot_k = epicyclic_frequencies(jnp.asarray(r), pk, True)
        assert float(om_s) == pytest.approx(float(om_k), rel=1e-8)
        assert float(ka_s) == pytest.approx(float(ka_k), rel=1e-8)
        assert float(ot_s) == pytest.approx(float(ot_k), rel=1e-8)


def test_page_thorne_static_matches_kerr_a0():
    rg = jnp.linspace(6.0, 30.0, 160)
    p = jnp.array([M, 0.0, 0.0])
    from grtrace.physics.orbits import page_thorne_flux
    f_static = so.page_thorne_flux_static(rg, kottler_f, p)
    f_kerr = page_thorne_flux(rg, p, True)
    np.testing.assert_allclose(np.asarray(f_static), np.asarray(f_kerr),
                               rtol=1e-8, atol=1e-12 * float(f_kerr.max()))


def test_redshift_static_matches_kerr_a0():
    from grtrace.physics import orbits

    p = jnp.array([M, 0.0, 0.0])
    r_obs = 30.0
    rng = np.random.default_rng(7)
    for _ in range(12):
        e = rng.uniform(0.5, 2.0)
        l = rng.uniform(-6.0, 6.0)
        r_em = rng.uniform(6.1, 13.0)
        g_s = so.redshift_factor_static(e, l, r_em, r_obs, kottler_f, p)
        g_k = orbits.redshift_factor(jnp.asarray(e), jnp.asarray(l),
                                     jnp.asarray(r_em),
                                     jnp.asarray(r_obs), p)
        assert float(g_s) == pytest.approx(float(g_k), rel=1e-10)


def test_redshift_face_on_closed_form():
    """l_n = 0 photons: g = sqrt(1 - 3M/r_em)/sqrt(1 - 2M/r_obs)."""
    p = jnp.array([M, 0.0, 0.0])
    g = so.redshift_factor_static(1.0, 0.0, 8.0, 30.0, kottler_f, p)
    expect = np.sqrt(1 - 3 / 8.0) / np.sqrt(1 - 2 / 30.0)
    assert float(g) == pytest.approx(expect, rel=1e-10)


def test_qpo_static_dict_and_nodal_zero():
    out = so.qpo_frequencies_static_hz(8.0, bardeen_f,
                                       jnp.array([M, 0.3, 0.0]), 10.0)
    assert set(out) == {"nu_phi", "nu_r", "nu_theta", "nu_periastron",
                       "nu_nodal"}
    assert float(out["nu_nodal"]) == pytest.approx(0.0, abs=1e-12)
    assert float(out["nu_phi"]) > float(out["nu_r"]) > 0.0


# ---------------------------------------------------------------------------
# disk rendering
# ---------------------------------------------------------------------------

def _static_disk_render(metric, p1, size=40, elev=12.0, profile="shakura",
                        r_in=None, r_out=14.0):
    scene = SceneConfig(size=size, metric=metric, metric_param=p1,
                        n_samples=0,
                        integrator=IntegratorConfig(steps=2500, delta=0.06,
                                                    dtype="float64"))
    bg = np.full((32, 32, 3), 120, np.uint8)
    disk = DiskConfig(elevation_deg=elev, profile=profile, r_in=r_in,
                      r_out=r_out)
    return render_disk_static(scene, disk, bg_array=bg)


@pytest.mark.parametrize("metric,p1", [("bardeen", 0.5), ("hayward", 0.65),
                                       ("kottler", 1e-4)])
def test_render_disk_static_end_to_end(metric, p1):
    res = _static_disk_render(metric, p1)
    assert res.counts["disk"] > 20
    assert res.counts["numerical_error"] == 0
    assert res.counts["captured"] > 0
    dm = res.cls == 5
    assert (res.image[dm].sum(axis=-1) > 0).mean() > 0.5
    g = np.asarray(res.device("redshift"))[dm]
    # approaching limb Doppler-boosted, inner/receding side redshifted
    assert g.max() > 1.0 and g.min() < 0.75
    # crossings live inside the annulus
    r_em = np.asarray(res.device("hit_q"))[dm, 1]
    r_in, r_out = static_disk_bounds(
        {"bardeen": "Bardeen", "hayward": "Hayward",
         "kottler": "Kottler"}[metric], M, p1, None, 14.0, 30.0)
    assert (r_em >= r_in - 1e-6).all() and (r_em <= r_out + 1e-6).all()


def test_disk_static_schwarzschild_parity_with_ks_chart():
    """THE cross-pipeline oracle: at the shared Schwarzschild point the
    planar-fold tilted-disk renderer and the Kerr-Schild elevated-camera
    renderer draw the same physical scene through entirely disjoint
    charts, cameras and crossing detectors.

    The two camera conventions are related by the DOCUMENTED
    O(2M/r_obs) chart gauge (physics/camera.py:386-400): the spherical
    camera's pixel angle satisfies tan(a_cam) = f tan(a_phys) with
    f = 1 - 2M/r_obs, while the Cartesian camera's pixel angle is the
    physical angle — and pinhole pixel radius is proportional to
    tan(a_cam), so the SAME feature lands at image-plane radii in the
    exact ratio f.  The parity checks are therefore gauge-aware:

      1. the disk silhouette's pixel extents must differ by exactly f;
      2. the physics is gauge-free: redshift as a function of emission
         radius must agree bin-by-bin between the pipelines.
    """
    size, elev = 48, 12.0
    bg = np.full((16, 16, 3), 90, np.uint8)
    integ = IntegratorConfig(steps=3000, delta=0.05, dtype="float64")

    scene_ks = SceneConfig(size=size, metric="kerr", spin=0.0,
                           n_samples=0, integrator=integ)
    res_ks = render_disk(scene_ks, DiskConfig(elevation_deg=elev,
                                              show_background=False),
                         bg_array=bg)

    scene_st = SceneConfig(size=size, metric="bardeen", metric_param=0.0,
                           n_samples=0, integrator=integ)
    res_st = render_disk_static(scene_st,
                                DiskConfig(elevation_deg=elev,
                                           show_background=False),
                                bg_array=bg)

    dm_ks = np.asarray(res_ks.device("status")) == STATUS_DISK
    dm_st = np.asarray(res_st.device("status")) == STATUS_DISK
    assert dm_ks.sum() > 100 and dm_st.sum() > 100

    # --- 1. image-plane gauge: extents in the exact ratio f ---
    f = 1.0 - 2.0 * M / 30.0
    c = (size - 1) / 2.0
    ii, jj = np.nonzero(dm_ks)
    ext_ks = np.hypot(ii - c, jj - c).max()
    ii, jj = np.nonzero(dm_st)
    ext_st = np.hypot(ii - c, jj - c).max()
    # half-pixel discretization on a ~20 px extent -> ~3% bracket
    assert ext_ks / ext_st == pytest.approx(f, abs=0.03)

    # --- 2. gauge-free physics: g(r_em) bin means agree ---
    r_ks_hit = np.asarray(res_ks.device("hit_q"))[dm_ks]
    from grtrace.physics.spacetime import ks_radius
    r_ks = np.asarray(ks_radius(r_ks_hit[:, 1], r_ks_hit[:, 2],
                                r_ks_hit[:, 3], 0.0))
    g_ks = np.asarray(res_ks.device("redshift"))[dm_ks]
    r_st = np.asarray(res_st.device("hit_q"))[dm_st, 1]
    g_st = np.asarray(res_st.device("redshift"))[dm_st]

    # the two cameras sample the same (r_em, azimuth) emission surface
    # with slightly different pixel weightings (the f gauge again), so
    # compare the distributions, not pixel pairs: matching quantiles of
    # g and of r_em.  (The pointwise redshift FORMULA is already pinned
    # exactly by test_redshift_static_matches_kerr_a0.)
    qs = [0.1, 0.35, 0.5, 0.65, 0.9]
    np.testing.assert_allclose(np.quantile(g_st, qs),
                               np.quantile(g_ks, qs), atol=0.05)
    np.testing.assert_allclose(np.quantile(r_st, qs),
                               np.quantile(r_ks, qs), atol=0.8)
    # identical global Doppler structure
    assert g_ks.max() > 1.0 and g_st.max() > 1.0
    assert g_ks.min() < 0.75 and g_st.min() < 0.75


def test_disk_static_crossing_on_plane_within_annulus():
    """Recorded crossings satisfy the disk-plane equation to the step
    interpolation tolerance and conserve the Killing charges exactly."""
    from grtrace.physics.camera import camera_rays_folded_static
    from grtrace.physics.spacetime import METRICS

    size = 16
    p = jnp.array([M, 0.5, 0.0], jnp.float64)
    obs = jnp.array([30.0, 0.0, 0.0], jnp.float64)
    q0, p0, _, beta = camera_rays_folded_static(
        obs, jnp.radians(60.0), size, size, params=p,
        g_inv_fn=METRICS["Bardeen"], dtype=jnp.float64)
    elev = jnp.radians(12.0)
    c1 = jnp.broadcast_to(jnp.sin(elev), beta.shape).reshape(-1)
    c2 = (jnp.sin(beta) * jnp.cos(elev)).reshape(-1)
    n = size * size
    fq, fp, status, ns, hq, hp = integrate_batch_disk_static(
        q0.reshape(n, 4), p0.reshape(n, 4), c1, c2, 3000, 0.05, p,
        31.0, 1.0, 4.0, 14.0, order=2, metric="Bardeen")
    hit = np.asarray(status) == STATUS_DISK
    assert hit.sum() > 5
    hqn = np.asarray(hq)[hit]
    un = (np.asarray(c1)[hit] * np.cos(hqn[:, 3])
          + np.asarray(c2)[hit] * np.sin(hqn[:, 3]))
    # |w| = r|u| is the distance to the plane; one step moves the ray by
    # ~|p| * delta with the folded camera's |p| ~ r_obs
    assert np.abs(hqn[:, 1] * un).max() < 30.0 * 0.05
    assert (hqn[:, 1] >= 4.0 - 1e-9).all() and (hqn[:, 1] <= 14.0).all()
    # The crossing RECORD's momentum carries the FANTASY copy-split —
    # O(1) for photon-shell winders (the mixing rotation couples the two
    # phase-space copies; cf. engine/disk.py:167-174) — which is exactly
    # why shade_disk_static reads E and p_phi from the CAMERA covectors
    # (true Killing charges) instead.  Pin both facts: the record drifts
    # only on a small winding minority, and the shading consumes the
    # exact constants.
    hpn = np.asarray(hp)[hit]
    p0n = np.asarray(p0.reshape(n, 4))[hit]
    rel = np.abs(hpn[:, 0] - p0n[:, 0]) / np.abs(p0n[:, 0])
    assert np.median(rel) < 1e-6          # non-winders: split ~ roundoff
    assert (rel > 1e-3).mean() < 0.3      # winders are the minority

    from grtrace.physics.static_orbits import redshift_factor_static
    from grtrace.engine.disk_static import shade_disk_static
    ln_scale = (jnp.cos(beta) * jnp.cos(elev)).reshape(-1)
    g_shade, _ = shade_disk_static(hq, p0.reshape(n, 4), ln_scale,
                                   STATIC_F["Bardeen"], p, 30.0, 4.0)
    g_exact = jax.vmap(lambda e, l, r: redshift_factor_static(
        e, l, r, 30.0, STATIC_F["Bardeen"], p))(
        -p0.reshape(n, 4)[:, 0],
        p0.reshape(n, 4)[:, 3] * ln_scale,
        jnp.asarray(hq)[:, 1])
    np.testing.assert_allclose(np.asarray(g_shade)[hit],
                               np.asarray(g_exact)[hit], rtol=1e-12)


def test_static_disk_bounds_validation():
    # Kottler: disk beyond the OSCO (18.53 at Lambda = 1e-4) is rejected
    with pytest.raises(ValueError, match="outermost stable"):
        static_disk_bounds("Kottler", M, 1e-4, None, 25.0, 30.0)
    # stronger Lambda: NO stable circular orbits anywhere (the ISCO and
    # OSCO merge near Lambda M^2 ~ 2.6e-4) — rejected with the no-ISCO
    # message
    with pytest.raises(ValueError, match="no stable circular"):
        static_disk_bounds("Kottler", M, 1e-3, None, 14.0, 30.0)
    # inverted edges
    with pytest.raises(ValueError, match="r_in < r_out"):
        static_disk_bounds("Bardeen", M, 0.3, 15.0, 14.0, 30.0)
    # outer edge beyond the boundary sphere
    with pytest.raises(ValueError, match="boundary sphere"):
        static_disk_bounds("Bardeen", M, 0.3, None, 40.0, 30.0)
    # ISCO resolution: Bardeen g = 0.5 pulls the ISCO inside 6M
    r_in, _ = static_disk_bounds("Bardeen", M, 0.5, None, 14.0, 30.0)
    assert 4.0 < r_in < 6.0


def test_render_disk_static_novikov_profile():
    """The Novikov-Thorne profile must kill emission at the ISCO: the
    innermost disk pixels go dark relative to Shakura-Sunyaev."""
    res_sh = _static_disk_render("bardeen", 0.5, profile="shakura")
    res_nt = _static_disk_render("bardeen", 0.5, profile="novikov")
    dm = (np.asarray(res_sh.device("status")) == STATUS_DISK) \
        & (np.asarray(res_nt.device("status")) == STATUS_DISK)
    r_em = np.asarray(res_sh.device("hit_q"))[..., 1]
    r_in, _ = static_disk_bounds("Bardeen", M, 0.5, None, 14.0, 30.0)
    inner = dm & (r_em < r_in * 1.15)
    if inner.sum() >= 3:
        lum_sh = res_sh.image[inner].astype(float).sum(axis=-1)
        lum_nt = res_nt.image[inner].astype(float).sum(axis=-1)
        assert lum_nt.mean() < lum_sh.mean()


def test_disk_static_rejects_kerr_only_features():
    scene = SceneConfig(size=8, metric="bardeen", metric_param=0.3,
                        n_samples=0)
    with pytest.raises(NotImplementedError, match="polarized"):
        render_disk_static(scene, DiskConfig(bfield="vertical"))
    with pytest.raises(NotImplementedError, match="orbiting"):
        render_disk_static(scene, DiskConfig(camera_omega="keplerian"))


def test_disk_cli_static_writes_maps(tmp_path):
    """--disk --metric bardeen through the main CLI: the planar-fold
    path writes the same science products, with the areal emission
    radius in the spherical chart."""
    from grtrace.cli.main import main

    out = str(tmp_path / "static_disk_out")
    main(["--size", "24", "--metric", "bardeen", "--metric-param", "0.5",
          "--disk", "--steps", "1500", "--delta", "0.06",
          "--out-dir", out, "--no-plots", "--no-flat",
          "--n-samples", "0"])
    import os
    csv = os.path.join(out, "redshift_map.csv")
    assert os.path.exists(csv)
    rows = np.loadtxt(csv, delimiter=",", skiprows=1, ndmin=2)
    assert rows.shape[0] > 3 and rows.shape[1] == 4
    g, r_em = rows[:, 2], rows[:, 3]
    assert (g > 0).all() and (r_em < 14.5).all()
    # inner edge = the Bardeen ISCO (inside 6M), not the Schwarzschild 6M
    r_in, _ = static_disk_bounds("Bardeen", M, 0.5, None, 14.0, 30.0)
    assert (r_em >= r_in - 1e-6).all()
    assert os.path.exists(os.path.join(out, "line_profile.csv"))


def test_qpo_cli_static_family(tmp_path):
    from grtrace.cli.qpo import main

    out = main(["--metric", "bardeen", "--metric-param", "0.5",
                "--mass-msun", "10", "--n", "64",
                "--out-dir", str(tmp_path)])
    assert out["metric"] == "bardeen"
    assert out["r_isco_over_M"] < 6.0       # Bardeen pulls the ISCO in
    assert out["nu_phi_isco"] > 0
    import os
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "qpo_frequencies.csv"))


def test_lyapunov_static_closed_forms():
    """Photon-ring demagnification theory for the static families:
    Schwarzschild gamma = 1 exactly; Kottler gamma is Lambda-independent
    (the cosmological term is constant in u = 1/r); the regular cores
    LOWER gamma (brighter subrings); SciPy finite differences of the
    hand-derived P(u) confirm the autodiff value."""
    from grtrace.physics.static_metrics import (b_critical, lyapunov_static,
                                                photon_sphere)

    p0 = jnp.array([M, 0.0, 0.0])
    assert float(lyapunov_static(kottler_f, p0)) == pytest.approx(
        1.0, abs=1e-9)
    # Lambda-independence, to roundoff
    for lam in (1e-4, 1e-3):
        g = float(lyapunov_static(kottler_f, jnp.array([M, lam, 0.0])))
        assert g == pytest.approx(1.0, abs=1e-7)
    # regular cores wind tighter: gamma drops with the deformation
    g_b = float(lyapunov_static(bardeen_f, jnp.array([M, 0.5, 0.0])))
    g_h = float(lyapunov_static(hayward_f, jnp.array([M, 0.65, 0.0])))
    assert g_b < 1.0 and g_h < 1.0
    # independent finite-difference oracle on the hand-derived P(u)
    f, _ = _NP_F["Bardeen"]
    pj = jnp.array([M, 0.5, 0.0])
    r_ph = float(photon_sphere(bardeen_f, pj))
    b_c = float(b_critical(bardeen_f, pj))
    u = 1.0 / r_ph
    h = 1e-5

    def P(uu):
        return 1.0 / b_c ** 2 - uu ** 2 * f(1.0 / uu, 0.5)

    p2_fd = (P(u + h) - 2 * P(u) + P(u - h)) / h ** 2
    assert g_b == pytest.approx(np.sqrt(p2_fd / 2), rel=1e-5)
