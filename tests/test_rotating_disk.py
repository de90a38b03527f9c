"""Thin disks around ROTATING regular black holes.

physics/rotating_orbits.py derives the circular-orbit algebra of any
Kerr-like mass-function metric by autodiff of the covariant equatorial
Boyer-Lindquist block; engine/disk.py threads the metric through the
crossing integrator, the shading and the shared shading executable.

Oracles (all independent of the module):
  * the Kerr-Newman layer (physics/orbits.py) at m(r) = M - Q^2/(2r):
    Omega, E, L, redshift and Page-Thorne flux must match EXACTLY;
  * the Bardeen-Press-Teukolsky Kerr ISCO closed form at m = M;
  * the static-family layer (physics/static_orbits.py) at a = 0;
  * the full Kerr disk render at zero deformation (same engine, only
    the g_inv/mass-function callable differs).

No reference counterpart (Schwarzschild-only reference).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from grtrace.engine.disk import STATUS_DISK, DiskConfig, render_disk
from grtrace.io.scene import IntegratorConfig, SceneConfig
from grtrace.physics import orbits
from grtrace.physics import rotating_orbits as ro
from grtrace.physics.rotating_regular import MASS_FN

M = 1.0


def _kn_mass(r, params):
    return params[0] - 0.5 * params[2] ** 2 / r


def test_orbits_reproduce_kerr_newman_exactly():
    p = jnp.array([M, 0.7, 0.4])
    for r in (4.0, 6.0, 10.0):
        om = ro.keplerian_omega_rotating(r, p, _kn_mass, True)
        om_kn = orbits.keplerian_omega(r, M, 0.7, 0.4, True)
        assert float(om) == pytest.approx(float(om_kn), rel=1e-13)
        e, l = ro.circular_e_l_rotating(r, p, _kn_mass, True)
        e_kn, l_kn = orbits.circular_e_lz(jnp.asarray(r), p, True)
        assert float(e) == pytest.approx(float(e_kn), rel=1e-13)
        assert float(l) == pytest.approx(float(l_kn), rel=1e-13)
    g = ro.redshift_factor_rotating(1.0, 2.0, 6.0, 30.0, p, _kn_mass)
    g_kn = orbits.redshift_factor(jnp.asarray(1.0), jnp.asarray(2.0),
                                  jnp.asarray(6.0), jnp.asarray(30.0), p)
    assert float(g) == pytest.approx(float(g_kn), rel=1e-13)


def test_page_thorne_matches_kerr_newman():
    p = jnp.array([M, 0.7, 0.4])
    rg = jnp.linspace(3.0, 20.0, 100)
    f_rot = ro.page_thorne_flux_rotating(rg, p, _kn_mass, True)
    f_kn = orbits.page_thorne_flux(rg, p, True)
    np.testing.assert_allclose(np.asarray(f_rot), np.asarray(f_kn),
                               rtol=1e-10, atol=1e-12 * float(f_kn.max()))


def test_isco_kerr_closed_form():
    def m_kerr(r, params):
        return params[0]

    for a in (0.0, 0.5, 0.9, 0.99):
        ri = float(ro.isco_rotating(jnp.array([M, a, 0.0]), m_kerr, True))
        assert ri == pytest.approx(float(orbits.isco_radius(M, a, True)),
                                   abs=1e-5)
    # retrograde branch too
    ri = float(ro.isco_rotating(jnp.array([M, 0.9, 0.0]), m_kerr, False))
    assert ri == pytest.approx(float(orbits.isco_radius(M, 0.9, False)),
                               abs=1e-5)


def test_isco_static_limit():
    from grtrace.physics.static_metrics import bardeen_f, hayward_f
    from grtrace.physics.static_orbits import isco_static

    for fam, f, p1 in (("RotatingBardeen", bardeen_f, 0.5),
                       ("RotatingHayward", hayward_f, 0.65)):
        ri = float(ro.isco_rotating(jnp.array([M, 0.0, p1]),
                                    MASS_FN[fam], True))
        rs = float(isco_static(f, jnp.array([M, p1, 0.0])))
        assert ri == pytest.approx(rs, abs=1e-6)


def test_isco_deformation_pulls_inward():
    """The regular core weakens gravity: at fixed spin the prograde ISCO
    moves INWARD with the deformation (same direction as Kerr-Newman
    charge)."""
    ri_kerr = float(ro.isco_rotating(jnp.array([M, 0.9, 0.0]),
                                     MASS_FN["RotatingBardeen"], True))
    ri_def = float(ro.isco_rotating(jnp.array([M, 0.9, 0.2]),
                                    MASS_FN["RotatingBardeen"], True))
    assert ri_def < ri_kerr


def test_inner_edge_raises_without_stable_orbits():
    with pytest.raises(ValueError, match="no stable circular"):
        # far super-critical: deep horizonless core, E(r) has no minimum
        # on the scanned branch
        ro.rotating_disk_inner_edge("RotatingBardeen", M, 0.3, 1.4)


def _disk_render(metric, spin, p1, **disk_kw):
    scene = SceneConfig(size=40, metric=metric, spin=spin, metric_param=p1,
                        n_samples=0,
                        integrator=IntegratorConfig(steps=2500, delta=0.06,
                                                    dtype="float64"))
    bg = np.full((16, 16, 3), 90, np.uint8)
    return render_disk(scene, DiskConfig(**disk_kw), bg_array=bg)


def test_render_disk_rotating_end_to_end():
    res = _disk_render("rotating-bardeen", 0.9, 0.2)
    assert res.counts["disk"] > 20
    assert res.counts["numerical_error"] == 0
    assert res.counts["captured"] > 0
    dm = np.asarray(res.device("status")) == STATUS_DISK
    g = np.asarray(res.device("redshift"))[dm]
    # a = 0.9 disk reaches deep (ISCO 1.97): strong Doppler horns and a
    # strongly redshifted inner edge
    assert g.max() > 1.1 and g.min() < 0.5


def test_render_disk_zero_deformation_matches_kerr():
    """Same engine, same camera — only the g_inv callable differs (ulp
    noise from jnp.power in the mass function); the images must agree on
    all but at most a handful of boundary pixels."""
    res_rot = _disk_render("rotating-bardeen", 0.9, 0.0)
    scene_k = SceneConfig(size=40, metric="kerr", spin=0.9, n_samples=0,
                          integrator=IntegratorConfig(steps=2500,
                                                      delta=0.06,
                                                      dtype="float64"))
    res_k = render_disk(scene_k, DiskConfig(),
                        bg_array=np.full((16, 16, 3), 90, np.uint8))
    s_rot = np.asarray(res_rot.device("status"))
    s_k = np.asarray(res_k.device("status"))
    assert (s_rot != s_k).mean() < 0.01
    both = (s_rot == STATUS_DISK) & (s_k == STATUS_DISK)
    g_rot = np.asarray(res_rot.device("redshift"))[both]
    g_k = np.asarray(res_k.device("redshift"))[both]
    np.testing.assert_allclose(g_rot, g_k, rtol=1e-6)


def test_render_disk_rotating_novikov():
    res = _disk_render("rotating-bardeen", 0.9, 0.2, profile="novikov")
    assert res.counts["disk"] > 20
    assert res.counts["numerical_error"] == 0


def test_rotating_disk_rejects_kerr_only_features():
    scene = SceneConfig(size=8, metric="rotating-bardeen", spin=0.5,
                        metric_param=0.2, n_samples=0)
    with pytest.raises(NotImplementedError, match="polarized"):
        render_disk(scene, DiskConfig(bfield="vertical"))
    with pytest.raises(NotImplementedError, match="rbiting camera"):
        render_disk(scene, DiskConfig(camera_omega="keplerian"))
    with pytest.raises(NotImplementedError, match="edge refinement"):
        render_disk(scene, DiskConfig(), aa_samples=2)


def test_disk_cli_rotating_writes_maps(tmp_path):
    from grtrace.cli.main import main

    out = str(tmp_path / "rot_disk_out")
    main(["--size", "24", "--metric", "rotating-bardeen", "--spin", "0.9",
          "--metric-param", "0.2", "--disk", "--steps", "1500",
          "--delta", "0.06", "--out-dir", out, "--no-plots", "--no-flat",
          "--n-samples", "0"])
    import os
    csv = os.path.join(out, "redshift_map.csv")
    assert os.path.exists(csv)
    rows = np.loadtxt(csv, delimiter=",", skiprows=1, ndmin=2)
    assert rows.shape[0] > 3 and rows.shape[1] == 4
    r_em = rows[:, 3]
    # inner edge = the deformed ISCO (1.97), inside Kerr's 2.32
    assert r_em.min() < 2.32
    assert (r_em >= 1.97 - 0.05).all()

def test_epicyclic_rotating_kerr_newman_oracle():
    """epicyclic_rotating with m = M - Q^2/2r must reproduce the
    independent Kerr-Newman epicyclic layer (which inverts kerr_g_inv)."""
    from grtrace.physics.epicyclic import epicyclic_frequencies

    p = jnp.array([M, 0.7, 0.4])
    for r in (4.0, 6.0, 10.0):
        om, ka, ot = ro.epicyclic_rotating(r, p, _kn_mass, True)
        omk, kak, otk = epicyclic_frequencies(jnp.asarray(r), p, True)
        assert float(om) == pytest.approx(float(omk), rel=1e-10)
        assert float(ka) == pytest.approx(float(kak), rel=1e-10)
        assert float(ot) == pytest.approx(float(otk), rel=1e-10)


def test_epicyclic_rotating_nodal_precession_shrinks():
    """Rotation keeps the Lense-Thirring nodal precession (unlike the
    static families where it is exactly zero), but the regular core's
    smaller enclosed mass m(r) < M weakens it — a quantitative
    discriminator against Kerr at the same spin."""
    def m_kerr(r, params):
        return params[0]

    r = 4.0
    p_def = jnp.array([M, 0.9, 0.5])
    p_kerr = jnp.array([M, 0.9, 0.0])
    om_d, _, ot_d = ro.epicyclic_rotating(r, p_def,
                                          MASS_FN["RotatingBardeen"], True)
    om_k, _, ot_k = ro.epicyclic_rotating(r, p_kerr, m_kerr, True)
    nodal_def = float(om_d - ot_d)
    nodal_kerr = float(om_k - ot_k)
    assert 0.0 < nodal_def < nodal_kerr


def test_qpo_cli_rotating_family(tmp_path):
    from grtrace.cli.qpo import main

    out = main(["--metric", "rotating-bardeen", "--spin", "0.5",
                "--metric-param", "0.3", "--mass-msun", "10",
                "--n", "64", "--out-dir", str(tmp_path)])
    assert out["metric"] == "rotating-bardeen"
    assert out["nu_phi_isco"] > 0
    # rotation splits nu_theta from nu_phi: nonzero nodal band
    import os
    rows = np.loadtxt(os.path.join(str(tmp_path), "qpo_frequencies.csv"),
                      delimiter=",", skiprows=1, ndmin=2)
    nodal = rows[:, 1] - rows[:, 3]          # nu_phi - nu_theta
    assert (nodal[1:] > 0).all()
