"""Epicyclic frequencies + AD ISCO vs the closed forms of GR.

The module under test derives everything by autodiff of kerr_g_inv; the
checks here are the independent textbook results it deliberately does
not contain: the Kerr epicyclic closed forms (Okazaki, Kato & Fukue
1987), Bardeen-Press-Teukolsky ISCO, the extremal Reissner-Nordstrom
ISCO = 4M, the Newtonian degeneracy, and the 10-Msun Schwarzschild ISCO
frequency anchor (~220 Hz) for the unit conversion.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.physics.epicyclic import (epicyclic_frequencies,
                                       isco_from_kappa,
                                       qpo_frequencies_hz,
                                       radial_stability)
from grtrace.physics.orbits import isco_radius


def _closed_form(r, mass, a):
    """Kerr epicyclic frequencies (prograde for a >= 0; retrograde is
    a -> -a).  Written independently of the module under test."""
    sq = np.sqrt(mass)
    omega = sq / (r ** 1.5 + a * sq)
    kappa2 = omega ** 2 * (1.0 - 6.0 * mass / r
                           + 8.0 * a * sq * r ** -1.5
                           - 3.0 * a * a / (r * r))
    vert2 = omega ** 2 * (1.0 - 4.0 * a * sq * r ** -1.5
                          + 3.0 * a * a / (r * r))
    return omega, np.sqrt(max(kappa2, 0.0)), np.sqrt(max(vert2, 0.0))


@pytest.mark.parametrize("a", [0.0, 0.5, 0.9])
@pytest.mark.parametrize("r", [8.0, 12.0])
def test_kerr_closed_forms(a, r):
    got = np.array([float(x) for x in epicyclic_frequencies(
        jnp.float64(r), jnp.array([1.0, a]))])
    want = np.array(_closed_form(r, 1.0, a))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_retrograde_is_sign_flipped_spin():
    got = np.array([float(x) for x in epicyclic_frequencies(
        jnp.float64(10.0), jnp.array([1.0, 0.7]), prograde=False)])
    want = np.array(_closed_form(10.0, 1.0, -0.7))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_frequency_ordering_in_kerr():
    # the QPO-model-defining hierarchy: kappa < Omega_theta < Omega_phi
    # for prograde orbits around a spinning hole
    om, ka, ov = epicyclic_frequencies(jnp.float64(7.0),
                                       jnp.array([1.0, 0.9]))
    assert float(ka) < float(ov) < float(om)


def test_newtonian_degeneracy():
    # far field: all three frequencies collapse onto the Kepler value
    om, ka, ov = epicyclic_frequencies(jnp.float64(1e4),
                                       jnp.array([1.0, 0.9]))
    np.testing.assert_allclose(float(ka) / float(om), 1.0, atol=1e-3)
    np.testing.assert_allclose(float(ov) / float(om), 1.0, atol=1e-4)


@pytest.mark.parametrize("a,prograde", [(0.0, True), (0.5, True),
                                        (0.9, True), (0.9, False),
                                        (0.998, True)])
def test_isco_matches_bpt_for_kerr(a, prograde):
    got = float(isco_from_kappa(jnp.array([1.0, a]), prograde))
    want = float(isco_radius(1.0, a, prograde))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


def test_isco_extremal_reissner_nordstrom_is_4m():
    # the classic strong-charge benchmark — no Kerr formula knows this
    got = float(isco_from_kappa(jnp.array([1.0, 0.0, 1.0])))
    np.testing.assert_allclose(got, 4.0, rtol=0, atol=1e-10)


def test_isco_kerr_newman_roots_kappa():
    params = jnp.array([1.0, 0.6, 0.5])
    r_isco = isco_from_kappa(params)
    # the root is exact and transversal: unstable just inside, stable
    # just outside
    assert abs(float(radial_stability(r_isco, params))) < 1e-12
    assert float(radial_stability(r_isco - 0.05, params)) < 0.0
    assert float(radial_stability(r_isco + 0.05, params)) > 0.0
    # charge shrinks the ISCO relative to the same-spin Kerr hole
    assert float(r_isco) < float(isco_radius(1.0, 0.6))


def test_qpo_hz_anchor_10msun_schwarzschild():
    # nu_ISCO = c^3 / (2 pi G M 6^{3/2}) = 219.9 Hz for M = 10 Msun
    out = qpo_frequencies_hz(jnp.float64(6.0), jnp.array([1.0, 0.0]), 10.0)
    np.testing.assert_allclose(float(out["nu_phi"]), 220.0, rtol=1e-3)
    assert abs(float(out["nu_r"])) < 1e-3       # kappa vanishes at ISCO
    # Schwarzschild: no frame dragging, no nodal precession
    np.testing.assert_allclose(float(out["nu_nodal"]), 0.0, atol=1e-9)


def test_lense_thirring_weak_field_scaling():
    # nodal precession Omega_phi - Omega_theta -> (2 a M / r^3) *
    # (1 - 3a / (4 sqrt(M r)) + ...) far out; the second term is still
    # 9% at r = 60M, so the check keeps it
    a, r = 0.9, 60.0
    om, _, ov = epicyclic_frequencies(jnp.float64(r), jnp.array([1.0, a]))
    pred = 2.0 * a / r ** 3 * (1.0 - 0.75 * a / np.sqrt(r))
    np.testing.assert_allclose(float(om - ov), pred, rtol=5e-3)


def test_qpo_cli(tmp_path):
    from grtrace.cli.qpo import main
    out = main(["--spin", "0.9", "--preset", "grs1915",
                "--n", "64", "--out-dir", str(tmp_path)])
    assert (tmp_path / "qpo_frequencies.csv").exists()
    assert (tmp_path / "qpo_frequencies.png").exists()
    data = np.genfromtxt(tmp_path / "qpo_frequencies.csv",
                         delimiter=",", names=True)
    assert data.shape[0] == 64
    # ISCO row: radial epicyclic ~ 0, orbital at the BPT radius
    np.testing.assert_allclose(out["r_isco_over_M"],
                               float(isco_radius(1.0, 0.9)), atol=1e-8)
    assert data["nu_r_Hz"][0] < 1e-6 * data["nu_phi_Hz"][0]
    # GRS 1915+105 ballpark: prograde a=0.9, 12.4 Msun -> nu_phi(ISCO)
    # in the hundreds of Hz (the observed 168 Hz QPO sits below it)
    assert 200.0 < out["nu_phi_isco"] < 2000.0
    assert out["nu_r_max"] > 0.0
