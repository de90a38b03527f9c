"""engine.spectrum — blackbody SEDs from intensity maps, pinned to the
closed-form Planck integral (pi^4/15)(kT/h)^4 and Wien's displacement law.
"""
import numpy as np

from grtrace.engine.spectrum import (PLANCK_H_K, WIEN_HZ_PER_K,
                                     default_nu_grid, disk_sed, planck_nu,
                                     spectral_cube)


def test_planck_integral_matches_closed_form():
    """trapz of the relative Planck curve over the default grid equals
    (pi^4/15) (T / (h/k))^4 — for every pixel temperature at once, which
    also pins that the SED integral reproduces the intensity map up to
    one global constant."""
    rng = np.random.default_rng(3)
    inten = rng.uniform(0.05, 1.0, (5, 7))
    t_peak = 9000.0
    nu = default_nu_grid(t_peak, n=400)
    cube = np.asarray(spectral_cube(inten, t_peak, nu))
    integral = np.trapezoid(cube, nu, axis=0)
    t_obs = t_peak * inten ** 0.25
    expect = (np.pi ** 4 / 15.0) * (t_obs / PLANCK_H_K) ** 4
    np.testing.assert_allclose(integral, expect, rtol=1e-3)


def test_wien_displacement_peak():
    t = 6400.0
    nu = np.linspace(0.2, 3.0, 20000) * WIEN_HZ_PER_K * t
    b = np.asarray(planck_nu(nu, t))
    nu_pk = nu[b.argmax()]
    np.testing.assert_allclose(nu_pk, WIEN_HZ_PER_K * t, rtol=2e-4)


def test_zero_intensity_pixels_are_dark_at_every_frequency():
    inten = np.array([[0.0, 0.5], [0.0, 0.0]])
    cube = np.asarray(spectral_cube(inten, 9000.0, default_nu_grid(9000.0)))
    assert (cube[:, inten == 0.0] == 0.0).all()
    assert (cube[:, inten > 0.0] > 0.0).any()


def test_disk_sed_per_order_shapes_and_flux_ordering():
    """Subring-stacked intensity -> per-order SEDs whose integrals keep
    the layers' flux ordering (the n=0 layer dominates at every scale),
    and a 2D map -> a single SED."""
    rng = np.random.default_rng(11)
    inten = np.zeros((2, 9, 9))
    inten[0, 2:7, 2:7] = rng.uniform(0.3, 1.0, (5, 5))
    inten[1, 4, 3:6] = rng.uniform(0.05, 0.15, 3)
    nu, sed = disk_sed(inten, 9000.0)
    assert sed.shape == (2, nu.size)
    int0 = np.trapezoid(sed[0], nu)
    int1 = np.trapezoid(sed[1], nu)
    assert int0 > int1 > 0.0
    # the layered integrals reproduce the per-order pixel fluxes up to
    # the SAME constant
    c0 = int0 / (9000.0 / PLANCK_H_K) ** 4 / (inten[0] ** 1.0).sum()
    c1 = int1 / (9000.0 / PLANCK_H_K) ** 4 / (inten[1] ** 1.0).sum()
    np.testing.assert_allclose(c0, c1, rtol=1e-3)

    nu2, sed2 = disk_sed(inten[0], 9000.0)
    assert sed2.shape == (nu2.size,)
    np.testing.assert_allclose(sed2, sed[0], rtol=1e-12)
