"""Photon-shell closed-form anchors for the subring decomposition.

Schwarzschild face-on geometry has two exact numbers the subring data
must reproduce:

  * successive equatorial crossings of a near-critical ray are
    half-orbits of the r = 3M photon sphere, so their BL coordinate-time
    gaps approach the half-period  pi / Omega_ph = 3 sqrt(3) pi M
    = 16.32419... M  (Omega_ph = M^{1/2} / r_ph^{3/2});
  * the image-order bands converge on the critical curve geometrically
    with the Lyapunov ratio e^{pi} = 23.14 per order (Gralla-Holz-Wald
    demagnification) — measured here as the bisected outer-edge offsets
    (e_n - u_c) of the count >= n regions.

A fixed-step symplectic integrator bounds the resolvable depth:
truncation error acts as impact-parameter noise, so the assertions run
at order 4 / delta 0.02 where five crossings are clean in float64 (see
DESIGN.md #19).  Everything here bisects with ONE jitted single-ray
program — the whole file runs in well under a minute.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.engine.hotspot import bl_time_azimuth_offsets
from grtrace.engine.subring import integrate_batch_subrings
from grtrace.physics.camera import cartesian_ics_from_pixels
from grtrace.physics.spacetime import METRICS

PARAMS = jnp.array([1.0, 0.0, 0.0])
OBS = jnp.array([0.0, 0.0, 30.0])
HALF_PERIOD = float(np.pi * 3.0 * np.sqrt(3.0))    # pi / Omega_ph, M = 1
E_PI = float(np.exp(np.pi))


@jax.jit
def _run(u):
    """One face-on ray at image-plane offset u -> (status, count, t_ks,
    r_ks) of its first 10 plane crossings (order 4, delta 0.02)."""
    pix = jnp.stack([jnp.atleast_1d(u), jnp.zeros(1),
                     jnp.full((1,), 24.0)], axis=-1)
    q0, p0, _ = cartesian_ics_from_pixels(OBS, pix, params=PARAMS,
                                          g_inv_fn=METRICS["KerrSchild"])
    _, _, status, _, hq, hp, count = integrate_batch_subrings(
        q0, p0, 300_000, 0.02, PARAMS, 31.0, 0.0, n_orders=10, order=4)
    r = jnp.sqrt(hq[:, 0, 1] ** 2 + hq[:, 0, 2] ** 2 + hq[:, 0, 3] ** 2)
    return status[0], count[0], hq[:, 0, 0], r


@pytest.fixture(scope="module")
def u_crit():
    """Bisected capture/escape boundary of the face-on fan."""
    lo, hi = 0.889, 0.892
    for _ in range(45):
        mid = 0.5 * (lo + hi)
        s, _, _, _ = _run(jnp.float64(mid))
        if int(s) == 2:
            hi = mid
        else:
            lo = mid
    return hi


def test_crossing_gaps_hit_photon_sphere_half_period(u_crit):
    s, c, t_ks, r = _run(jnp.float64(u_crit + 1e-10))
    c = int(c)
    assert c >= 5, f"expected >= 5 crossings just outside critical, got {c}"
    t_ks, r = np.asarray(t_ks), np.asarray(r)
    # the deep (middle) crossings happen ON the photon sphere
    assert abs(r[1] - 3.0) < 0.06 and abs(r[2] - 3.0) < 0.06
    t_off = np.asarray(jax.vmap(
        lambda rr: bl_time_azimuth_offsets(rr, PARAMS)[0])(jnp.asarray(r)))
    t_bl = t_ks - t_off
    gap12 = t_bl[1] - t_bl[2]
    gap23 = t_bl[2] - t_bl[3]
    assert abs(gap12 / HALF_PERIOD - 1.0) < 5e-3
    assert abs(gap23 / HALF_PERIOD - 1.0) < 5e-3


def test_order_bands_demagnify_by_e_pi(u_crit):
    def count_at(u):
        s, c, _, _ = _run(jnp.float64(u))
        return int(c)

    edges = {}
    for n in (3, 4, 5):
        lo, hi = u_crit, 1.10
        for _ in range(50):
            mid = 0.5 * (lo + hi)
            if count_at(mid) >= n:
                lo = mid
            else:
                hi = mid
        edges[n] = lo - u_crit
    # every order's band shrinks geometrically ...
    r34 = edges[3] / edges[4]
    r45 = edges[4] / edges[5]
    assert 15.0 < r34 < 40.0
    assert 15.0 < r45 < 40.0
    # ... and the asymptotic-regime ratio lands on e^pi (the n = 4 band
    # is deep enough to be asymptotic yet well above the truncation
    # noise floor; measured 23.54 vs 23.14)
    assert abs(r34 / E_PI - 1.0) < 0.15
