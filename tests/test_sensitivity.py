"""engine.sensitivity — forward-mode AD through the geodesic integrator.

The load-bearing claim is that jax.jacfwd of the full pipeline equals
finite differences of the same pipeline: if any piece (the masked
while_loop, the crossing lerp, the Killing redshift, the ISCO inner
edge's d r_in/d spin, the smooth binning, the normalization quotient)
dropped a tangent, the two would diverge far beyond FD truncation error.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.engine.sensitivity import (fisher_forecast,
                                        line_profile_jacobian,
                                        line_profile_model,
                                        smooth_line_profile)

KNOBS = dict(size=16, steps=900, delta=0.1, r_out=12.0)
CENTERS = np.linspace(0.35, 1.25, 32)
THETA = np.array([0.5, 0.3])            # spin, elevation (rad)


def test_smooth_profile_converges_to_histogram():
    rng = np.random.default_rng(5)
    g = rng.uniform(0.4, 1.2, 4000)
    w = rng.uniform(0.0, 1.0, 4000)
    centers = np.linspace(0.3, 1.3, 50)
    dg = centers[1] - centers[0]
    kde = np.asarray(smooth_line_profile(jnp.asarray(g), jnp.asarray(w),
                                         jnp.asarray(centers), 0.5 * dg))
    hist, _ = np.histogram(g, bins=np.r_[centers - dg / 2,
                                         centers[-1] + dg / 2], weights=w)
    # same shape up to the kernel's smoothing (both area-normalized)
    kde_n = kde / kde.sum()
    hist_n = hist / hist.sum()
    assert np.abs(kde_n - hist_n).max() < 0.15 * hist_n.max()
    # the KDE mass equals the total weight (integral invariance)
    np.testing.assert_allclose(kde.sum() * dg, w.sum(), rtol=2e-2)


def test_jacobian_matches_finite_differences():
    """jacfwd through camera -> 900-step while_loop -> crossing capture
    -> redshift -> smooth binning -> normalization == central FD of the
    identical function, in both parameters."""
    prof, jac = line_profile_jacobian(THETA, CENTERS, **KNOBS)
    assert prof.shape == (32,) and jac.shape == (32, 2)
    assert prof.sum() == pytest.approx(1.0, abs=1e-12)
    h = 3e-5
    for k in range(2):
        tp = THETA.copy(); tp[k] += h
        tm = THETA.copy(); tm[k] -= h
        fd = (np.asarray(line_profile_model(jnp.asarray(tp), CENTERS,
                                            **KNOBS))
              - np.asarray(line_profile_model(jnp.asarray(tm), CENTERS,
                                              **KNOBS))) / (2 * h)
        scale = np.abs(jac[:, k]).max()
        assert scale > 0.0              # the observable IS sensitive
        np.testing.assert_allclose(jac[:, k], fd, atol=5e-4 * scale)


def test_normalized_jacobian_columns_sum_to_zero():
    """d(sum prof)/d theta == 0 exactly for the normalized profile — the
    quotient rule through the normalization must close."""
    _, jac = line_profile_jacobian(THETA, CENTERS, **KNOBS)
    np.testing.assert_allclose(jac.sum(axis=0), 0.0, atol=1e-12)


def test_fisher_forecast_closed_form():
    jac = np.array([[1.0, 0.0], [0.0, 2.0], [0.0, 0.0]])
    out = fisher_forecast(jac, noise_sigma=0.5)
    np.testing.assert_allclose(out["fisher"], np.diag([4.0, 16.0]))
    np.testing.assert_allclose(out["errors"], [0.5, 0.25])
    assert out["correlation"] == pytest.approx(0.0)


def test_fisher_from_real_jacobian_is_spd():
    _, jac = line_profile_jacobian(THETA, CENTERS, **KNOBS)
    out = fisher_forecast(jac, noise_sigma=0.01)
    evals = np.linalg.eigvalsh(out["fisher"])
    assert (evals > 0.0).all()
    assert (out["errors"] > 0.0).all()
    assert -1.0 < out["correlation"] < 1.0


def test_gauss_newton_recovers_truth():
    """Local refinement against a (near-)hard-binned observation of the
    same physics: starting half a coarse-grid cell away, Gauss-Newton
    with the soft-binned model + shared smoothing + backtracking walks
    back to the truth; starting AT the truth it stays."""
    from grtrace.engine.sensitivity import gauss_newton_fit

    truth = np.array([0.7, 0.6])          # spin, elevation (rad)
    dg = CENTERS[1] - CENTERS[0]
    obs = np.asarray(line_profile_model(
        jnp.asarray(truth), CENTERS, binning="soft", sigma=0.05 * dg,
        normalize=False, **KNOBS))        # ~ the hard histogram

    start = truth + np.array([0.08, -0.05])
    theta, hist = gauss_newton_fit(start, obs, CENTERS, n_iter=5, **KNOBS)
    assert abs(theta[0] - truth[0]) < 0.02
    assert abs(theta[1] - truth[1]) < 0.01
    # the backtracked iteration never increases the residual
    rns = [h[2] for h in hist]
    assert all(b <= a + 1e-12 for a, b in zip(rns, rns[1:]))

    # fixed point: against MODEL-CONSISTENT data (same soft binning the
    # model uses) the truth is an exact zero-residual point and the
    # iteration must not move.  (Against the near-hard obs above, the
    # stay-precision is the 16^2 camera's own quantization floor ~0.03
    # in spin along the degeneracy valley — data fidelity, not the
    # optimizer.)
    obs_c = np.asarray(line_profile_model(
        jnp.asarray(truth), CENTERS, binning="soft", sigma=0.4 * dg,
        normalize=False, **KNOBS))
    stay, _ = gauss_newton_fit(truth, obs_c, CENTERS, n_iter=2, **KNOBS)
    assert abs(stay[0] - truth[0]) < 1e-3
    assert abs(stay[1] - truth[1]) < 1e-3


def test_fisher_grid_sharded_matches_single_device():
    """The SPMD Fisher map (sharding/grid.fisher_grid_sharded) must
    reproduce, per grid point, exactly the single-device pipeline
    jacfwd(line_profile_model) -> fisher_forecast; and the result must
    be mesh-shape invariant (each point is an independent spacetime —
    the sharding may not touch the numbers)."""
    from grtrace.engine.sensitivity import line_profile_model
    from grtrace.sharding.grid import fisher_grid_sharded
    from grtrace.sharding.mesh import make_mesh

    knobs = dict(size=16, steps=800, n_bins=24)
    spins = np.array([0.5, 0.9], np.float64)
    elevs = np.array([np.deg2rad(30.0), np.deg2rad(60.0)])
    out = np.asarray(fisher_grid_sharded(make_mesh(2, 4), spins, elevs,
                                         0.01, **knobs))
    assert out.shape == (2, 3)

    centers = jnp.linspace(0.1 + 0.5 * 1.5 / 24, 1.6 - 0.5 * 1.5 / 24,
                           24, dtype=jnp.float64)
    import jax
    for k in range(2):
        theta = jnp.array([spins[k], elevs[k]])
        jac = jax.jacfwd(lambda t: line_profile_model(
            t, centers, size=16, steps=800))(theta)
        ref = fisher_forecast(np.asarray(jac), 0.01)
        np.testing.assert_allclose(out[k, :2], ref["errors"], rtol=1e-8)
        np.testing.assert_allclose(out[k, 2], ref["correlation"],
                                   rtol=1e-8)
        # physical sanity: errors positive, |corr| < 1
        assert (out[k, :2] > 0).all() and abs(out[k, 2]) < 1.0

    # mesh-shape invariance: a different frames/rays split recompiles the
    # per-shard vmap (different widths -> different fusion), so demand
    # agreement at the same 1e-8 as the single-device anchor, not bits.
    out18 = np.asarray(fisher_grid_sharded(make_mesh(1, 8), spins, elevs,
                                           0.01, **knobs))
    np.testing.assert_allclose(out18, out, rtol=1e-8)
