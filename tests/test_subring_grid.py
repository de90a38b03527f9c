"""Sharded subring scans (sharding/grid.subring_grid_sharded).

Correctness anchor: the psum-reduced per-order fluxes/pixels/delays must
equal a host recomputation from a single-device render_subrings result
with the same weight rule.  Mesh-shape invariance pins the collective
layout; the physics rows pin the demagnification ordering the scan
exists to measure.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grtrace.sharding.grid import subring_grid_sharded
from grtrace.sharding.mesh import make_mesh

SIZE = 24
STEPS = 2500
DELTA = 0.1
R_OUT = 12.0
N_ORDERS = 3
Q_EM = 3.0


def _sweep(mesh, spins, elevs):
    out = subring_grid_sharded(
        mesh, np.asarray(spins, np.float64), np.asarray(elevs, np.float64),
        30.0, np.deg2rad(80.0), 1.0, 0.0, 31.0, STEPS, DELTA, 1.0, R_OUT,
        height=SIZE, width=SIZE, order=2, n_orders=N_ORDERS,
        dtype=jnp.float64, emissivity_q=Q_EM)
    return tuple(np.asarray(o, np.float64) for o in out)


def test_matches_single_device_recomputation():
    from grtrace import IntegratorConfig, PatchConfig, SceneConfig
    from grtrace.engine.disk import DiskConfig
    from grtrace.engine.hotspot import bl_time_azimuth_offsets
    from grtrace.engine.subring import render_subrings
    from grtrace.physics.orbits import isco_radius, redshift_factor
    from grtrace.physics.spacetime import ks_radius

    spin, elev_deg = 0.9, 30.0
    mesh = make_mesh(1, 8)
    flux, pixels, d01, d_cnt = _sweep(mesh, [spin], [np.deg2rad(elev_deg)])

    scene = SceneConfig(size=SIZE, metric="kerr", spin=spin, n_samples=0,
                        integrator=IntegratorConfig(steps=STEPS,
                                                    delta=DELTA,
                                                    dtype="float64"),
                        patch=PatchConfig())
    res = render_subrings(scene, DiskConfig(r_out=R_OUT,
                                            elevation_deg=elev_deg,
                                            show_background=False),
                          n_orders=N_ORDERS)
    params = jnp.asarray(res["params"])
    valid = res["valid"].reshape(N_ORDERS, -1)
    hq = res["hits_q"].reshape(N_ORDERS, -1, 4)
    hp = res["hits_p"].reshape(N_ORDERS, -1, 4)
    count = res["count"].reshape(-1)
    r_in = float(isco_radius(1.0, spin))
    r_em = np.asarray(ks_radius(jnp.asarray(hq[..., 1]),
                                jnp.asarray(hq[..., 2]),
                                jnp.asarray(hq[..., 3]),
                                jnp.float64(spin)))
    # same receiver geometry as the sweep
    obs = np.array([30.0 * np.cos(np.deg2rad(elev_deg)), 0.0,
                    30.0 * np.sin(np.deg2rad(elev_deg))])
    r_obs = float(ks_radius(*[jnp.float64(v) for v in obs],
                            jnp.float64(spin)))
    th_obs = float(np.arccos(obs[2] / r_obs))
    energy = -hp[..., 0]
    l_z = hq[..., 1] * hp[..., 2] - hq[..., 2] * hp[..., 1]
    g = np.asarray(jax.vmap(jax.vmap(lambda e, l, r: redshift_factor(
        e, l, r, jnp.float64(r_obs), params, True,
        jnp.float64(th_obs))))(jnp.asarray(energy), jnp.asarray(l_z),
                               jnp.asarray(r_em)))
    w = np.where(valid, g ** 4 * np.maximum(r_em, 1e-30) ** (-Q_EM), 0.0)
    np.testing.assert_allclose(flux[0], w.sum(axis=1), rtol=1e-9)
    np.testing.assert_allclose(pixels[0], valid.sum(axis=1), rtol=0)

    both = count > 1
    t_off = np.asarray(jax.vmap(
        lambda r: bl_time_azimuth_offsets(r, params)[0]
    )(jnp.asarray(r_em[:2].reshape(-1)))).reshape(2, -1)
    t_bl = hq[:2, :, 0] - t_off
    ref_d = (t_bl[0] - t_bl[1])[both].mean()
    assert d_cnt[0] == both.sum()
    np.testing.assert_allclose(d01[0], ref_d, rtol=1e-9)


def test_mesh_shape_invariance_and_physics():
    spins = [0.0, 0.5, 0.9, 0.9]
    elevs = np.deg2rad([60.0, 60.0, 60.0, 30.0])
    a = _sweep(make_mesh(1, 8), spins, elevs)
    b = _sweep(make_mesh(2, 4), spins, elevs)
    c = _sweep(make_mesh(4, 2), spins, elevs)
    for x, y in [(a, b), (a, c)]:
        for ax, ay in zip(x, y):
            np.testing.assert_allclose(ax, ay, rtol=1e-12)

    flux, pixels, d01, d_cnt = a
    # per-order demagnification at every grid point that resolves n=1
    resolved = pixels[:, 1] > 0
    assert resolved.sum() >= 3
    assert (flux[resolved, 0] > flux[resolved, 1]).all()
    # crossings delays are positive (causality) wherever measured
    assert (d01[d_cnt > 0] > 0).all()
