"""Kerr-Schild Pallas kernel vs the generic autodiff engine.

Same oracle pattern as test_pallas (Schwarzschild): the interpret-mode
kernel must reproduce the XLA generic path's statuses, step counts and
finals on float64, where op-reordering noise cannot be chaotically
amplified.  The analytic flows themselves are pinned to the autodiff
flows at roundoff in test_kerr_schild_flows.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.engine.integrate_generic import integrate_batch_generic
from grtrace.engine.integrate_pallas_ks import integrate_batch_pallas_ks
from grtrace.physics.camera import camera_rays_cartesian
from grtrace.physics.spacetime import METRICS, kerr_schild_g_inv, make_step
from grtrace.physics.kerr_schild import (fantasy_step_ord2_ks,
                                         hamiltonian_ks)
from grtrace.physics.spacetime import hamiltonian as spacetime_hamiltonian

SPIN = 0.9
PARAMS = jnp.array([1.0, SPIN])


def _camera_batch(size=12, dist=30.0):
    q0, p0, _ = camera_rays_cartesian(
        jnp.array([dist, 0.0, 0.0]), jnp.radians(80.0), size, size,
        params=PARAMS, g_inv_fn=METRICS["KerrSchild"], dtype=jnp.float64)
    return q0.reshape(-1, 4), p0.reshape(-1, 4)


def test_kerr_schild_flows_match_autodiff():
    """Hand-derived KS flows == jax.grad flows to float64 roundoff."""
    rng = np.random.default_rng(0)
    n = 64
    pos = rng.normal(size=(n, 3))
    pos = pos / np.linalg.norm(pos, axis=1, keepdims=True) \
        * rng.uniform(3, 25, (n, 1))
    q = np.zeros((n, 4))
    q[:, 1:] = pos
    p = rng.normal(size=(n, 4))
    q, p = jnp.asarray(q), jnp.asarray(p)

    delta, omega = 0.01, 1.0
    cw = jnp.cos(2 * omega * delta)
    sw = jnp.sin(2 * omega * delta)
    step_auto = make_step(kerr_schild_g_inv)
    subs = ((jnp.float64(delta), cw, sw),)
    qa, pa, _, _ = jax.vmap(
        lambda q1, p1, q2, p2: step_auto(q1, p1, q2, p2, PARAMS, subs)
    )(q, p, q, p)

    comps = tuple([q[:, i] for i in range(4)]
                  + [p[:, i] for i in range(4)]) * 2
    out = fantasy_step_ord2_ks(comps, delta, 1.0, SPIN, cw, sw)
    qb = jnp.stack(out[0:4], -1)
    pb = jnp.stack(out[4:8], -1)
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qb), atol=1e-13)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-13)

    h_auto = jax.vmap(lambda q1, p1: spacetime_hamiltonian(
        q1, p1, PARAMS, kerr_schild_g_inv))(q, p)
    h_an = hamiltonian_ks(q[:, 1], q[:, 2], q[:, 3], p[:, 0], p[:, 1],
                          p[:, 2], p[:, 3], 1.0, SPIN)
    np.testing.assert_allclose(np.asarray(h_auto), np.asarray(h_an),
                               atol=1e-12)


@pytest.mark.parametrize("order", [2, 4])
def test_pallas_ks_matches_generic(order):
    """Interpret-mode kernel == XLA generic engine: statuses and per-ray
    step counts exact, escaped finals to f64 op-reordering noise."""
    q0, p0 = _camera_batch(size=10)
    steps, delta, omega = 1200, 0.05, 1.0

    fq_x, _, st_x, ns_x = integrate_batch_generic(
        q0, p0, steps, delta, PARAMS, 31.0, omega, order=order,
        metric="KerrSchild")
    fq_p, _, st_p, ns_p = integrate_batch_pallas_ks(
        q0, p0, steps, delta, PARAMS, 31.0, omega, order=order,
        interpret=True)

    assert (np.asarray(st_x) == np.asarray(st_p)).all()
    # Exit steps: exact for escapers/survivors; captured plungers may trip
    # the blow-up guard +-1 step from the generic engine — the kernel's
    # staggered (half-A-fused) composition rounds differently at the last
    # ulp, and the horizon blow-up amplifies that chaotically even in f64.
    # Status, park point and classification are unaffected.
    ns_x, ns_p = np.asarray(ns_x), np.asarray(ns_p)
    cap = np.asarray(st_x) == 1
    assert (ns_x[~cap] == ns_p[~cap]).all()
    assert np.abs(ns_x[cap] - ns_p[cap]).max() <= 2
    assert (ns_x == ns_p).mean() > 0.9
    esc = np.asarray(st_x) == 2
    assert esc.any()
    np.testing.assert_allclose(np.asarray(fq_x)[esc], np.asarray(fq_p)[esc],
                               atol=1e-8)


def test_pallas_ks_sort_roundtrip():
    """Cost-sorted tiling must return results in original ray order."""
    q0, p0 = _camera_batch(size=8)
    kw = dict(steps=800, delta=0.05, params=PARAMS, r_max=31.0, omega=1.0,
              interpret=True)
    fq_s, _, st_s, ns_s = integrate_batch_pallas_ks(q0, p0, sort_rays=True,
                                                    **kw)
    fq_u, _, st_u, ns_u = integrate_batch_pallas_ks(q0, p0, sort_rays=False,
                                                    **kw)
    assert (np.asarray(st_s) == np.asarray(st_u)).all()
    assert (np.asarray(ns_s) == np.asarray(ns_u)).all()
    np.testing.assert_allclose(np.asarray(fq_s), np.asarray(fq_u), rtol=0,
                               atol=0)


@pytest.mark.parametrize("order,charge", [(2, 0.0), (4, 0.3)])
def test_ksc_kernel_bit_exact_twin(order, charge):
    """The compensated (Kahan double-float32) KS kernel and its XLA twin
    integrate_batch_ksc build their loop bodies from the same functions
    (engine.integrate_ks.make_ks_step) — results must be bit-identical in
    interpret mode, across orders and with Kerr-Newman charge."""
    from grtrace.engine.integrate_ks import integrate_batch_ksc

    q0, p0 = _camera_batch(size=10)
    q0 = q0.astype(jnp.float32)
    p0 = p0.astype(jnp.float32)
    params = jnp.array([1.0, SPIN, charge], jnp.float32)
    f32 = jnp.float32
    kw = dict(steps=600, delta=f32(0.05), params=params, r_max=f32(31.0),
              omega=f32(1.0), order=order)

    qt, pt, st, nt = integrate_batch_ksc(q0, p0, **kw)
    qk, pk, sk, nk = integrate_batch_pallas_ks(q0, p0, interpret=True,
                                               compensated=True, **kw)
    np.testing.assert_array_equal(np.asarray(qk), np.asarray(qt))
    np.testing.assert_array_equal(np.asarray(pk), np.asarray(pt))
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(st))
    np.testing.assert_array_equal(np.asarray(nk), np.asarray(nt))


def test_ksc_f32_accuracy_vs_f64_oracle():
    """The point of the compensated KS flows: float32 escaped finals stay
    within ~1e-5 of the float64 generic engine where the plain f32 flows
    drift by ~1e-4 already at this short budget (the gap widens as
    sqrt(steps); at the 30k-step production budget the plain drift is the
    measured ~3 px prograde shadow-edge error)."""
    from grtrace.engine.integrate_ks import integrate_batch_ksc

    q0, p0 = _camera_batch(size=10)
    steps, delta, omega = 1500, 0.05, 1.0
    fq64, _, st64, _ = integrate_batch_generic(
        q0, p0, steps, delta, PARAMS, 31.0, omega, metric="KerrSchild")

    f32 = jnp.float32
    q32, p32 = q0.astype(f32), p0.astype(f32)
    p3 = jnp.array([1.0, SPIN, 0.0], f32)
    qc, _, sc, _ = integrate_batch_ksc(q32, p32, steps, f32(delta), p3,
                                       f32(31.0), f32(omega))
    qp, _, sp, _ = integrate_batch_pallas_ks(q32, p32, steps, f32(delta),
                                             p3, f32(31.0), f32(omega),
                                             interpret=True,
                                             compensated=False)
    st64 = np.asarray(st64)
    assert (np.asarray(sc) == st64).all()
    esc = st64 == 2
    assert esc.sum() > 20
    err_comp = np.abs(np.asarray(qc)[esc, 1:]
                      - np.asarray(fq64)[esc, 1:]).max()
    err_plain = np.abs(np.asarray(qp)[esc, 1:]
                       - np.asarray(fq64)[esc, 1:]).max()
    assert err_comp < 1e-5, f"compensated f32 drift {err_comp:.2e}"
    assert err_comp < err_plain / 5.0, (
        f"compensation gain lost: comp {err_comp:.2e} vs plain "
        f"{err_plain:.2e}")


def test_render_generic_backend_arg():
    """The backend static arg threads through render_pixels_generic (the
    pallas value itself needs a real TPU — Mosaic doesn't lower on CPU —
    so CPU coverage pins the xla value and the kernel equivalence above)."""
    from grtrace.engine.render_generic import render_pixels_generic

    size = 8
    bg = jnp.zeros((1, 1, 3), dtype=jnp.uint8)
    common = dict(
        bg_array=bg, obs_x=jnp.float64(30.0),
        fov=jnp.float64(np.radians(80.0)), mass=jnp.float64(1.0),
        spin=jnp.float64(SPIN), boundary_radius=jnp.float64(31.0),
        steps=800, delta=jnp.float64(0.05), omega=jnp.float64(1.0),
        patch_center_theta=jnp.float64(np.pi / 2),
        patch_center_phi=jnp.float64(np.pi),
        patch_size_theta=jnp.float64(np.pi),
        patch_size_phi=jnp.float64(2 * np.pi),
        height=size, width=size, has_background=False,
        dtype=jnp.float64, metric="KerrSchild")
    out_x = render_pixels_generic(**common, backend="xla")
    assert int(np.asarray(out_x["count_vec"])[0]) > 0  # some capture


def test_unroll_invariance_ks():
    """KS kernels: status and n_steps are unroll-invariant at any unroll;
    at a divisor unroll the whole output is byte-identical (licenses
    engine.validate's small-unroll KS probe kernels — the boundary
    bisections only consume statuses)."""
    q0, p0 = _camera_batch(10)
    q0 = q0.astype(jnp.float32)
    p0 = p0.astype(jnp.float32)
    kw = dict(steps=600, delta=0.05, params=PARAMS.astype(jnp.float32),
              r_max=31.0, omega=1.0, compensated=True, interpret=True)
    base = integrate_batch_pallas_ks(q0, p0, unroll=1, **kw)
    out = integrate_batch_pallas_ks(q0, p0, unroll=8, **kw)  # 600 % 8 == 0
    for a, b in zip(base, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = integrate_batch_pallas_ks(q0, p0, unroll=7, **kw)  # remainder 5
    assert bool((base[2] == out[2]).all())
    assert bool((base[3] == out[3]).all())


def test_unroll_invariance_subrings():
    """Crossing records (count + per-order events) are part of the
    divisor-unroll byte-identity contract too."""
    from grtrace.engine.integrate_pallas_ks import (
        integrate_batch_pallas_subrings)
    q0, p0 = _camera_batch(8)
    q0 = q0.astype(jnp.float32)
    p0 = p0.astype(jnp.float32)
    kw = dict(steps=600, delta=0.05, params=PARAMS.astype(jnp.float32),
              r_max=31.0, omega=1.0, n_orders=2, compensated=True,
              interpret=True)
    base = integrate_batch_pallas_subrings(q0, p0, unroll=1, **kw)
    out = integrate_batch_pallas_subrings(q0, p0, unroll=8, **kw)
    for a, b in zip(base, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
