"""Walker-Penrose polarization transport, validated against a numerical
parallel-transport oracle.

The oracle integrates the transport equation df/dlam = -Gamma k f along
the geodesic with RK4 and autodiff Christoffel symbols of the KS metric —
fully independent of the WP algebra under test.  If any piece of the
pipeline (KS->BL phase-space map, the WP constant, the epsilon-tensor
emission geometry, the camera screen solve) had a wrong sign or factor,
kappa would drift or the reconstructed EVPA would diverge from the
directly-transported one.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grtrace.physics import polarization as pol
from grtrace.physics.orbits import circular_u_t
from grtrace.physics.spacetime import (kerr_g_inv, kerr_schild_g_inv,
                                       ks_radius)

PARAMS = jnp.array([1.0, 0.9, 0.0])


def _g_cov_ks(q, params):
    """Covariant KS metric eta + 2 H l l (oracle-side, independent of
    pol.ks_lower which builds the product directly)."""
    mass, a = params[0], params[1]
    x, y, z = q[1], q[2], q[3]
    r = ks_radius(x, y, z, a)
    w = r * r + a * a
    h = mass * r / (r * r + (a * z / r) ** 2)
    l_cov = jnp.stack([jnp.ones_like(r), (r * x + a * y) / w,
                       (r * y - a * x) / w, z / r])
    eta = jnp.diag(jnp.array([-1.0, 1.0, 1.0, 1.0]))
    return eta + 2.0 * h * jnp.outer(l_cov, l_cov)


def _christoffel(q, params):
    dg = jax.jacfwd(lambda qq: _g_cov_ks(qq, params))(q)   # d_c g_{ab}
    g_inv = kerr_schild_g_inv(q, params)
    d_a = jnp.transpose(dg, (2, 0, 1))                     # (a, n, b)
    return 0.5 * jnp.einsum(
        "mn,anb->mab", g_inv,
        d_a + jnp.transpose(d_a, (2, 1, 0)) - jnp.transpose(d_a, (1, 0, 2)))


def _transport_rhs(state, params):
    q, k, f = state[:4], state[4:8], state[8:12]
    gam = _christoffel(q, params)
    dk = -jnp.einsum("mab,a,b->m", gam, k, k)
    df = -jnp.einsum("mab,a,b->m", gam, k, f)
    return jnp.concatenate([k, dk, df])


@jax.jit
def _rk4(state, params, h, n):
    def body(_, s):
        k1 = _transport_rhs(s, params)
        k2 = _transport_rhs(s + 0.5 * h * k1, params)
        k3 = _transport_rhs(s + 0.5 * h * k2, params)
        k4 = _transport_rhs(s + h * k3, params)
        return s + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    return jax.lax.fori_loop(0, n, body, state)


def _null_k(q, direction, params):
    """Future-pointing null vector along the given spatial direction."""
    g = _g_cov_ks(q, params)
    d = direction / jnp.linalg.norm(direction)
    gtt, gti, gij = g[0, 0], g[0, 1:] @ d, d @ g[1:, 1:] @ d
    disc = jnp.sqrt(gti * gti - gtt * gij)
    kt = (-gti + disc) / gtt
    kt = jnp.where(kt > 0, kt, (-gti - disc) / gtt)
    return jnp.concatenate([kt[None], d])


@pytest.fixture(scope="module")
def transported_ray():
    """One escaping ray from an equatorial emission event at a = 0.9,
    with its synchrotron polarization vector parallel-transported by the
    RK4 oracle to r ~ 41."""
    q0 = jnp.array([0.0, 8.0, 0.0, 0.0])
    k0 = _null_k(q0, jnp.array([0.55, 0.3, 0.8]), PARAMS)
    g0 = _g_cov_ks(q0, PARAMS)
    p0_cov = g0 @ k0
    q_bl0, p_bl0 = pol.bl_from_ks(q0, p0_cov, PARAMS)

    # build the emission f in BL (the module's own recipe), then map the
    # vector back to KS to seed the oracle
    u_t, om = circular_u_t(q_bl0[1], PARAMS, True)
    u_up = jnp.array([1.0, 0.0, 0.0, 0.0]) * u_t + \
        jnp.array([0.0, 0.0, 0.0, 1.0]) * (u_t * om)
    b_up = pol.disk_field_b(q_bl0, u_up, PARAMS, "vertical")
    gcov_bl = pol._bl_lower_matrix(q_bl0, PARAMS)
    f_bl = pol._eps_contract(q_bl0, gcov_bl @ u_up, p_bl0, gcov_bl @ b_up,
                             PARAMS)
    f_bl = f_bl / jnp.sqrt(f_bl @ gcov_bl @ f_bl)
    jac = jax.jacfwd(lambda w: pol.bl_cov_from_ks_cov(q0, w, PARAMS))(
        jnp.zeros(4))
    f0 = kerr_schild_g_inv(q0, PARAMS) @ jnp.linalg.solve(jac, gcov_bl @ f_bl)

    kap1, kap2, _ = pol.emission_polarization(q_bl0, p_bl0, PARAMS,
                                              True, "vertical")
    state = jnp.concatenate([q0, k0, f0])
    checkpoints = [state]
    for _ in range(8):
        state = _rk4(state, PARAMS, 0.005, 1000)
        checkpoints.append(state)
    return dict(q0=q0, k0=k0, f0=f0, kappa=(float(kap1), float(kap2)),
                checkpoints=checkpoints)


def test_ks_bl_map_hamiltonian_invariance():
    """The chart map is exact: H computed from the two independent metric
    implementations agrees at random phase points (incl. charge)."""
    rng = np.random.default_rng(7)
    for params in (jnp.array([1.0, 0.9, 0.3]), jnp.array([1.0, 0.7, 0.0]),
                   jnp.array([1.0, 0.0, 0.0])):
        for _ in range(8):
            pos = rng.normal(size=3) * 6 + np.array([8.0, 0.0, 0.0])
            q_ks = jnp.array([0.3, *pos])
            p_ks = jnp.array(rng.normal(size=4))
            q_bl, p_bl = pol.bl_from_ks(q_ks, p_ks, params)
            h_ks = 0.5 * p_ks @ kerr_schild_g_inv(q_ks, params) @ p_ks
            h_bl = 0.5 * p_bl @ kerr_g_inv(q_bl, params) @ p_bl
            assert float(h_bl) == pytest.approx(float(h_ks), abs=1e-12,
                                                rel=1e-12)


def test_walker_penrose_conserved_along_transport(transported_ray):
    """kappa evaluated from the oracle-transported (k, f) at every
    checkpoint equals the emission value to near roundoff; transport
    also preserves f.k = 0 and f.f = 1 (internal oracle health)."""
    kap1_0, kap2_0 = transported_ray["kappa"]
    for st in transported_ray["checkpoints"]:
        q, k, f = st[:4], st[4:8], st[8:12]
        g = _g_cov_ks(q, PARAMS)
        q_bl, p_bl = pol.bl_from_ks(q, g @ k, PARAMS)
        f_bl = pol.raise_bl(q_bl, pol.bl_cov_from_ks_cov(q, g @ f, PARAMS),
                            PARAMS)
        k_bl = pol.raise_bl(q_bl, p_bl, PARAMS)
        kap1, kap2 = pol.walker_penrose(q_bl, k_bl, f_bl, PARAMS[1])
        assert float(kap1) == pytest.approx(kap1_0, abs=1e-9)
        assert float(kap2) == pytest.approx(kap2_0, abs=1e-9)
        assert abs(float(f @ g @ k)) < 1e-10
        assert float(f @ g @ f) == pytest.approx(1.0, abs=1e-9)


def test_observer_evpa_matches_transported_polarization(transported_ray):
    """The WP screen reconstruction at the far end of the ray reproduces
    the directly-transported polarization angle — the full pipeline
    (emission algebra -> conservation -> camera solve) in one assert."""
    st = transported_ray["checkpoints"][-1]
    q, k, f = st[:4], st[4:8], st[8:12]
    g = _g_cov_ks(q, PARAMS)
    p_cov = g @ k
    up3 = jnp.array([0.1, -0.2, 0.97])
    right3 = jnp.array([0.9, 0.4, 0.1])
    kap1, kap2 = transported_ray["kappa"]
    evpa, cnorm = pol.observer_evpa(jnp.asarray(kap1), jnp.asarray(kap2),
                                    q, p_cov, up3, right3, PARAMS)
    assert float(cnorm) == pytest.approx(1.0, abs=1e-6)

    # direct projection of the transported f on the same screen
    def dot(a_up, b_up):
        return float(pol.ks_dot(q, a_up, b_up, PARAMS))

    u_obs = jnp.array([1.0, 0.0, 0.0, 0.0])
    u_obs = u_obs / np.sqrt(-dot(u_obs, u_obs))
    n_hat = k + dot(k, u_obs) * u_obs
    n_hat = n_hat / np.sqrt(dot(n_hat, n_hat))

    def screen(v3):
        e = jnp.concatenate([jnp.zeros(1), v3 / jnp.linalg.norm(v3)])
        e = e + dot(e, u_obs) * u_obs
        return e - dot(e, n_hat) * n_hat

    e1 = screen(up3)
    e1 = e1 / np.sqrt(dot(e1, e1))
    e2 = screen(right3)
    e2 = e2 - dot(e2, e1) * e1
    e2 = e2 / np.sqrt(dot(e2, e2))
    evpa_direct = np.mod(np.arctan2(dot(f, e2), dot(f, e1)), np.pi)
    diff = abs(float(evpa) - evpa_direct)
    assert min(diff, np.pi - diff) < 1e-6


def test_emission_polarization_flat_limit():
    """Far from the hole the emitter is Newtonian: sin^2(theta_B) reduces
    to the flat 3-vector pitch angle between the photon direction and
    the field."""
    params = jnp.array([1.0, 0.0, 0.0])
    r = 1.0e6
    q_bl = jnp.array([0.0, r, jnp.pi / 2, 0.3])
    g_cov = pol._bl_lower_matrix(q_bl, params)
    for dirn, expect in [
        (jnp.array([0.0, 0.0, -1.0, 0.0]), 0.0),    # along +z = along B
        (jnp.array([0.0, 1.0, 0.0, 0.0]), 1.0),     # radial: perp to B
    ]:
        d = dirn / jnp.sqrt(dirn @ g_cov @ dirn)
        t_hat = jnp.array([1.0, 0.0, 0.0, 0.0]) / jnp.sqrt(-g_cov[0, 0])
        p_bl = g_cov @ (t_hat + d)                   # null to O(M/r)
        _, _, s2b = pol.emission_polarization(q_bl, p_bl, params,
                                              True, "vertical")
        assert float(s2b) == pytest.approx(expect, abs=2e-3)


def test_wp_gauge_invariance_and_linearity(transported_ray):
    """kappa(f + lam k) = kappa(f) and kappa is linear in f — the two
    properties the camera solve relies on."""
    st = transported_ray["checkpoints"][3]
    q, k, f = st[:4], st[4:8], st[8:12]
    g = _g_cov_ks(q, PARAMS)
    q_bl, p_bl = pol.bl_from_ks(q, g @ k, PARAMS)
    k_bl = pol.raise_bl(q_bl, p_bl, PARAMS)

    def kap(v_ks):
        v_bl = pol.raise_bl(q_bl, pol.bl_cov_from_ks_cov(q, g @ v_ks,
                                                         PARAMS), PARAMS)
        return np.array([float(x) for x in
                         pol.walker_penrose(q_bl, k_bl, v_bl, PARAMS[1])])

    base = kap(f)
    np.testing.assert_allclose(kap(f + 17.3 * k), base, atol=1e-8)
    np.testing.assert_allclose(kap(2.5 * f), 2.5 * base, rtol=1e-12)
    w = jnp.array([0.3, -1.2, 0.8, 0.05])
    np.testing.assert_allclose(kap(f + w), base + kap(w), rtol=1e-10)


# ---------------------------------------------------------------------------
# polarized disk imaging (engine.disk + physics.polarization)
# ---------------------------------------------------------------------------

def _face_on_scene():
    from grtrace.io.scene import IntegratorConfig, SceneConfig
    return SceneConfig(size=40, metric="kerr", spin=0.0, n_samples=0,
                       integrator=IntegratorConfig(steps=2500, delta=0.06,
                                                   dtype="float64"))


def test_render_disk_polarized_toroidal_radial_pattern():
    """Face-on Schwarzschild disk with a toroidal field: E perp B makes
    the EVPA ticks radial on the screen (the classic pattern), bent only
    by the O(v) aberration of the Keplerian flow — a closed-form-symmetry
    check of the whole imaging pipeline including the screen-orientation
    conventions."""
    from grtrace.engine.disk import DiskConfig, render_disk
    res = render_disk(_face_on_scene(),
                      DiskConfig(elevation_deg=89.9, show_background=False,
                                 bfield="toroidal"))
    dm = np.asarray(res.cls) == 5
    assert dm.sum() > 100
    evpa = np.asarray(res.device("evpa"))
    chk = np.asarray(res.device("pol_check"))[dm]
    np.testing.assert_allclose(chk, 1.0, atol=1e-3)
    ii, jj = np.nonzero(dm)
    psi = np.mod(np.arctan2(jj - 19.5, ii - 19.5), np.pi)
    d = np.abs(evpa[dm] - psi)
    d = np.minimum(d, np.pi - d)
    assert np.median(d) < 0.05
    assert d.max() < 0.2


def test_render_disk_polarized_vertical_weights():
    """Vertical field, face-on: for direct-image pixels the pitch-angle
    weight is set by the Keplerian aberration, sin^2 ~ v_loc^2 plus the
    finite-distance geometry — small; the strongly-lensed far-side arc
    photons stand out with large weights.  Pinned loosely around the
    closed-form v_loc^2 = M/(r - 2M)."""
    from grtrace.engine.disk import DiskConfig, render_disk
    res = render_disk(_face_on_scene(),
                      DiskConfig(elevation_deg=89.9, show_background=False,
                                 bfield="vertical"))
    dm = np.asarray(res.cls) == 5
    w = np.asarray(res.device("pol_weight"))
    hq = np.asarray(res.device("hit_q"))[dm]
    r_em = np.sqrt((hq[:, 1:] ** 2).sum(axis=-1))
    wd = w[dm]
    outer = (r_em > 11.0) & (r_em < 14.0)
    v2 = 1.0 / (r_em[outer] - 2.0)
    assert outer.sum() > 30
    # aberration floor and a loose ceiling (geometry adds, lensing absent
    # in the outer direct image)
    assert (wd[outer] > 0.8 * v2).all()
    assert (wd[outer] < 3.0 * v2).all()


def test_disk_cli_writes_polarization_maps(tmp_path):
    from grtrace.cli.main import main
    out = str(tmp_path / "pol_out")
    main(["--size", "24", "--metric", "kerr", "--spin", "0.9", "--disk",
          "--disk-bfield", "vertical", "--steps", "1500", "--delta", "0.06",
          "--out-dir", out, "--no-plots", "--no-flat", "--n-samples", "0"])
    import os
    csv = os.path.join(out, "polarization_map.csv")
    assert os.path.exists(csv)
    assert os.path.exists(os.path.join(out, "polarization_map.png"))
    rows = np.loadtxt(csv, delimiter=",", skiprows=1, ndmin=2)
    assert rows.shape[0] > 5 and rows.shape[1] == 5
    evpa, wgt, chk = rows[:, 2], rows[:, 3], rows[:, 4]
    assert ((evpa >= 0.0) & (evpa <= np.pi)).all()
    assert ((wgt >= 0.0) & (wgt <= 1.0 + 1e-9)).all()
    np.testing.assert_allclose(chk, 1.0, atol=5e-3)


# ---------------------------------------------------------------------------
# per-order polarized subrings (engine.subring)
# ---------------------------------------------------------------------------

def test_subring_slot0_evpa_matches_opaque_disk():
    """Order-0 EVPA equals the opaque disk's EVPA wherever the FIRST
    plane crossing lands in the annulus: same recorded event (pinned
    bit-exact in tests/test_subring.py), same camera ray, same pure
    function (disk.polarization_fields) — so the per-order vmap wiring
    cannot silently change the physics."""
    from grtrace.engine.disk import DiskConfig, render_disk
    from grtrace.engine.subring import render_subrings

    scene = _face_on_scene()
    cfg = DiskConfig(elevation_deg=89.9, show_background=False,
                     bfield="toroidal")
    res_d = render_disk(scene, cfg)
    res_s = render_subrings(scene, cfg, n_orders=2)

    dm = np.asarray(res_d.cls) == 5
    v0 = res_s["valid"][0]
    # first-crossing-in-annulus pixels are a subset of the disk's hits
    assert v0.sum() > 100
    assert (dm[v0]).all()
    np.testing.assert_allclose(res_s["evpa"][0][v0],
                               np.asarray(res_d.device("evpa"))[v0],
                               atol=1e-12)
    np.testing.assert_allclose(res_s["pol_check"][0][v0], 1.0, atol=1e-3)


def test_subring_per_order_polarization_structure():
    """Per-order EVPA stack sanity on a spinning hole: every valid event
    has a well-conditioned screen solve (pol_check ~ 1), EVPA lands in
    [0, pi), off-layer pixels are exactly zeroed, and the order-0 -> 1
    twist statistic is finite when both layers populate."""
    from grtrace.engine.disk import DiskConfig
    from grtrace.engine.subring import render_subrings, subring_summary
    from grtrace.io.scene import IntegratorConfig, SceneConfig

    scene = SceneConfig(size=44, metric="kerr", spin=0.9, n_samples=0,
                        integrator=IntegratorConfig(steps=6000, delta=0.1,
                                                    dtype="float64"))
    cfg = DiskConfig(elevation_deg=80.0, show_background=False,
                     bfield="vertical")
    res = render_subrings(scene, cfg, n_orders=2)
    valid = res["valid"]
    evpa, chk = res["evpa"], res["pol_check"]
    assert valid[1].sum() > 10          # the n=1 ring resolves
    for i in range(2):
        # near-ISCO events at a=0.9 condition the screen solve to ~3%
        # (r_em ~ 2.5-3.5; the a=0 opaque-disk tests above see < 1e-3)
        np.testing.assert_allclose(chk[i][valid[i]], 1.0, atol=5e-2)
        assert ((evpa[i][valid[i]] >= 0.0)
                & (evpa[i][valid[i]] < np.pi)).all()
        assert (evpa[i][~valid[i]] == 0.0).all()
    s = subring_summary(res)
    tw = s["evpa_twist_per_order_rad"]
    assert len(tw) == 1 and np.isfinite(tw[0])
    print("twist 0->1 (rad):", tw[0])


@pytest.fixture(scope="module")
def subring_toroidal_faceon():
    """Face-on Schwarzschild transparent disk with a toroidal field —
    the maximal-symmetry polarized scene, shared by the pattern and
    beta_m tests."""
    from grtrace.engine.disk import DiskConfig
    from grtrace.engine.subring import render_subrings
    from grtrace.io.scene import IntegratorConfig, SceneConfig

    size = 60
    scene = SceneConfig(size=size, metric="kerr", spin=0.0, n_samples=0,
                        integrator=IntegratorConfig(steps=6000, delta=0.06,
                                                    dtype="float64"))
    cfg = DiskConfig(elevation_deg=89.9, show_background=False,
                     bfield="toroidal")
    return size, render_subrings(scene, cfg, n_orders=2)


def test_subring_order1_toroidal_radial_pattern(subring_toroidal_faceon):
    """Face-on Schwarzschild + toroidal field: the n=1 (once-looped)
    image's EVPA must ALSO be screen-radial — the z -> -z mirror maps
    the n=1 bundle onto a direct one while preserving the toroidal
    field's E-perp-B screen direction.  Measured: max radial deviation
    0.009 rad (tighter than n=0's 0.06, which carries more Keplerian
    aberration at its smaller emission radii)."""
    size, res = subring_toroidal_faceon
    c = (size - 1) / 2
    v1 = res["valid"][1]
    assert v1.sum() >= 10
    ii, jj = np.nonzero(v1)
    psi = np.mod(np.arctan2(jj - c, ii - c), np.pi)
    d = np.abs(res["evpa"][1][v1] - psi)
    d = np.minimum(d, np.pi - d)
    assert np.median(d) < 0.05
    assert d.max() < 0.1


def test_subring_beta2_radial_pattern_closed_form(subring_toroidal_faceon):
    """beta_m decomposition against the closed-form symmetry: a radial
    EVPA pattern (chi = psi) has arg(beta_2) = 0 exactly, and the scene's
    rotational symmetry kills beta_1.  |beta_2| is bounded by the mean
    pitch weight (it IS the intensity-weighted mean of p e^{2i(chi-psi)},
    |.| <= <p> < 1)."""
    from grtrace.engine.subring import polarized_moments, subring_summary

    _, res = subring_toroidal_faceon
    beta = polarized_moments(res, ms=(1, 2))
    for n in range(2):
        b2 = beta[2][n]
        assert abs(b2) > 0.01                      # polarized at all
        assert abs(np.angle(b2)) < 0.06            # radial: arg -> 0
        assert abs(beta[1][n]) < 0.15 * abs(b2)    # m=1 symmetry-killed
        assert abs(b2) < 1.0
    s = subring_summary(res)
    assert s["beta2_abs_per_order"][0] == pytest.approx(abs(beta[2][0]))
    assert abs(s["beta2_arg_per_order_rad"][1]) < 0.06


# ---------------------------------------------------------------------------
# moving-camera polarization (round 4): boosted EVPA screen basis
# ---------------------------------------------------------------------------

def _minkowski_boost(beta_vec):
    """Explicit Lorentz boost matrix taking lab components to the frame
    of an observer moving with 3-velocity beta_vec (numpy, independent
    of every grtrace tetrad routine)."""
    b = np.asarray(beta_vec, float)
    b2 = b @ b
    g = 1.0 / np.sqrt(1.0 - b2)
    lam = np.eye(4)
    lam[0, 0] = g
    lam[0, 1:] = lam[1:, 0] = -g * b
    lam[1:, 1:] += (g - 1.0) * np.outer(b, b) / max(b2, 1e-30)
    return lam


def test_observer_evpa_flat_limit_matches_sr_boost():
    """M = a = 0 collapses the whole GR machinery to special relativity,
    where the boosted-screen EVPA has a closed form: Lorentz-boost the
    photon, the polarization and the camera frame vectors, then measure
    the angle in the aberrated transverse plane.  The GR path
    (walker_penrose + observer_evpa with omega_obs) must reproduce that
    to float64 roundoff — and differ from the static answer (the
    aberration rotation is the physics being added)."""
    from grtrace.physics.polarization import observer_evpa, walker_penrose

    dt = jnp.float64
    params = jnp.zeros(3, dt)                       # flat spacetime
    obs = np.array([30.0, 0.0, 0.0])
    omega = 0.01                                    # beta = 0.3 at r = 30
    beta_vec = np.array([-omega * obs[1], omega * obs[0], 0.0])

    q0 = jnp.asarray([0.0, *obs], dt)
    # incoming photon, generic direction (not aligned with any axis)
    n = np.array([-0.6, 0.5, 0.4])
    n /= np.linalg.norm(n)
    k_up = np.array([1.0, *n])                      # null: flat metric
    p_cov = np.array([-1.0, *n])                    # eta_mn k^n

    # camera look-at frame for obs on +x: axis=-x, right, up (the same
    # construction _lookat_frame uses, done independently here)
    axis = -obs / np.linalg.norm(obs)
    right = np.cross(axis, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, axis)

    def mdot(a, b):
        return -a[0] * b[0] + a[1:] @ b[1:]

    # build a physical unit polarization transverse to k in the STATIC
    # frame screen, at 35 degrees from up
    def static_screen():
        u = np.array([1.0, 0.0, 0.0, 0.0])
        nh = k_up + mdot(k_up, u) * u
        nh = nh / np.sqrt(mdot(nh, nh))
        e1 = np.r_[0.0, up]
        e1 += mdot(e1, u) * u
        e1 -= mdot(e1, nh) * nh
        e1 /= np.sqrt(mdot(e1, e1))
        e2 = np.r_[0.0, right]
        e2 += mdot(e2, u) * u
        e2 -= mdot(e2, nh) * nh
        e2 -= mdot(e2, e1) * e1
        e2 /= np.sqrt(mdot(e2, e2))
        return e1, e2

    chi0 = np.deg2rad(35.0)
    e1s, e2s = static_screen()
    f = np.cos(chi0) * e1s + np.sin(chi0) * e2s

    kap1, kap2 = walker_penrose(
        jnp.asarray([0.0, 30.0, np.pi / 2, 0.0], dt),
        jnp.asarray(_to_bl_up(k_up, obs), dt),
        jnp.asarray(_to_bl_up(f, obs), dt), jnp.zeros((), dt))

    # GR machinery: static observer must recover chi0 exactly
    chi_static, c_static = observer_evpa(
        kap1, kap2, q0, jnp.asarray(p_cov, dt), jnp.asarray(up, dt),
        jnp.asarray(right, dt), params, omega_obs=jnp.zeros((), dt))
    np.testing.assert_allclose(float(chi_static), chi0, atol=1e-10)
    np.testing.assert_allclose(float(c_static), 1.0, atol=1e-10)

    # GR machinery: moving observer
    chi_gr, c_gr = observer_evpa(
        kap1, kap2, q0, jnp.asarray(p_cov, dt), jnp.asarray(up, dt),
        jnp.asarray(right, dt), params, omega_obs=jnp.asarray(omega, dt))

    # SR oracle: boost everything, measure in the aberrated screen
    lam = _minkowski_boost(beta_vec)
    kb = lam @ k_up
    fb = lam @ f
    upb = lam @ np.r_[0.0, up]
    rib = lam @ np.r_[0.0, right]
    nh = kb[1:] / np.linalg.norm(kb[1:])
    E1 = upb[1:] - (upb[1:] @ nh) * nh
    E1 /= np.linalg.norm(E1)
    E2 = rib[1:] - (rib[1:] @ nh) * nh - (rib[1:] @ E1) * E1
    E2 /= np.linalg.norm(E2)
    chi_sr = np.mod(np.arctan2(fb[1:] @ E2, fb[1:] @ E1), np.pi)

    np.testing.assert_allclose(float(chi_gr), chi_sr, atol=1e-10)
    np.testing.assert_allclose(float(c_gr), 1.0, atol=1e-10)
    # the aberration rotation is real: beta = 0.3 moves the angle
    assert abs(float(chi_gr) - chi0) > 0.05


def _to_bl_up(w_up, obs):
    """Contravariant Cartesian -> spherical (BL at M=a=0) at the
    equatorial point obs = (x, 0, 0): dr = dx, dtheta = -dz/r,
    dphi = dy/r."""
    r = np.linalg.norm(obs)
    return np.array([w_up[0], w_up[1], -w_up[3] / r, w_up[2] / r])


def test_render_disk_polarized_moving_camera(tmp_path):
    """End-to-end: --disk-bfield + --camera-omega compose.  The moving-
    camera EVPA map is finite with a healthy screen solve, DIFFERS from
    the static map (aberration), and the full CLI writes the polarization
    artifacts."""
    from grtrace import IntegratorConfig, PatchConfig, SceneConfig
    from grtrace.engine.disk import DiskConfig, render_disk

    scene = SceneConfig(size=20, metric="kerr", spin=0.9, n_samples=0,
                        integrator=IntegratorConfig(steps=1500, delta=0.1,
                                                    omega=1.0,
                                                    backend="xla",
                                                    dtype="float64"),
                        patch=PatchConfig())
    moving = render_disk(scene, DiskConfig(r_out=10.0, bfield="vertical",
                                           camera_omega="keplerian"),
                         bg_array=None)
    static = render_disk(scene, DiskConfig(r_out=10.0, bfield="vertical"),
                         bg_array=None)
    dm = np.asarray(moving.device("status")) == 3
    ds = np.asarray(static.device("status")) == 3
    assert dm.sum() > 10
    evpa_m = np.asarray(moving.device("evpa"))
    chk_m = np.asarray(moving.device("pol_check"))
    assert np.isfinite(evpa_m[dm]).all()
    # the screen-solve residual is the lerped-crossing diagnostic; at the
    # coarse test delta=0.1 the aberrated bundle hits at a few-percent
    # level (the exact-limit EVPA itself is pinned to 1e-10 by
    # test_observer_evpa_flat_limit_matches_sr_boost)
    np.testing.assert_allclose(chk_m[dm], 1.0, atol=0.08)
    both = dm & ds
    evpa_s = np.asarray(static.device("evpa"))
    # wrapped mod-pi difference; aberration must move the pattern
    d = np.abs(evpa_m[both] - evpa_s[both])
    d = np.minimum(d, np.pi - d)
    assert d.max() > 0.01

    # CLI: the flags compose and the artifacts land
    from grtrace.cli.main import main
    out = str(tmp_path / "polmov")
    main(["--size", "20", "--metric", "kerr", "--spin", "0.9", "--disk",
          "--disk-bfield", "vertical", "--camera-omega", "keplerian",
          "--steps", "1500", "--delta", "0.1", "--out-dir", out,
          "--no-plots", "--no-flat", "--n-samples", "0"])
    import os
    assert os.path.exists(os.path.join(out, "polarization_map.csv"))
