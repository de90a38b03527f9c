"""Kerr-Schild Cartesian chart (physics.spacetime.kerr_schild_g_inv).

Cross-chart physics: the same spacetime rendered through two independent
coordinate systems (Boyer-Lindquist spherical vs Kerr-Schild Cartesian)
must produce consistent invariants — the strongest self-check in the
framework, in the spirit of the reference's CPU-vs-GPU oracle comparisons
(SURVEY.md section 4).
"""
import jax.numpy as jnp
import numpy as np

from grtrace.engine.render import render
from grtrace.io.scene import IntegratorConfig, PatchConfig, SceneConfig
from grtrace.physics import spacetime


def _scene(metric, spin, size=24, fov=25.0):
    return SceneConfig(
        size=size, fov_deg=fov, observer_distance=30.0, boundary_radius=31.0,
        metric=metric, spin=spin,
        integrator=IntegratorConfig(steps=24000, delta=0.02, omega=1.0,
                                    backend="xla", dtype="float64"),
        patch=PatchConfig(), n_samples=0)


def test_ks_radius_identities():
    # on-axis: r == |z|; equatorial plane at rho > a: r^2 == rho^2 - a^2
    a = 0.8
    assert np.isclose(float(spacetime.ks_radius(0.0, 0.0, 5.0, a)), 5.0)
    r = float(spacetime.ks_radius(3.0, 4.0, 0.0, a))
    assert np.isclose(r * r, 25.0 - a * a)
    # a = 0: plain euclidean radius
    assert np.isclose(float(spacetime.ks_radius(1.0, 2.0, 2.0, 0.0)), 3.0)


def test_ks_metric_is_kerr():
    """Scalar invariants agree across charts: the contraction
    g^{ab} p_a p_b of the SAME physical covector must match when the
    covector is transformed between BL and KS charts... verified here in
    the clean a=0 limit where the spatial charts coincide: KS(t,x,y,z)
    vs Schwarzschild(t,r,th,ph) Hamiltonians agree for matching vectors."""
    q_cart = jnp.array([0.0, 3.0, 4.0, 12.0], jnp.float64)   # r = 13
    p_cart = jnp.array([0.5, 0.1, -0.2, 0.3], jnp.float64)
    params = jnp.array([1.0, 0.0], jnp.float64)
    h_ks = spacetime.hamiltonian(q_cart, p_cart, params,
                                 spacetime.kerr_schild_g_inv)
    # transform covector to spherical at (r, th, ph)
    x, y, z = 3.0, 4.0, 12.0
    r = 13.0
    rho = np.hypot(x, y)
    th = np.arccos(z / r)
    ph = np.arctan2(y, x)
    # d(r,th,ph)/d(x,y,z) jacobian transpose contraction: p_sph_i = p_cart_j dx^j/dq^i
    dxdr = np.array([x / r, y / r, z / r])
    dxdth = np.array([x * z / rho, y * z / rho, -rho])
    dxdph = np.array([-y, x, 0.0])
    p3 = np.asarray(p_cart)[1:]
    p_sph = jnp.array([float(p_cart[0]), p3 @ dxdr, p3 @ dxdth, p3 @ dxdph],
                      jnp.float64)
    # ingoing-KS time is sheared: t_ks = t_s + r_* - r, d(t_ks)/dr =
    # (2M/r)/f, so the covector picks up p_r_s = p_r_ks + p_t (2M/r)/f
    f = 1.0 - 2.0 / r
    p_sph = p_sph.at[1].add(float(p_cart[0]) * (2.0 / r) / f)
    q_sph = jnp.array([0.0, r, th, ph], jnp.float64)
    h_s = spacetime.hamiltonian(q_sph, p_sph, jnp.array([1.0]),
                                spacetime.schwarzschild_g_inv)
    np.testing.assert_allclose(float(h_ks), float(h_s), rtol=1e-12)


def test_ks_render_shadow_matches_bl():
    """Shadow size must agree across charts at a = 0 within an edge pixel
    ring (the two engines differ only in near-critical edge handling)."""
    res_ks = render(_scene("KerrSchild", 0.0))
    res_bl = render(_scene("kerr-bl", 0.0))
    cap_ks = np.asarray(res_ks.cls) == 0
    cap_bl = np.asarray(res_bl.cls) == 0
    assert res_ks.counts["numerical_error"] == 0
    # interior agreement: erode BL by one pixel ring and require subset
    inner = cap_bl.copy()
    inner[1:] &= cap_bl[:-1]; inner[:-1] &= cap_bl[1:]
    inner[:, 1:] &= cap_bl[:, :-1]; inner[:, :-1] &= cap_bl[:, 1:]
    assert (cap_ks | ~inner).all()          # BL-interior subset of KS
    # and totals within ~20% (edge ring of a ~12px-radius disc)
    assert abs(res_ks.counts["captured"] - res_bl.counts["captured"]) \
        <= 0.2 * res_bl.counts["captured"]


def test_ks_asymmetry_matches_bl_direction():
    """Frame-dragging displacement direction must agree across charts."""
    def shift(res, size):
        cap = np.asarray(res.cls) == 0
        cols = np.where(cap[size // 2])[0]
        return cols.mean() - (size - 1) / 2

    size = 32
    s_ks = shift(render(_scene("KerrSchild", 0.9, size=size)), size)
    s_bl = shift(render(_scene("kerr-bl", 0.9, size=size)), size)
    assert s_ks * s_bl > 0          # same side
    assert abs(s_ks) > 0.3          # and actually displaced


def test_ks_extreme_spin():
    """a = 0.999 renders cleanly (the BL engine cannot get close to this
    without tiny steps — Delta at its 1.1 r_+ shell is ~0.002)."""
    res = render(_scene("KerrSchild", 0.999, size=24))
    c = res.counts
    assert c["captured"] > 0
    assert c["numerical_error"] <= 0.05 * (24 * 24)
    assert c["captured"] + c["escaped"] + c["numerical_error"] \
        + c["in_domain"] == 24 * 24


def test_cli_metric_mapping():
    from grtrace.cli.args import parse_args, scene_from_args
    sc = scene_from_args(parse_args(["--metric", "kerr", "--spin", "0.7"]))
    assert sc.metric == "KerrSchild"
    sc = scene_from_args(parse_args(["--metric", "kerr-bl", "--spin", "0.7"]))
    assert sc.metric == "kerr-bl"
