"""Adaptive shadow-edge antialiasing (engine/aa.py).

The adaptive pass must reproduce EXACT uniform supersampling at the
pixels it refines: an s x s stratified sub-ray of pixel (i, j) at size N
sits at the same image-plane position as pixel (s*i + si, s*j + sj) of
the s*N-size render, so a full 2x render box-averaged is the ground
truth — computed here with the same pipeline, no tolerance needed.
"""
import jax.numpy as jnp
import numpy as np

from grtrace.engine.render_generic import render_generic
from grtrace.io.scene import IntegratorConfig, PatchConfig, SceneConfig


def _scene(size, steps=1200, delta=0.06):
    return SceneConfig(size=size, metric="kerr", spin=0.8, n_samples=0,
                       integrator=IntegratorConfig(steps=steps, delta=delta,
                                                   backend="xla",
                                                   dtype="float64"),
                       patch=PatchConfig())


def test_refine_edges_matches_uniform_supersampling():
    size, s = 20, 2
    rng = np.random.default_rng(3)
    bg = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)

    base = render_generic(_scene(size), metric="KerrSchild", bg_array=bg,
                          dtype=jnp.float64)
    aa = render_generic(_scene(size), metric="KerrSchild", bg_array=bg,
                        dtype=jnp.float64, aa_samples=s)
    hi = render_generic(_scene(size * s), metric="KerrSchild", bg_array=bg,
                        dtype=jnp.float64)

    mask = np.asarray(aa.device("aa_mask"))
    assert mask.sum() > 10                      # the shadow edge was found

    # ground truth: box-average of the s x s block, same rounding as aa.py
    blocks = np.asarray(hi.image, np.float32).reshape(size, s, size, s, 3)
    expect = np.clip(blocks.mean(axis=(1, 3)) + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(aa.image)[mask], expect[mask])

    # untouched pixels keep the base color; class map keeps center sample
    np.testing.assert_array_equal(np.asarray(aa.image)[~mask],
                                  np.asarray(base.image)[~mask])
    np.testing.assert_array_equal(aa.cls, base.cls)
    assert aa.counts == base.counts


def test_edge_scores_shape_and_meaning():
    from grtrace.engine.aa import edge_scores
    cls = jnp.asarray(np.array([[0, 0, 1],
                                [0, 0, 1],
                                [2, 2, 1]]))
    s = np.asarray(edge_scores(cls))
    assert s.shape == (3, 3)
    assert s[0, 0] == 0                  # interior of a uniform region? no:
    # (0,0): right 0, down 0 -> 0 differing among replicated neighbors
    assert s[0, 2] == 1                  # left neighbor differs
    assert s[1, 1] == 2                  # right + down differ
    assert s[2, 2] == 1                  # left differs


def test_refine_edges_small_budget_smoke():
    """A second, budget-starved config: the pass still runs, refines the
    edge, and leaves the class map alone.  (The Pallas-kernel AA variant
    is exercised on the real chip by bench/CLI runs — refine_edges_generic
    dispatches to integrate_batch_pallas_ks exactly like the base
    renderer.)"""
    size = 16
    rng = np.random.default_rng(5)
    bg = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    sc = _scene(size, steps=600)
    base = render_generic(sc, metric="KerrSchild", bg_array=bg,
                          dtype=jnp.float64)
    aa = render_generic(sc, metric="KerrSchild", bg_array=bg,
                        dtype=jnp.float64, aa_samples=2)
    mask = np.asarray(aa.device("aa_mask"))
    assert mask.sum() > 0
    np.testing.assert_array_equal(aa.cls, base.cls)


def test_refine_edges_schwarzschild_matches_uniform_supersampling():
    """The fast-path AA twin: same folded camera, same dispatch, same
    analytic-shortcut classification — ground truth is the 2x fast-path
    render box-averaged, equality exact."""
    from grtrace.engine.render import render
    size, s = 20, 2
    rng = np.random.default_rng(4)
    bg = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)

    def sch(n):
        return SceneConfig(size=n, n_samples=0,
                           integrator=IntegratorConfig(steps=1200,
                                                       delta=0.06,
                                                       backend="xla",
                                                       dtype="float64"),
                           patch=PatchConfig())

    base = render(sch(size), bg_array=bg, dtype=jnp.float64)
    aa = render(sch(size), bg_array=bg, dtype=jnp.float64, aa_samples=s)
    hi = render(sch(size * s), bg_array=bg, dtype=jnp.float64)

    mask = np.asarray(aa.device("aa_mask"))
    assert mask.sum() > 8
    blocks = np.asarray(hi.image, np.float32).reshape(size, s, size, s, 3)
    expect = np.clip(blocks.mean(axis=(1, 3)) + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(aa.image)[mask], expect[mask])
    np.testing.assert_array_equal(np.asarray(aa.image)[~mask],
                                  np.asarray(base.image)[~mask])
    np.testing.assert_array_equal(aa.cls, base.cls)
    assert aa.counts == base.counts


def test_refine_edges_disk_matches_uniform_supersampling():
    """The disk twin: sub-rays ride the inclined look-at camera and the
    full crossing-capture + shading chain; ground truth is the 2x disk
    render box-averaged."""
    from grtrace.engine.disk import DiskConfig, render_disk
    size, s = 20, 2
    rng = np.random.default_rng(6)
    bg = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)

    def dsc(n):
        return SceneConfig(size=n, metric="kerr", spin=0.9, n_samples=0,
                           integrator=IntegratorConfig(steps=1500,
                                                       delta=0.06,
                                                       backend="xla",
                                                       dtype="float64"),
                           patch=PatchConfig())

    cfg = DiskConfig()
    base = render_disk(dsc(size), cfg, bg_array=bg)
    aa = render_disk(dsc(size), cfg, bg_array=bg, aa_samples=s)
    hi = render_disk(dsc(size * s), cfg, bg_array=bg)

    mask = np.asarray(aa.device("aa_mask"))
    assert mask.sum() > 8           # disk silhouette + shadow edges found
    # the disk boundary must be among the refined pixels
    assert (np.asarray(base.cls)[mask] == 5).any()
    blocks = np.asarray(hi.image, np.float32).reshape(size, s, size, s, 3)
    expect = np.clip(blocks.mean(axis=(1, 3)) + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(aa.image)[mask], expect[mask])
    np.testing.assert_array_equal(np.asarray(aa.image)[~mask],
                                  np.asarray(base.image)[~mask])
    np.testing.assert_array_equal(aa.cls, base.cls)
    assert aa.counts == base.counts


def test_refine_subrings_matches_uniform_supersampling():
    """The transparent-disk (subring) twin: refined pixels must equal the
    s-x-resolution render box-averaged EXACTLY — the stratified sub-ray
    centers coincide with the fine grid's pixel centers — for both the
    displayed image and the per-order intensity maps; unrefined pixels
    keep the base render's center-sample values bit-for-bit.  The flux
    payoff follows: refined order-1 flux lands at least as close to the
    supersampled truth as the base render's."""
    from grtrace.engine.disk import DiskConfig
    from grtrace.engine.subring import render_subrings

    size, s, n_orders = 20, 2, 2

    def ssc(n):
        return SceneConfig(size=n, metric="kerr", spin=0.9, n_samples=0,
                           integrator=IntegratorConfig(steps=6000,
                                                       delta=0.2,
                                                       backend="xla",
                                                       dtype="float64"),
                           patch=PatchConfig())

    cfg = DiskConfig(elevation_deg=75.0, show_background=False)
    base = render_subrings(ssc(size), cfg, n_orders=n_orders)
    aa = render_subrings(ssc(size), cfg, n_orders=n_orders, aa_samples=s)
    hi = render_subrings(ssc(size * s), cfg, n_orders=n_orders)

    mask = aa["aa_mask"]
    assert mask.sum() > 8          # ring boundaries + silhouette found
    assert base["intensity"][1].sum() > 0.0   # order 1 resolves

    blocks = hi["image"].astype(np.float32).reshape(size, s, size, s, 3)
    expect = np.clip(blocks.mean(axis=(1, 3)) + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(aa["image"][mask], expect[mask])
    np.testing.assert_array_equal(aa["image"][~mask], base["image"][~mask])

    bi = hi["intensity"].reshape(n_orders, size, s, size, s).mean(axis=(2, 4))
    np.testing.assert_allclose(aa["intensity"][:, mask], bi[:, mask],
                               rtol=1e-12)
    np.testing.assert_array_equal(aa["intensity"][:, ~mask],
                                  base["intensity"][:, ~mask])
    np.testing.assert_allclose(aa["total_intensity"],
                               aa["intensity"].sum(axis=0), rtol=1e-12)
    # center-sample semantics preserved everywhere else
    np.testing.assert_array_equal(aa["count"], base["count"])
    np.testing.assert_array_equal(aa["valid"], base["valid"])

    truth = hi["intensity"][1].sum() / s ** 2
    assert (abs(aa["intensity"][1].sum() - truth)
            <= abs(base["intensity"][1].sum() - truth) + 1e-12)
