"""Native C++ CSV serializer vs the pandas reference writer."""
import numpy as np
import pandas as pd
import pytest

from grtrace import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_photon_csv_matches_pandas(lib, tmp_path):
    from grtrace.engine.classify import COLLISION_NAMES
    n_side = 37
    n = n_side * n_side
    rng = np.random.default_rng(1)
    final_r = rng.normal(30, 5, n)
    final_th = rng.uniform(0, np.pi, n)
    final_ph = rng.uniform(-np.pi, np.pi, n)
    cls = rng.integers(0, 5, n).astype(np.int32)
    heading = rng.normal(size=(n, 3))
    p0 = rng.normal(size=(n, 4))
    alpha0 = rng.uniform(0, 1, n)

    path = tmp_path / "native.csv"
    assert native.write_photon_csv(str(path), n_side, n_side, final_r,
                                   final_th, final_ph, cls, heading, p0,
                                   alpha0)
    a = pd.read_csv(path, float_precision="round_trip")
    assert a.columns.tolist() == [
        "i", "j", "final_r", "final_th", "final_ph", "collision", "h_r",
        "h_theta", "h_phi", "p0_t", "p0_r", "p0_th", "p0_ph", "alpha0"]
    assert len(a) == n
    # row-major i/j enumeration
    np.testing.assert_array_equal(a["i"], np.repeat(np.arange(n_side),
                                                    n_side))
    np.testing.assert_array_equal(a["j"], np.tile(np.arange(n_side), n_side))
    # %.17g always round-trips: with a correctly-rounded reader the values
    # must come back bit-exact
    np.testing.assert_array_equal(a["final_r"], final_r)
    np.testing.assert_array_equal(a["p0_ph"], p0[:, 3])
    np.testing.assert_array_equal(a["alpha0"], alpha0)
    assert a["collision"].tolist() == [COLLISION_NAMES[c] for c in cls]


def test_sampled_csv_matches_pandas(lib, tmp_path):
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(3, 50, 3))
    heading = rng.normal(size=(3, 3))
    path = tmp_path / "sampled.csv"
    assert native.write_sampled_csv(str(path), xyz, heading)
    a = pd.read_csv(path, float_precision="round_trip")
    assert a.columns.tolist() == ["ray_id", "point_idx", "x", "y", "z", "r",
                                  "h_r", "h_theta", "h_phi"]
    assert len(a) == 150
    np.testing.assert_array_equal(a["x"], xyz[:, :, 0].reshape(-1))
    np.testing.assert_allclose(
        a["r"], np.linalg.norm(xyz, axis=-1).reshape(-1), rtol=1e-14)
    np.testing.assert_array_equal(a["h_r"], np.repeat(heading[:, 0], 50))


def test_invalid_class_rejected(lib, tmp_path):
    n = 4
    bad_cls = np.array([0, 1, 7, 2], dtype=np.int32)  # 7 out of range
    z = np.zeros(n)
    ok = native.write_photon_csv(str(tmp_path / "x.csv"), 2, 2, z, z, z,
                                 bad_cls, np.zeros((n, 3)), np.zeros((n, 4)),
                                 z)
    assert not ok or open(tmp_path / "x.csv").read().count("\n") <= 3


def test_fallback_when_lib_missing(monkeypatch, tmp_path):
    """save_photon_data must fall back to pandas when the native lib is
    unavailable."""
    import grtrace.io.artifacts as artifacts
    from grtrace import IntegratorConfig, SceneConfig, render
    monkeypatch.setattr(native, "load", lambda: None)
    scene = SceneConfig(size=6, background=None,
                        integrator=IntegratorConfig(steps=200, delta=0.1,
                                                    dtype="float64"),
                        n_samples=0)
    res = render(scene, bg_array=None)
    path = tmp_path / "p.csv"
    artifacts.save_photon_data(res, path)
    df = pd.read_csv(path)
    assert len(df) == 36
