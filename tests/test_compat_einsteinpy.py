"""EinsteinPy-compat Nulllike vs golden trajectories.

Two layers of ground truth:
  1. tests/golden/null_geodesic_r10_a60_b60.csv — float64 oracle output,
     committed fixture (parameters chosen to match the reference's own
     EinsteinPy golden run).
  2. The reference's committed EinsteinPy output itself
     (/root/reference/tests/einsteinpy-geodesic-test/trajectory.csv) when
     the reference checkout is present — the strongest possible
     cross-implementation check (real einsteinpy vs grtrace engine).
"""
import os

import numpy as np
import pandas as pd
import pytest

from grtrace.compat import Nulllike

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "null_geodesic_r10_a60_b60.csv")
REFERENCE_CSV = "/root/reference/tests/einsteinpy-geodesic-test/trajectory.csv"


def _golden_ics():
    position = [10.0, np.pi / 2, 0.0]
    momentum = [1.0, np.pi / 2 - np.deg2rad(60), np.pi - np.deg2rad(60)]
    return position, momentum


def test_nulllike_matches_golden_fixture():
    position, momentum = _golden_ics()
    geod = Nulllike(metric="Schwarzschild", metric_params=(0.0,),
                    position=position, momentum=momentum,
                    steps=2000, delta=0.05, omega=0.01,
                    return_cartesian=True, suppress_warnings=True)
    idx, data = geod.trajectory
    assert data.shape == (2000, 8)
    gold = pd.read_csv(GOLDEN).values
    np.testing.assert_allclose(data, gold, rtol=1e-10, atol=1e-10)


@pytest.mark.skipif(not os.path.exists(REFERENCE_CSV),
                    reason="reference checkout not present")
def test_nulllike_matches_real_einsteinpy_output():
    """grtrace vs actual einsteinpy: the committed reference trajectory.csv
    was produced by einsteinpy.geodesic.Nulllike itself."""
    position, momentum = _golden_ics()
    gold = pd.read_csv(REFERENCE_CSV).values
    # the reference's own run goes numerically unstable after ~2000 steps
    # (r blows up to ~-5e6 by the end; the script comments say as much) —
    # compare the stable region
    steps = 2000
    geod = Nulllike(position=position, momentum=momentum, steps=steps,
                    delta=0.05, omega=0.01, return_cartesian=True)
    _, data = geod.trajectory
    np.testing.assert_allclose(data, gold[:steps], rtol=1e-9, atol=1e-9)


def test_nulllike_momentum_closure():
    """p_t uses the past-directed root (EinsteinPy `_P()` convention)."""
    position, momentum = _golden_ics()
    geod = Nulllike(position=position, momentum=momentum, steps=1)
    assert geod.momentum[0] < 0
    # null condition in the pipeline convention
    r, th = position[0], position[1]
    f = 1 - 2 / r
    p = geod.momentum
    null = (-1 / f) * p[0] ** 2 + f * p[1] ** 2 + p[2] ** 2 / r ** 2 \
        + p[3] ** 2 / (r ** 2 * np.sin(th) ** 2)
    assert abs(null) < 1e-12


def test_nulllike_spherical_output():
    position, momentum = _golden_ics()
    geod = Nulllike(position=position, momentum=momentum, steps=10,
                    delta=0.05, omega=0.01, return_cartesian=False)
    _, data = geod.trajectory
    # column 1 is r, starts near 10 and grows (outgoing ray)
    assert 10.0 < data[0, 1] < 10.1
    assert data[-1, 1] > data[0, 1]


def test_nulllike_rejects_unsupported():
    # Kerr and KerrNewman are supported (tests/test_spacetime_kerr.py,
    # tests/test_kerr_newman.py); anything else stays out
    with pytest.raises(NotImplementedError):
        Nulllike(metric="FRW")
    with pytest.raises(ValueError):
        Nulllike(metric="Schwarzschild", metric_params=(0.5,))
    with pytest.raises(NotImplementedError):
        Nulllike(time_like=True)
