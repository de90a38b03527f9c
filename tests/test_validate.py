"""engine.validate — the on-chip validation harness, exercised on CPU.

The module's real job is running inside bench.py on the TPU (its results
land in every round's BENCH_r*.json stderr block); these tests pin its
logic on CPU so a harness bug can't silently produce green-looking
validation numbers: the Schwarzschild boundary check must reproduce the
arcsin formula through the XLA backend, the Bardeen predicate must flip
exactly once across the shadow edge, and the KS parity check must report
zero mismatches for the bit-exact kernel/twin pair.
"""
import jax.numpy as jnp
import numpy as np

from grtrace.engine import validate as val


def test_schwarzschild_shadow_error_cpu():
    out = val.schwarzschild_shadow_error(steps=8000, delta=0.03,
                                         backend="xla")
    # delta=0.03 truncation + f32 rounding stays well inside a pixel
    assert out["px_err"] < 1.0, out
    assert out["bracket_px"] < 0.3
    # rho_analytic is rounded to 3 decimals for the JSON artifact
    assert abs(out["rho_analytic"] - val.schwarzschild_analytic_rho()) < 1e-3


def test_bardeen_predicate_monotone_across_edge():
    """Deep inside the shadow: captured; far outside: escapes — at every
    azimuth, including the prograde extremity."""
    rhos = np.stack([np.full(val.N_PSI, 10.0),
                     np.full(val.N_PSI, 34.0)], axis=-1)
    esc = val.bardeen_escapes(rhos, spin=0.9)
    assert not esc[:, 0].any()
    assert esc[:, 1].all()


def test_ks_parity_zero_mismatch_interpret():
    out = val.ks_kernel_parity(size=8, steps=250, interpret=True)
    assert out["status_mismatch"] == 0
    assert out["exit_step_mismatch"] == 0
    assert out["max_escape_pos_delta"] == 0.0


def test_subring_parity_interpret():
    """The subring twin agrees with the XLA subring engine: identical
    statuses / crossing counts, events to the fusion-rounding +
    f32-Kahan scale (both sides record the p2 copy)."""
    out = val.subring_kernel_parity(size=10, steps=900, interpret=True,
                                    n_orders=2)
    assert out["status_mismatch"] == 0
    assert out["count_mismatch"] == 0
    assert out["max_crossings"] >= 1   # the scene actually crosses
    # f32 harness config: the kernel side is Kahan-compensated, the XLA
    # engine plain f32, so the event deltas carry the plain path's
    # accumulated f32 rounding (~2e-4 over 900 steps), not just fusion
    # rounding — the f64/plain-vs-plain 1e-9 contract is pinned in
    # tests/test_subring.py
    assert out["max_event_q_delta"] < 1e-3
    assert out["max_event_p_delta"] < 1e-3
