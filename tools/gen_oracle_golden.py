"""Generate the float64-oracle golden for the HEADLINE workload.

The headline bench (bench.py) renders 400x400 at 200k steps / delta 0.01 in
float32 on the Pallas fast path.  The north-star accuracy target
(BASELINE.md) is "escape directions within 1e-5 of the CPU reference" — this
script pins exactly that scene: it samples probe pixels from the real
400x400 camera grid, integrates each with the independent float64 NumPy
oracle (grtrace.oracle.cpu_integrator), and stores the expected escape
angles in tests/golden/oracle_escape_headline.npz.  Both the test suite
(tests/test_f32_accuracy.py) and bench.py compare the production float32
path against this file.

Probe selection: stratified over the camera angle alpha across the full
escaping range, EXCLUDING rays whose oracle trajectory dips below
r = 3.5 (rs = 2, photon sphere at r = 3): inside that band the photon-sphere
Lyapunov exponent amplifies rounding chaotically, so no two finite-precision
implementations agree there and the 1e-5 target is only meaningful outside
it (same exclusion as tests/test_integrator.py:30-34).

Run from the repo root (forces CPU + float64 itself):
    python tools/gen_oracle_golden.py
Deterministic: pure float64 NumPy, fixed probe grid.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# --- headline scene constants (bench.py:29-36) ---
SIZE = 400
STEPS = 200_000
DELTA = 0.01
OMEGA = 1.0
MASS = 1.0
RS = 2.0 * MASS
RMAX = 31.0
OBS_X = 30.0
FOV = np.radians(80.0)
MIN_R_SAFE = 3.5          # chaotic-band exclusion (photon sphere at 3.0)
N_PROBE = 192             # probe pixels before filtering


def oracle_integrate_minr(q0, p0, steps, delta, rs, r_max, omega):
    """oracle.integrate + the trajectory's minimum radius (for the
    chaotic-band filter) without storing the trajectory."""
    from grtrace.oracle.cpu_integrator import fantasy_step
    q1 = np.array(q0, np.float64)
    p1 = np.array(p0, np.float64)
    q2, p2 = q1.copy(), p1.copy()
    taken = 0
    min_r = q1[1]
    for _ in range(steps):
        if q1[1] <= 1.1 * rs or q1[1] >= r_max:
            break
        q1, p1, q2, p2 = fantasy_step(q1, p1, q2, p2, delta, rs, omega)
        min_r = min(min_r, q1[1])
        taken += 1
    return q1, taken, min_r


def main():
    from grtrace.physics.camera import camera_rays

    q0, p0, alpha0, heading, beta = camera_rays(
        np.array([OBS_X, 0.0, 0.0]), FOV, SIZE, SIZE,
        mass_bh=MASS, dtype=np.float64)
    q0 = np.asarray(q0).reshape(-1, 4)
    p0 = np.asarray(p0).reshape(-1, 4)
    alpha0 = np.asarray(alpha0).reshape(-1)
    beta = np.asarray(beta).reshape(-1)

    # Stratify probe pixels over alpha0 — sort all pixels by alpha and take
    # evenly spaced ranks, so the probes span center-to-corner viewing angles.
    order = np.argsort(alpha0)
    ranks = np.linspace(0, SIZE * SIZE - 1, N_PROBE).astype(np.int64)
    probe_idx = order[ranks]

    kept = {k: [] for k in ("flat_idx", "final_q", "n_steps", "min_r")}
    n_captured = n_chaotic = 0
    for k, fi in enumerate(probe_idx):
        fq, taken, min_r = oracle_integrate_minr(
            q0[fi], p0[fi], STEPS, DELTA, RS, RMAX, OMEGA)
        if fq[1] < RMAX:          # captured / still in domain: not an
            n_captured += 1       # escape-direction probe
            continue
        if min_r < MIN_R_SAFE:    # chaotic near-critical band
            n_chaotic += 1
            continue
        kept["flat_idx"].append(fi)
        kept["final_q"].append(fq)
        kept["n_steps"].append(taken)
        kept["min_r"].append(min_r)
        if (k + 1) % 32 == 0:
            print(f"  {k + 1}/{N_PROBE} probes "
                  f"(kept {len(kept['flat_idx'])})", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden",
        "oracle_escape_headline.npz")
    np.savez(
        out,
        flat_idx=np.asarray(kept["flat_idx"], np.int64),
        final_q=np.asarray(kept["final_q"], np.float64),
        n_steps=np.asarray(kept["n_steps"], np.int64),
        min_r=np.asarray(kept["min_r"], np.float64),
        size=SIZE, steps=STEPS, delta=DELTA, omega=OMEGA, mass=MASS,
        rmax=RMAX, obs_x=OBS_X, fov=FOV, min_r_safe=MIN_R_SAFE)
    print(f"kept {len(kept['flat_idx'])} escaping probes "
          f"({n_captured} captured, {n_chaotic} chaotic excluded) -> {out}")


if __name__ == "__main__":
    main()
