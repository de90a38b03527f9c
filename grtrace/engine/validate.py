"""On-chip float32 validation against closed-form GR.

The CPU test suite pins the physics in float64 (tests/test_shadow_analytic)
and pins the Mosaic kernels to their XLA twins in interpret mode — but
neither sees what the MOSAIC-COMPILED float32 production path computes on
real hardware.  This module closes that gap with checks cheap enough to run
inside every benchmark invocation (bench.py embeds the results in its
stderr JSON, so every round's driver artifact carries them):

  * `schwarzschild_shadow_error` — the f32 production kernel's shadow
    boundary vs the exact arcsin formula (sin(alpha) = b_crit sqrt(f)/r0,
    b_crit = 3 sqrt(3) M), sub-pixel bisection along image azimuths.
  * `kerr_shadow_errors` — the compensated f32 Kerr-Schild kernel's
    shadow boundary vs the Bardeen (1973) radial-potential construction,
    per azimuth; the prograde extremity is the hardest accuracy regime in
    the framework (plain f32 drifts ~3 px there).
  * `ks_kernel_parity` — the compensated KS kernel vs its XLA twin
    (engine.integrate_ks.integrate_batch_ksc) on the same device: both
    compile the same step functions, so any disagreement is a
    Mosaic-vs-XLA compilation difference, the exact blind spot of
    interpret-mode CPU tests.

Everything here also runs on CPU (backend='xla' / interpret=True), so the
module itself is covered by the ordinary test suite.

The validation tail is COMPILE-bound, not run-bound (measured on chip:
each check is 40-70 s of which all but ~2-5 s is Mosaic/XLA compilation
of its probe programs — round-3 verdict item 7).  Three measures keep it
under a minute per bench invocation without dropping any check:

  * probe kernels compile with a small explicit `unroll` (PROBE_UNROLL):
    results are unroll-INVARIANT (identical masked-step sequence per ray —
    pinned by the test_unroll_invariance tests in tests/test_pallas_kernel.py
    and tests/test_pallas_ks.py),
    but the Mosaic body is severalfold smaller, which is most of each
    probe's compile time;
  * step budgets are exact multiples of the probe unroll, so no
    `steps % unroll` step-function copies are statically inlined as an
    exact-budget remainder;
  * `run_all` compiles/runs the four checks on worker threads — the axon
    service compiles concurrently (measured ~2.8x for 4 programs), so the
    tail is max-of-compiles, not sum.

Boundary positions are quoted in 256x256-image pixels regardless of probe
resolution (matching tests/test_shadow_analytic and the README numbers).
Scene: observer at r0 = 30 M on +x, fov 80 deg, boundary sphere 31 M —
the headline configuration.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

R0 = 30.0
FOV = np.radians(80.0)
SIZE = 256                      # pixel scale the errors are quoted at
BOUNDARY = 31.0
PLANE_D = 0.2 * R0              # image plane distance (raytracing.py:60-88)
PLANE_W = 2.0 * PLANE_D * np.tan(FOV / 2.0)
N_PSI = 8
PSIS = np.linspace(0.0, 2 * np.pi, N_PSI, endpoint=False)
# Probe-kernel unroll: base masked steps between early-exit checks (the
# KS-family probes divide by their substep count, mirroring the production
# default UNROLL // n_sub).  4 keeps the Mosaic body ~16x smaller than the
# production 64 at <1 s of extra masked-step runtime on these tiny batches;
# measured on chip (warm service): all four checks 14-45 s wall vs 87 s at
# unroll 8, with bit-identical px errors and parity deltas (results are
# unroll-invariant — see the module docstring).
PROBE_UNROLL = 4


def _pixel_positions(rho_px, psi):
    """Continuous pixel radius (256-image units) + azimuth -> image-plane
    points (same plane geometry as physics.camera.pixel_grid)."""
    off = np.asarray(rho_px) / SIZE * PLANE_W
    y = off * np.cos(psi)
    z = off * np.sin(psi)
    x = np.full_like(y, R0 - PLANE_D)
    return np.stack([x, y, z], axis=-1)


def bisect_boundary(escape_fn, lo, hi, rounds=3, k=17, n_psi=N_PSI):
    """Per-azimuth radial bisection of the capture->escape transition.

    escape_fn((P, K) pixel radii) -> (P, K) bool.  Returns (midpoints (P,),
    max bracket width) — sub-pixel boundary positions, far sharper than
    counting mask pixels.
    """
    lo = np.full(n_psi, float(lo))
    hi = np.full(n_psi, float(hi))
    for _ in range(rounds):
        rhos = np.linspace(lo, hi, k, axis=-1)           # (P, K)
        esc = np.asarray(escape_fn(rhos))
        if esc[:, 0].any() or not esc[:, -1].all():
            raise ValueError("bisection bracket does not straddle the "
                             "shadow boundary")
        first = esc.argmax(axis=1)                       # first escaped idx
        idx = np.arange(n_psi)
        lo = rhos[idx, first - 1]
        hi = rhos[idx, first]
    return 0.5 * (lo + hi), float((hi - lo).max())


def schwarzschild_analytic_rho(mass=1.0):
    """Closed-form shadow pixel radius: sin(alpha_phys) = b_crit sqrt(f)/r0
    (exact for a static observer at finite r0), tan(alpha_cam) =
    f tan(alpha_phys) (the reference camera scales the radial covector by
    sqrt(f), utils.py:179-186), pinhole tan mapping to the plane."""
    f = 1.0 - 2.0 * mass / R0
    b_crit = 3.0 * np.sqrt(3.0) * mass
    alpha_phys = np.arcsin(b_crit * np.sqrt(f) / R0)
    tan_cam = f * np.tan(alpha_phys)
    return tan_cam * PLANE_D / PLANE_W * SIZE


def bardeen_escapes(rhos, spin, charge=0.0, psis=None):
    """Analytic escape predicate for camera rays at the given pixel radii:
    each ray's conserved (xi, eta) = (L_z/E, Q/E^2) follows in closed form
    from its initial covector; the backward ray escapes iff the Bardeen
    radial potential R(r) = [E(r^2+a^2) - a L]^2 - Delta [(L-aE)^2 + Q]
    has a real root in (r_+, r0) (quartic root test, Bardeen 1973).  Host
    float64 math via the actual Cartesian-chart camera, so the predicate
    sees exactly the rays the renderer shoots."""
    from ..physics.camera import cartesian_ics_from_pixels
    from ..physics.spacetime import kerr_schild_g_inv
    if psis is None:
        psis = PSIS
    params = jnp.asarray([1.0, spin, charge])
    pix = jnp.asarray(_pixel_positions(rhos, np.asarray(psis)[:, None]))
    _, p0, _ = cartesian_ics_from_pixels(
        jnp.asarray([R0, 0.0, 0.0]), pix, params=params,
        g_inv_fn=kerr_schild_g_inv)
    p0 = np.asarray(p0, np.float64)
    E = -p0[..., 0]
    L = R0 * p0[..., 2]                      # x p_y - y p_x at (R0, 0, 0)
    r_bl_obs = np.sqrt(R0 ** 2 - spin ** 2)  # spheroidal radius at z=0
    p_th = -r_bl_obs * p0[..., 3]            # dz/dtheta = -r at equator
    xi = L / E
    eta = (p_th / E) ** 2

    r_plus = 1.0 + np.sqrt(max(1.0 - spin ** 2 - charge ** 2, 0.0))
    out = np.zeros(xi.shape, dtype=bool)
    for idx in np.ndindex(xi.shape):
        c = (xi[idx] - spin) ** 2 + eta[idx]
        p1 = np.poly1d([1.0, 0.0, spin ** 2 - spin * xi[idx]]) ** 2
        p2 = np.poly1d([1.0, -2.0, spin ** 2 + charge ** 2]) * c
        roots = (p1 - p2).roots
        real = roots[np.abs(roots.imag) < 1e-9].real
        out[idx] = bool(((real > r_plus + 1e-9) & (real < r_bl_obs)).any())
    return out


def schwarzschild_shadow_error(steps=19_968, delta=0.01, omega=1.0,
                               backend="auto", dtype=jnp.float32):
    """{'px_err': max |boundary - analytic| in 256^2 pixels, 'bracket',
    'rho_num': per-azimuth, 'rho_analytic'} for the production float32
    Schwarzschild path (integrate_dispatch: the compensated Pallas kernel
    on TPU)."""
    from ..physics.camera import initial_conditions
    from .integrate import STATUS_ESCAPED, integrate_dispatch

    def escape(rhos):
        pix = jnp.asarray(_pixel_positions(rhos, PSIS[:, None]), dtype)
        q0, p0, *_ = initial_conditions(
            jnp.asarray([R0, 0.0, 0.0], dtype), pix, mass_bh=1.0)
        _, _, status, _ = integrate_dispatch(
            q0.reshape(-1, 4), p0.reshape(-1, 4), steps,
            jnp.asarray(delta, dtype), jnp.asarray(2.0, dtype),
            jnp.asarray(BOUNDARY, dtype), jnp.asarray(omega, dtype),
            backend=backend, equatorial=True, unroll=PROBE_UNROLL)
        return np.asarray(status).reshape(rhos.shape) == STATUS_ESCAPED

    rho_num, bracket = bisect_boundary(escape, 15.0, 32.0)
    rho_ana = schwarzschild_analytic_rho()
    return {
        "px_err": float(np.abs(rho_num - rho_ana).max()),
        "bracket_px": round(bracket, 4),
        "rho_num": [round(float(r), 3) for r in rho_num],
        "rho_analytic": round(float(rho_ana), 3),
    }


def kerr_shadow_errors(spin=0.9, charge=0.0, steps=8_000, delta=0.02,
                       order=4, backend="auto", dtype=jnp.float32,
                       interpret=False):
    """{'px_err': per-azimuth |boundary - Bardeen| in 256^2 pixels, ...}
    for the compensated float32 Kerr-Schild path (+ analytic rescue).

    Budget: escapers travel ~3,800 composed steps at delta = 0.02;
    near-critical winders are settled exactly by the analytic rescue long
    before that, so 8k steps classifies every ray.  Expected errors are
    deep sub-pixel (measured 0.0002-0.016 px on CPU; this function
    reproduces that on the Mosaic-compiled kernel)."""
    from ..physics.camera import cartesian_ics_from_pixels
    from ..physics.spacetime import kerr_schild_g_inv
    from .integrate import STATUS_ESCAPED, resolve_backend

    params = jnp.asarray([1.0, spin, charge], dtype)
    backend = resolve_backend(backend)  # 'auto' -> xla off-TPU

    def escape(rhos):
        pix = jnp.asarray(_pixel_positions(rhos, PSIS[:, None]), dtype)
        q0, p0, _ = cartesian_ics_from_pixels(
            jnp.asarray([R0, 0.0, 0.0], dtype), pix, params=params,
            g_inv_fn=kerr_schild_g_inv)
        q0 = q0.reshape(-1, 4)
        p0 = p0.reshape(-1, 4)
        if backend == "xla":
            from .integrate_ks import integrate_batch_ksc
            _, _, status, _ = integrate_batch_ksc(
                q0, p0, steps, jnp.asarray(delta, dtype), params,
                jnp.asarray(BOUNDARY, dtype), jnp.asarray(1.0, dtype),
                order=order)
        else:
            from .integrate_pallas_ks import integrate_batch_pallas_ks
            from .integrate_ks import ks_substeps
            n_sub = len(ks_substeps(jnp.asarray(delta, dtype),
                                    jnp.asarray(1.0, dtype), order))
            _, _, status, _ = integrate_batch_pallas_ks(
                q0, p0, steps, jnp.asarray(delta, dtype), params,
                jnp.asarray(BOUNDARY, dtype), jnp.asarray(1.0, dtype),
                order=order, compensated=dtype == jnp.float32,
                interpret=interpret,
                unroll=max(1, PROBE_UNROLL // n_sub))
        return np.asarray(status).reshape(rhos.shape) == STATUS_ESCAPED

    rho_ana, br_a = bisect_boundary(
        lambda r: bardeen_escapes(r, spin, charge), 10.0, 34.0, rounds=4)
    rho_num, br_n = bisect_boundary(escape, 10.0, 34.0, rounds=3, k=9)
    err = np.abs(rho_num - rho_ana)
    return {
        "spin": spin,
        "charge": charge,
        "px_err": [round(float(e), 3) for e in err],
        "px_err_max": float(err.max()),
        "bracket_px": round(br_n, 4),
        "rho_num": [round(float(r), 3) for r in rho_num],
        "rho_bardeen": [round(float(r), 3) for r in rho_ana],
    }


def ks_kernel_parity(spin=0.9, charge=0.0, size=48, steps=4_992,
                     delta=0.05, dtype=jnp.float32, interpret=False):
    """Compensated KS Pallas kernel vs its XLA twin ON THE SAME DEVICE:
    status / step-count / final-position agreement.  Both compile the same
    step functions (engine.integrate_ks.make_ks_step), so any mismatch is
    a Mosaic-vs-XLA compilation difference."""
    from ..physics.camera import camera_rays_cartesian
    from ..physics.spacetime import kerr_schild_g_inv
    from .integrate import STATUS_ESCAPED
    from .integrate_ks import integrate_batch_ksc
    from .integrate_pallas_ks import integrate_batch_pallas_ks

    params = jnp.asarray([1.0, spin, charge], dtype)
    q0, p0, _ = camera_rays_cartesian(
        jnp.asarray([R0, 0.0, 0.0], dtype), jnp.asarray(FOV, dtype),
        size, size, params=params, g_inv_fn=kerr_schild_g_inv, dtype=dtype)
    q0 = q0.reshape(-1, 4)
    p0 = p0.reshape(-1, 4)
    d = jnp.asarray(delta, dtype)
    b = jnp.asarray(BOUNDARY, dtype)
    om = jnp.asarray(1.0, dtype)

    qk, _, sk, nk = integrate_batch_pallas_ks(
        q0, p0, steps, d, params, b, om, compensated=True,
        interpret=interpret, unroll=PROBE_UNROLL)
    qt, _, st, nt = integrate_batch_ksc(q0, p0, steps, d, params, b, om)

    sk, st = np.asarray(sk), np.asarray(st)
    esc = (sk == STATUS_ESCAPED) & (st == STATUS_ESCAPED)
    dq = (np.abs(np.asarray(qk)[esc, 1:] - np.asarray(qt)[esc, 1:]).max()
          if esc.any() else 0.0)
    return {
        "rays": int(q0.shape[0]),
        "steps": steps,
        "status_mismatch": int((sk != st).sum()),
        "exit_step_mismatch": int((np.asarray(nk) != np.asarray(nt)).sum()),
        "max_escape_pos_delta": float(dq),
    }


def subring_kernel_parity(spin=0.9, size=24, steps=2_944, delta=0.05,
                          n_orders=3, elev=0.3, dtype=jnp.float32,
                          interpret=False):
    """Subring Pallas kernel vs its TRUE XLA twin ON THE SAME DEVICE:
    status / total-crossing-count / recorded-event agreement.  Both
    compile the same step/guard/crossing-recorder functions
    (integrate_ks.make_ks_step, compensated, with deficit-folded event
    reads), so any disagreement is a Mosaic-vs-XLA compilation
    difference — the round-3 version compared against the PLAIN
    engine.subring integrator, and the 8.4e-3 event drift it reported
    was dominated by that integrator's own uncompensated f32 error, not
    kernel miscompilation."""
    from ..physics.camera import cartesian_ics_from_pixels, pixel_grid_lookat
    from ..physics.spacetime import kerr_schild_g_inv
    from .integrate_ks import integrate_batch_subrings_ksc
    from .integrate_pallas_ks import integrate_batch_pallas_subrings

    params = jnp.asarray([1.0, spin, 0.0], dtype)
    obs = jnp.asarray([R0 * np.cos(elev), 0.0, R0 * np.sin(elev)], dtype)
    pix = pixel_grid_lookat(obs, jnp.asarray(FOV, dtype), size, size,
                            dtype=dtype)
    q0, p0, _ = cartesian_ics_from_pixels(obs, pix.reshape(-1, 3),
                                          params=params,
                                          g_inv_fn=kerr_schild_g_inv)
    d = jnp.asarray(delta, dtype)
    b = jnp.asarray(BOUNDARY, dtype)
    om = jnp.asarray(1.0, dtype)

    _, _, sk, _, hq_k, hp_k, cnt_k = integrate_batch_pallas_subrings(
        q0, p0, steps, d, params, b, om, n_orders=n_orders,
        compensated=True, interpret=interpret, unroll=PROBE_UNROLL)
    _, _, sx, _, hq_x, hp_x, cnt_x = integrate_batch_subrings_ksc(
        q0, p0, steps, d, params, b, om, n_orders=n_orders)

    cnt_k, cnt_x = np.asarray(cnt_k), np.asarray(cnt_x)
    filled = (np.minimum(cnt_k, cnt_x)[None, :]
              > np.arange(n_orders)[:, None])
    dq = (np.abs(np.asarray(hq_k) - np.asarray(hq_x))[filled].max()
          if filled.any() else 0.0)
    dp = (np.abs(np.asarray(hp_k) - np.asarray(hp_x))[filled].max()
          if filled.any() else 0.0)
    return {
        "rays": int(q0.shape[0]),
        "steps": steps,
        "n_orders": n_orders,
        "status_mismatch": int((np.asarray(sk) != np.asarray(sx)).sum()),
        "count_mismatch": int((cnt_k != cnt_x).sum()),
        "max_crossings": int(cnt_x.max()),
        "max_event_q_delta": float(dq),
        "max_event_p_delta": float(dp),
    }


CHECKS = (("schw", schwarzschild_shadow_error),
          ("kerr", kerr_shadow_errors),
          ("ks_parity", ks_kernel_parity),
          ("subring_parity", subring_kernel_parity))


def run_all(parallel=True):
    """Run every on-chip validation check; {name: result-or-error dict}.

    parallel=True runs the four checks on worker threads.  JAX dispatch is
    thread-safe, the probes touch disjoint programs, and the compile
    service builds them concurrently (measured ~2.8x for 4 programs), so
    the wall time is the SLOWEST check instead of the sum — this is what
    makes the bench's validation tail affordable every round.  A failing
    check must never cost the round its headline artifact: failures come
    back as {"error": ...} entries instead of raising.
    """
    def guarded(check):
        try:
            return check()
        except Exception as e:                      # noqa: BLE001
            return {"error": f"{type(e).__name__}: {e}"[:300]}

    if not parallel:
        return {name: guarded(check) for name, check in CHECKS}
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(len(CHECKS)) as ex:
        futs = {name: ex.submit(guarded, check) for name, check in CHECKS}
        return {name: f.result() for name, f in futs.items()}
