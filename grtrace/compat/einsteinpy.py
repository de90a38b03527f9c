"""EinsteinPy-compatible `Geodesic` / `Nulllike` / `Timelike` API.

The reference's CPU ground-truth path is EinsteinPy's `Nulllike` geodesic
(reference: tests/debug_single_ray.py:51-60,
tests/einsteinpy-geodesic-test/main.py:145-155).  einsteinpy is not a
dependency of this framework; this module provides drop-in classes
backed by the grtrace FANTASY engine so reference users can migrate
unchanged.  Validated against the reference's committed EinsteinPy output
(tests/einsteinpy-geodesic-test/trajectory.csv): machine-epsilon agreement
over thousands of steps (see tests/test_compat_einsteinpy.py).

Semantics mirrored from EinsteinPy:
  * momentum = (p_r, p_th, p_ph); p_t is closed internally with the
    `_P()` root of the mass-shell quadratic g^{ab} p_a p_b = -mu^2
    (mu = 0 null, mu = 1 timelike): the (-B + disc)/(2 g^tt) branch,
    i.e. p_t < 0 / E = -p_t > 0 (reference simulation/utils.py:24,59-60).
    The FANTASY flows themselves are mass-shell independent (H = 1/2
    g^ab p_a p_b for ANY covector), so `Timelike` runs the exact same
    integrator — only this closure differs (physics/timelike.py).
  * no early exit: the integrator runs the full step budget regardless of
    horizon proximity (unlike the render kernels' capture/escape exits).
  * `trajectory` returns (step_indices, data) where data[k] is the state
    *after* step k+1 — rows are
    (t, x, y, z, p_t, p_r, p_th, p_ph) with return_cartesian=True, or
    (t, r, th, ph, p_t, p_r, p_th, p_ph) otherwise.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..physics.hamiltonian import fantasy_step, pack_state, substep_schedule
from ..physics.nullcond import build_null_4momentum


@partial(jax.jit, static_argnames=("steps", "order"))
def _trajectory(q0, p0, steps, delta, rs, omega, order=2):
    """Unmasked scan of FANTASY steps, storing (q1, p1) after each step."""
    dtype = q0.dtype
    delta = jnp.asarray(delta, dtype)
    subs = substep_schedule(delta, jnp.asarray(omega, dtype), order)
    rs = jnp.asarray(rs, dtype)

    state0 = pack_state(q0[None, :], p0[None, :])

    def step(state, _):
        state = fantasy_step(state, subs, rs)
        q1 = jnp.stack([state[i][0] for i in range(4)])
        p1 = jnp.stack([state[4 + i][0] for i in range(4)])
        return state, (q1, p1)

    _, (qs, ps) = jax.lax.scan(step, state0, None, length=steps)
    return qs, ps


class Geodesic:
    """Drop-in analog of einsteinpy.geodesic.Geodesic.

    Parameters follow EinsteinPy: position=(r, th, ph), momentum=
    (p_r, p_th, p_ph), steps, delta, omega, order, return_cartesian,
    suppress_warnings (accepted, unused), time_like (mass shell: False
    -> photon, True -> unit-mass particle), metric in
    {"Schwarzschild", "Kerr", "KerrNewman"} with metric_params=(a,) —
    the spin — or (a, Q) for KerrNewman, exactly EinsteinPy's convention.
    Schwarzschild runs the specialized fast path; Kerr/KerrNewman (and
    Schwarzschild-with-nonzero-a requests) run the generic autodiff engine
    (engine.integrate_generic), which EinsteinPy matches with its own
    metric-generic FANTASY integrator.  The integrator is identical for
    null and timelike — the mass shell only enters the p_t closure.
    """

    def __init__(self, metric="Schwarzschild", metric_params=(0.0,),
                 position=(10.0, np.pi / 2, 0.0),
                 momentum=(1.0, 0.0, 1.0),
                 steps=50, delta=0.5, omega=1.0, order=2,
                 return_cartesian=True,
                 suppress_warnings=False, time_like=False, mass=1.0):
        if metric not in ("Schwarzschild", "Kerr", "KerrNewman"):
            raise NotImplementedError(
                f"metric {metric!r}: supported metrics are Schwarzschild, "
                "Kerr and KerrNewman")
        spin = float(metric_params[0]) if metric_params else 0.0
        charge = (float(metric_params[1])
                  if metric == "KerrNewman" and len(metric_params) > 1
                  else 0.0)
        if metric == "Schwarzschild" and spin != 0.0:
            raise ValueError("Schwarzschild requires spin a == 0; "
                             "use metric='Kerr' for a != 0")
        self.spin = spin
        self.charge = charge

        self.metric = metric
        self.steps = int(steps)
        self.delta = float(delta)
        self.omega = float(omega)
        self.order = int(order)
        self.return_cartesian = bool(return_cartesian)
        self.time_like = bool(time_like)
        self.mass = float(mass)

        pos = np.asarray(position, dtype=np.float64)
        mom = np.asarray(momentum, dtype=np.float64)
        # the EinsteinPy `_P()` root choice: p_t < 0, E = -p_t > 0
        if self.time_like:
            # mass shell g^ab p_a p_b = -1; (-B + disc)/(2 g^tt) is _P()'s
            # branch (physics/timelike.py timelike_p_t future=True).
            from ..physics.spacetime import kerr_g_inv
            from ..physics.timelike import build_timelike_4momentum
            p4 = np.asarray(build_timelike_4momentum(
                jnp.asarray(mom), jnp.asarray(pos),
                jnp.asarray([self.mass, self.spin, self.charge]),
                kerr_g_inv, mu=1.0, future=True))
        elif metric in ("Kerr", "KerrNewman"):
            from ..physics import spacetime
            p4 = np.asarray(spacetime.build_null_4momentum(
                jnp.asarray(mom), jnp.asarray(pos),
                jnp.asarray([self.mass, self.spin, self.charge]),
                spacetime.kerr_g_inv, future=False))
        else:
            p4 = np.asarray(build_null_4momentum(
                jnp.asarray(mom), jnp.asarray(pos), mass_bh=self.mass,
                future=False))
        self.position = np.array([0.0, *pos])
        self.momentum = p4

        self._qs = None
        self._ps = None

    def _integrate(self):
        if self._qs is None:
            # EinsteinPy is float64-only.  Enable x64 only for the scope of
            # this integration and restore the caller's setting after —
            # flipping it globally would silently change dtype promotion for
            # every subsequent trace in the process (jit caches are keyed on
            # the flag, so toggling is safe for compiled functions).
            prev_x64 = bool(jax.config.jax_enable_x64)
            if not prev_x64:
                jax.config.update("jax_enable_x64", True)
            try:
                self._integrate_x64()
            finally:
                if not prev_x64:
                    jax.config.update("jax_enable_x64", False)
        return self._qs, self._ps

    def _integrate_x64(self):
        """Integration body; caller guarantees jax_enable_x64 is on."""
        if self.metric in ("Kerr", "KerrNewman"):
            from ..engine.integrate_generic import trajectory_generic
            qs, ps = trajectory_generic(
                jnp.asarray(self.position, jnp.float64),
                jnp.asarray(self.momentum, jnp.float64),
                self.steps, self.delta,
                jnp.asarray([self.mass, self.spin, self.charge],
                            jnp.float64),
                self.omega, order=self.order, metric="Kerr")
        else:
            qs, ps = _trajectory(
                jnp.asarray(self.position, jnp.float64),
                jnp.asarray(self.momentum, jnp.float64),
                self.steps, self.delta, 2.0 * self.mass, self.omega,
                order=self.order)
        self._qs = np.asarray(qs)
        self._ps = np.asarray(ps)

    @property
    def trajectory(self):
        """(step_indices, (steps, 8) array) — EinsteinPy layout."""
        qs, ps = self._integrate()
        t = qs[:, 0]
        if self.return_cartesian:
            r, th, ph = qs[:, 1], qs[:, 2], qs[:, 3]
            sin_th = np.sin(th)
            cols = [t, r * sin_th * np.cos(ph), r * sin_th * np.sin(ph),
                    r * np.cos(th)]
        else:
            cols = [t, qs[:, 1], qs[:, 2], qs[:, 3]]
        data = np.stack(cols + [ps[:, 0], ps[:, 1], ps[:, 2], ps[:, 3]],
                        axis=-1)
        return np.arange(self.steps), data

    def __repr__(self):
        return (f"{type(self).__name__}(metric={self.metric!r}, "
                f"steps={self.steps}, delta={self.delta}, "
                f"omega={self.omega})")


class Nulllike(Geodesic):
    """einsteinpy.geodesic.Nulllike: a photon (mass shell = 0).

    EinsteinPy's subclass pins time_like=False and does not expose it
    in the signature; passing it here is a TypeError, as upstream.
    """

    def __init__(self, metric="Schwarzschild", metric_params=(0.0,),
                 position=(10.0, np.pi / 2, 0.0),
                 momentum=(1.0, 0.0, 1.0),
                 steps=50, delta=0.5, omega=1.0, order=2,
                 return_cartesian=True,
                 suppress_warnings=False, mass=1.0):
        super().__init__(metric=metric, metric_params=metric_params,
                         position=position, momentum=momentum,
                         steps=steps, delta=delta, omega=omega, order=order,
                         return_cartesian=return_cartesian,
                         suppress_warnings=suppress_warnings,
                         time_like=False, mass=mass)


class Timelike(Geodesic):
    """einsteinpy.geodesic.Timelike: a unit-mass particle (mu = 1).

    Bound orbits, plunges and precession on the same FANTASY kernels the
    renderer runs; the conserved Hamiltonian is -1/2 instead of 0.

    NOTE on `omega`: Tao's phase-space-doubling coupling must exceed a
    problem-dependent bound for the two copies to stay bound over long
    integrations.  Photon renders (capture/escape within ~1 period) run
    fine at the reference's omega=0.01, but bound massive orbits
    integrated over many radial periods blow up there — measured: a
    mildly eccentric r in [15.7, 20] Schwarzschild orbit diverges to
    r ~ -1e27 within 4000 steps at omega=0.01, while omega=1.0 (the
    default here, as in EinsteinPy's Timelike) conserves the mass shell
    to ~1e-7 over the same run (tests/test_compat_einsteinpy.py).
    """

    def __init__(self, metric="Schwarzschild", metric_params=(0.0,),
                 position=(40.0, np.pi / 2, 0.0),
                 momentum=(0.0, 0.0, 4.0),
                 steps=50, delta=0.5, omega=1.0, order=2,
                 return_cartesian=True,
                 suppress_warnings=False, mass=1.0):
        super().__init__(metric=metric, metric_params=metric_params,
                         position=position, momentum=momentum,
                         steps=steps, delta=delta, omega=omega, order=order,
                         return_cartesian=return_cartesian,
                         suppress_warnings=suppress_warnings,
                         time_like=True, mass=mass)
