"""Pallas TPU kernel for batched Kerr geodesics (Kerr-Schild chart).

The Kerr twin of engine.integrate_pallas: the generic autodiff engine
(engine.integrate_generic) is the correctness-first path for any metric;
this kernel is the speed-of-light specialization for the one metric family
beyond Schwarzschild the framework ships — Kerr in horizon-regular
Cartesian Kerr-Schild coordinates (physics.kerr_schild, hand-derived
flows pinned to the autodiff engine by tests).

Same design as the Schwarzschild kernel (see integrate_pallas's module
docstring): rays on the VPU lane axis as (16, 8, 128) component tiles, a
per-tile `lax.while_loop` with early exit once every ray in the tile has
retired, masked UNROLL-step groups between exit checks, scalar params in
SMEM.  Two Kerr-specific additions:

  * the active test runs on the Boyer-Lindquist radius reconstructed from
    the Cartesian state (capture) and the flat embedding radius (escape);
  * the null-invariant blow-up guard of the XLA generic path
    (integrate_generic.guard_cartesian) runs INSIDE the loop: a
    backward-traced ray accumulating on the past horizon blueshifts
    exponentially until the fixed step under-resolves the kick; the
    Hamiltonian invariant detects that immediately and the ray is parked
    exactly as the XLA path parks it (captured shell / the reference's
    r >= 100 numerical sentinel, raytracing.py:213-215).

Status codes and parked coordinates use the same values as
integrate_batch_generic, so the classify/composite stage downstream treats
both backends identically.  Exact guard-trip TIMING can differ by a step
on captured plungers — the staggered (half-A-fused) composition rounds
differently at the last ulp and the horizon blow-up amplifies that
chaotically (see tests/test_pallas_ks.py) — which never changes a healthy
ray's classification.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.hamiltonian import bridge_sizes, yoshida_gammas
from ..physics.kerr_schild import (close_ks, core_ks, hamiltonian_ks,
                                   ks_radius_c, open_ks)
from ..physics.spacetime import horizon_radius
from .integrate import STATUS_ALIVE, STATUS_CAPTURED, STATUS_ESCAPED
from .integrate_pallas import LANES, SUBLANES, TILE

N_ROWS = 16
N_SCAL = 6  # mass, a, charge, r_cap, r_max, plunge_zone (+ 4 per substep:
#             d_j, cos_j, sin_j, bridge_j — staggered schedule)
# The KS step body is ~4x heavier than the equatorial Schwarzschild one, so
# the any(active)/loop overhead amortizes sooner: interleaved on-chip A/B at
# 256^2/30k-step spin-0.9 gave 16 -> 0.0794 s vs 64 -> 0.0813 s.  Unlike the
# Schwarzschild kernel (UNROLL=64), 16 is the sweet spot here.
UNROLL = 16


def _active_ks(q1x, q1y, q1z, a, r_cap, r_max):
    r_bl = ks_radius_c(q1x, q1y, q1z, a)
    rho2 = q1x * q1x + q1y * q1y + q1z * q1z
    return (r_bl > r_cap) & (rho2 < r_max * r_max)


def _make_kernel_ks(steps, n_sub):
    unroll = max(1, UNROLL // n_sub)

    def kernel(params_ref, state_ref, out_state_ref, ns_ref):
        mass = params_ref[0]
        a = params_ref[1]
        charge = params_ref[2]
        r_cap = params_ref[3]
        r_max = params_ref[4]
        plunge_zone = params_ref[5]
        subs = tuple((params_ref[N_SCAL + 4 * j],
                      params_ref[N_SCAL + 1 + 4 * j],
                      params_ref[N_SCAL + 2 + 4 * j],
                      params_ref[N_SCAL + 3 + 4 * j]) for j in range(n_sub))
        r_plus = r_cap / 1.05
        d0 = subs[0][0]

        comps = tuple(state_ref[0, i] for i in range(N_ROWS))
        ns0 = jnp.zeros((SUBLANES, LANES), dtype=jnp.int32)

        # staggered loop (see physics.kerr_schild staggered section): one
        # masked opening half-A, cores of B M B A(bridge), one closing
        # half-A — one A (and its _kick_drift geometry evaluation) per
        # substep instead of two
        act0 = _active_ks(comps[1], comps[2], comps[3], a, r_cap, r_max)
        if steps > 0:  # steps == 0 must be an exact no-op
            opened = open_ks(comps, d0, mass, a, charge)
            comps = tuple(jnp.where(act0, o, c)
                          for o, c in zip(opened, comps))

        def masked_step(comps, ns):
            # inline _active_ks so r_old is computed once per step (it is
            # reused by the plunge-zone test below)
            r_old = ks_radius_c(comps[1], comps[2], comps[3], a)
            rho2 = (comps[1] * comps[1] + comps[2] * comps[2]
                    + comps[3] * comps[3])
            act = (r_old > r_cap) & (rho2 < r_max * r_max)
            new = comps
            for d_i, cos_i, sin_i, bridge_i in subs:
                new = core_ks(new, d_i, mass, a, cos_i, sin_i, bridge_i,
                              charge)

            # --- null-invariant blow-up guard (== guard_cartesian) ---
            # The invariant |h| test runs on the (q1, p2) rows: in the
            # staggered state those hold the EXACT plain-composition
            # boundary values (flow A never writes them), so the test
            # keeps its original sensitivity/threshold.  Finiteness must
            # ALSO cover the A-written rows (p1): a blueshifted plunge can
            # overflow the A(bridge) kick into p1 one step before the
            # invariant trips, and a parked ray must never carry Inf/NaN
            # momenta into photon_data.  One aggregate sum over q1+p1+p2:
            # any NaN/Inf component makes the sum non-finite (finite
            # overflow to Inf only happens for ~1e38 garbage, which must
            # trip the guard anyway).  The |h| test is in negated-<= form
            # so a NaN Hamiltonian also registers.
            agg = new[0] + new[1] + new[2] + new[3] \
                + new[4] + new[5] + new[6] + new[7] \
                + new[12] + new[13] + new[14] + new[15]
            finite = jnp.isfinite(agg)
            h = hamiltonian_ks(new[1], new[2], new[3], new[12], new[13],
                               new[14], new[15], mass, a, charge)
            p2n = new[13] * new[13] + new[14] * new[14] \
                + new[15] * new[15] + 1.0
            exploded = ~(finite & (jnp.abs(h) <= 3e-3 * p2n))
            r_new = ks_radius_c(new[1], new[2], new[3], a)
            crossed = finite & (r_new < r_plus) & ~exploded
            # pre-step radial heading, p1 copy — same heuristic and copy
            # as integrate_generic.guard_cartesian (q_old . p_old)
            inward = (comps[1] * comps[5] + comps[2] * comps[6]
                      + comps[3] * comps[7]) < 0.0
            capture = crossed | (exploded & (inward | (r_old < plunge_zone)))
            bad = exploded | crossed
            # fused guard + activity select chain (one pass over the rows;
            # bad rays keep old values except the parked q1 coordinates):
            # parked q1: captured -> (t, 0, 0, 0.5 r_cap) on-axis point
            # (ks_radius == |z|); numerical -> (t, 150, 0, 0) sentinel
            ok = act & ~bad
            park = act & bad
            out = [jnp.where(ok, n, o) for n, o in zip(new, comps)]
            park_x = jnp.where(capture, 0.0, 150.0)
            park_z = jnp.where(capture, 0.5 * r_cap, 0.0)
            out[1] = jnp.where(park, park_x, out[1])
            out[2] = jnp.where(park, 0.0, out[2])
            out[3] = jnp.where(park, park_z, out[3])
            return tuple(out), ns + act.astype(jnp.int32)

        main_iters = steps // unroll

        def cond(carry):
            k, comps, _ = carry
            return (k < main_iters) & jnp.any(
                _active_ks(comps[1], comps[2], comps[3], a, r_cap, r_max))

        def body(carry):
            k, comps, ns = carry
            for _ in range(unroll):
                comps, ns = masked_step(comps, ns)
            return k + 1, comps, ns

        _, comps, ns = jax.lax.while_loop(cond, body,
                                          (jnp.int32(0), comps, ns0))
        for _ in range(steps % unroll):
            comps, ns = masked_step(comps, ns)

        # undo the pending half-A for every opened ray.  Unlike the
        # Schwarzschild kernel, no park exclusion is needed: the park
        # points are regular chart points, flow A cannot move q1, and a
        # parked ray's (p1, q2) are reverted bookkeeping values anyway.
        if steps > 0:
            closed = close_ks(comps, d0, mass, a, charge)
            comps = tuple(jnp.where(act0, cl, c)
                          for cl, c in zip(closed, comps))

        for i in range(N_ROWS):
            out_state_ref[0, i] = comps[i]
        ns_ref[0, 0] = ns

    return kernel


@partial(jax.jit, static_argnames=("steps", "interpret", "n_sub"))
def _integrate_tiles_ks(state, params, steps, interpret=False, n_sub=1):
    num_tiles = state.shape[0]
    dtype = state.dtype
    kernel = _make_kernel_ks(steps, n_sub)
    out_state, ns = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, N_ROWS, SUBLANES, LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, N_ROWS, SUBLANES, LANES),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, SUBLANES, LANES),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(state.shape, dtype),
                   jax.ShapeDtypeStruct((num_tiles, 1, SUBLANES, LANES),
                                        jnp.int32)),
        interpret=interpret,
    )(params, state)
    return out_state, ns


def _pack_tiles_ks(q0s, p0s, r_max):
    """(N, 4) q/p -> (T, 16, 8, 128) tiles; padding rays parked outside the
    boundary sphere (x = 2 r_max) so they are born inactive."""
    n = q0s.shape[0]
    num_tiles = -(-n // TILE)
    n_pad = num_tiles * TILE

    comp = jnp.concatenate([q0s.T, p0s.T, q0s.T, p0s.T], axis=0)
    pad_col = jnp.zeros((N_ROWS,), comp.dtype).at[1].set(2.0 * r_max)
    pad_col = pad_col.at[9].set(2.0 * r_max)
    pad = jnp.broadcast_to(pad_col[:, None], (N_ROWS, n_pad - n))
    comp = jnp.concatenate([comp, pad], axis=1)
    state = comp.reshape(N_ROWS, num_tiles, SUBLANES,
                         LANES).transpose(1, 0, 2, 3)
    return state, n


def _cost_sort_key_ks(q0s, p0s, mass):
    """Predicted cost key: flat-space impact parameter distance to the
    Schwarzschild critical ring 3 sqrt(3) M.  For Kerr the critical locus
    is spin- and sign-dependent (the shadow is D-shaped), but the key only
    has to CLUSTER long-running rays into the same tiles — a ring-distance
    proxy keeps photon-ring rays together, which is what tile early exit
    needs (exactness is irrelevant to correctness)."""
    x = q0s[:, 1:]
    p = p0s[:, 1:]
    e = jnp.abs(p0s[:, 0])
    lvec = jnp.cross(x, p)
    b = jnp.linalg.norm(lvec, axis=1) / jnp.maximum(e, 1e-30)
    b_crit = 3.0 * jnp.sqrt(3.0) * mass
    return jnp.abs(b - b_crit)


@partial(jax.jit, static_argnames=("steps", "interpret", "sort_rays",
                                   "order"))
def integrate_batch_pallas_ks(q0s, p0s, steps, delta, params, r_max, omega,
                              interpret=False, sort_rays=True, order=2):
    """Drop-in replacement for integrate_batch_generic(metric='KerrSchild')
    on TPU: same (final_q, final_p, status, n_steps) contract, same capture
    shell, parking coordinates and status codes, plus per-tile early exit
    and cost-sorted tiling for wall-clock.

    params = (M, a) or (M, a, Q) (traced; the Kerr-Newman charge rides a
    third slot); delta/r_max/omega traced; steps/order static.
    """
    dtype = q0s.dtype
    params = jnp.asarray(params, dtype)
    mass, a = params[0], params[1]
    charge = params[2] if params.shape[0] > 2 else jnp.zeros((), dtype)
    delta = jnp.asarray(delta, dtype)
    r_max = jnp.asarray(r_max, dtype)
    omega = jnp.asarray(omega, dtype)

    r_plus = horizon_radius("Kerr", mass, a, charge)
    r_cap = 1.05 * r_plus
    # outer edge of the photon region (retrograde circular photon orbit,
    # Bardeen 1973) — the plunge zone of integrate_generic.guard_cartesian
    # (uncharged-Kerr radius: a safe upper bound for Kerr-Newman, see there)
    plunge_zone = 2.0 * mass * (1.0 + jnp.cos(
        (2.0 / 3.0) * jnp.arccos(-jnp.abs(a) / mass)))

    gammas = yoshida_gammas(order)
    deltas = [g * delta for g in gammas]
    bridges = bridge_sizes(deltas)
    scal = [mass, a, charge, r_cap, r_max, plunge_zone]
    for j, d_i in enumerate(deltas):
        angle = 2.0 * omega * d_i
        scal += [d_i, jnp.cos(angle), jnp.sin(angle), bridges[j]]
    smem = jnp.stack(scal)

    if sort_rays:
        sort_idx = jnp.argsort(_cost_sort_key_ks(q0s, p0s, mass))
        q0s = q0s[sort_idx]
        p0s = p0s[sort_idx]

    state, n = _pack_tiles_ks(q0s, p0s, r_max)
    out_state, ns = _integrate_tiles_ks(state, smem, steps,
                                        interpret=interpret,
                                        n_sub=len(gammas))

    comp = out_state.transpose(1, 0, 2, 3).reshape(N_ROWS, -1)[:, :n]
    final_q = comp[0:4].T
    final_p = comp[4:8].T
    n_steps = ns.reshape(-1)[:n]

    if sort_rays:
        inverse = jnp.argsort(sort_idx)
        final_q = final_q[inverse]
        final_p = final_p[inverse]
        n_steps = n_steps[inverse]

    r_bl = ks_radius_c(final_q[:, 1], final_q[:, 2], final_q[:, 3], a)
    rho = jnp.linalg.norm(final_q[:, 1:], axis=1)
    status = jnp.where(r_bl <= r_cap, STATUS_CAPTURED,
                       jnp.where(rho >= r_max, STATUS_ESCAPED, STATUS_ALIVE))
    return final_q, final_p, status, n_steps
