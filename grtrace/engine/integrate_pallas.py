"""Pallas TPU kernel for batched FANTASY geodesic integration.

The hot loop of the whole framework — the TPU-native counterpart of the
reference's `fantasy_integrate_batch_ord2` CUDA kernel (reference:
simulation/cuda_geodesic.py:579-602, one thread per ray, early `break`).

Design (see /opt/skills/guides/pallas_guide.md):
  * Rays live on the VPU lane axis.  The phase-space state is laid out as
    (16, SUBLANES, 128) per tile — 16 component rows (q1,p1,q2,p2 x 4) by
    SUBLANES x 128 rays (two (8,128) vector registers per row) — so every
    elementwise flow op runs at full vreg occupancy with enough
    independent work to hide VPU op latency.
  * The grid iterates over ray tiles; each tile runs its own
    `lax.while_loop` that terminates as soon as *every* ray in the tile has
    been captured or escaped.  This is the CUDA per-thread `break` promoted
    to tile granularity: image-contiguous rays have correlated lifetimes, so
    tiles over easy sky regions retire in a few hundred steps while only
    the photon-ring tiles run long.
  * The physics is the same component-tuple flow code used by the XLA
    backend (grtrace.physics.hamiltonian) — the kernel only adds layout,
    masking and the early-exit loop, so oracle agreement transfers.
  * Steps are applied in masked groups of UNROLL between exit checks to
    amortize the `any(active)` reduction; a statically-unrolled remainder
    preserves the exact `steps` budget semantics.

All integrator parameters are baked into the kernel closure (fixed per
scene; retrace on change is ~1 s).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.hamiltonian import (bridge_sizes, fantasy_step_ord2_eq,
                                   fantasy_step_ord2_eqc,
                                   fantasy_step_ord2_fused, staggered_eq,
                                   staggered_eqc, yoshida_gammas)
from .integrate import (STATUS_ALIVE, STATUS_CAPTURED, STATUS_ESCAPED,
                        jump_cap)

LANES = 128
# Tile height swept on a real v5e chip at the 400x400/200k-step headline
# workload (raw integration, host-fetch timed): 8 sublanes -> 0.164 s,
# 16 -> 0.142 s, 24 -> 0.147 s, 32 -> 0.148 s.  16 rows per tile give the
# VPU twice the independent work per flow op (hides op latency in this
# latency-bound kernel) while keeping the per-tile early exit fine enough
# that masked-step waste stays small; taller tiles start paying coarser
# exits.  Must stay a multiple of 8 (f32 sublane tiling).
SUBLANES = 16
TILE = SUBLANES * LANES  # 2048 rays per grid step
# Masked steps between early-exit checks.  Re-swept on a real v5e chip at
# the 400x400/200k-step headline workload after the move to 16-sublane
# tiles (interleaved runs; the tunnel drifts, so only within-run deltas
# count): 8 -> 0.126 s, 16 -> 0.117-0.120 s, 32 -> 0.118 s, 64 -> 0.114-
# 0.117 s, 128 -> 0.120 s.  64 amortizes the any(active) reduction + loop
# bookkeeping best; the waste is <= UNROLL-1 masked steps per tile exit,
# noise against 10^3..10^5-step budgets.
UNROLL = 64


def _active(q1r, rs, r_max):
    return (q1r > 1.1 * rs) & (q1r < r_max)


def _read_subs(params_ref, n_sub, staggered=False):
    """SMEM layout: [rs, r_max, cap, (d_j, c_j, s_j[, bridge_j]) x n_sub]
    — triples for the plain step, quadruples for the staggered one."""
    w = 4 if staggered else 3
    return tuple(tuple(params_ref[3 + w * j + k] for k in range(w))
                 for j in range(n_sub))


def _make_kernel(step2_fn, n_rows, steps, n_sub, unroll=None,
                 staggered_flows=None, open_close=True):
    """Build the tile kernel for either layout (16-row generic / 12-row
    equatorial) and any composed order (n_sub = 3^((order-2)/2) substeps).
    The substep schedule is read from SMEM; the per-substep loop is a static
    python unroll so the loop body stays branch-free on the VPU.

    staggered_flows=(open, core, close) switches the loop body to the
    half-A-fused staggered form (see hamiltonian.make_staggered_flows):
    one masked opening half-A, cores of B M B A(bridge) in the loop, one
    masked closing half-A — one flow-A evaluation per substep instead of
    two.  Used for the equatorial layouts; requires quadruple SMEM params.

    open_close=False runs the staggered CORE loop only, on a state that is
    already in staggered form — the resumable-chunk mode (the checkpoint
    layer opens once at job start and closes once at finalize, so a
    chunked job is bit-identical to the monolithic kernel).
    """
    if unroll is None:
        # Composed steps cost n_sub base steps; keep roughly UNROLL base
        # steps between early-exit checks.
        unroll = max(1, UNROLL // n_sub)

    # blow-up guard rows (see engine.integrate.guard_state): q1_r is row 1
    # in every layout; q2_r and the Kahan deficit rows depend on it
    r2_row = {16: 9, 12: 7, 24: 7}[n_rows]
    deficit_rows = (13, 19) if n_rows == 24 else ()

    def kernel(params_ref, state_ref, out_state_ref, ns_ref):
        rs = params_ref[0]
        r_max = params_ref[1]
        # blow-up jump cap, computed host-side from the COMPOSED step delta
        # (integrate.jump_cap) so the kernel guard matches the XLA twin's
        # at every order (substep sizes gamma_j*delta differ from delta
        # for order > 2)
        cap = params_ref[2]
        subs = _read_subs(params_ref, n_sub,
                          staggered=staggered_flows is not None)

        comps = tuple(state_ref[0, i] for i in range(n_rows))
        ns0 = jnp.zeros((SUBLANES, LANES), dtype=jnp.int32)

        if staggered_flows is not None:
            open_fn, core_fn, close_fn = staggered_flows
            if open_close and steps > 0:  # steps == 0: an exact no-op
                act0 = _active(comps[1], rs, r_max)
                d0 = subs[0][0]
                opened = open_fn(comps, d0, rs)
                comps = tuple(jnp.where(act0, o, c)
                              for o, c in zip(opened, comps))

        def masked_step(comps, ns):
            act = _active(comps[1], rs, r_max)
            new = comps
            if staggered_flows is not None:
                for d_i, cw_i, sw_i, bridge_i in subs:
                    new = core_fn(new, d_i, rs, cw_i, sw_i, bridge_i)
            else:
                for d_i, cos_i, sin_i in subs:
                    new = step2_fn(new, d_i, rs, cos_i, sin_i)
            # horizon blow-up guard: an unresolved plunge kick jumps r by
            # 10..10^4 in one step — revert the ray and park it at r = rs
            # (captured) instead of letting it escape with garbage.  The
            # negated <= form makes NaN/Inf register as bad without a
            # separate isfinite, and the guard + activity masks are fused
            # into ONE select chain (n_rows + 4 selects per step instead
            # of 2*n_rows + 4 — ~6% of the step budget at n_rows=24).
            bad = ~(jnp.abs(new[1] - comps[1]) <= cap)
            ok = act & ~bad
            out = [jnp.where(ok, n, o) for n, o in zip(new, comps)]
            park = act & bad
            for row in (1, r2_row):
                out[row] = jnp.where(park, rs, out[row])
            for row in deficit_rows:
                out[row] = jnp.where(park, 0.0, out[row])
            return tuple(out), ns + act.astype(jnp.int32)

        main_iters = steps // unroll

        def cond(carry):
            k, comps, _ = carry
            return (k < main_iters) & jnp.any(_active(comps[1], rs, r_max))

        def body(carry):
            k, comps, ns = carry
            for _ in range(unroll):
                comps, ns = masked_step(comps, ns)
            return k + 1, comps, ns

        _, comps, ns = jax.lax.while_loop(cond, body,
                                          (jnp.int32(0), comps, ns0))
        for _ in range(steps % unroll):  # static remainder, preserves budget
            comps, ns = masked_step(comps, ns)

        if staggered_flows is not None and open_close and steps > 0:
            # undo the pending half-A for every ray that was opened, except
            # those the guard parked at exactly r == rs (flow A divides by
            # r - rs there; their p/q2 are reverted garbage anyway)
            closed = close_fn(comps, d0, rs)
            close_mask = act0 & (comps[1] != rs)
            comps = tuple(jnp.where(close_mask, cl, c)
                          for cl, c in zip(closed, comps))

        for i in range(n_rows):
            out_state_ref[0, i] = comps[i]
        ns_ref[0, 0] = ns

    return kernel


@partial(jax.jit, static_argnames=("steps", "interpret", "n_rows", "n_sub",
                                   "unroll", "staggered", "open_close"))
def _integrate_tiles(state, params, steps, interpret=False, n_rows=16,
                     n_sub=1, unroll=None, staggered=False, open_close=True):
    """state: (T, n_rows, 8, 128), params: (2+w*n_sub,) SMEM scalars with
    w=3 plain / w=4 staggered (see _substep_params).

    unroll=None uses the chip-tuned UNROLL; interpret-mode callers pass 1
    (bit-identical results — masked no-op steps and the exact-budget
    remainder are unchanged — but a 16x smaller trace, which dominates
    interpret-mode wall time on CPU)."""
    num_tiles = state.shape[0]
    dtype = state.dtype
    step2 = {16: fantasy_step_ord2_fused, 12: fantasy_step_ord2_eq,
             24: fantasy_step_ord2_eqc}[n_rows]
    flows = ({12: staggered_eq, 24: staggered_eqc}[n_rows]
             if staggered else None)
    kernel = _make_kernel(step2, n_rows, steps, n_sub, unroll=unroll,
                          staggered_flows=flows, open_close=open_close)
    out_state, ns = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, n_rows, SUBLANES, LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, n_rows, SUBLANES, LANES),
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


def _pack_tiles(q0s, p0s, r_max, equatorial=False, compensated=False):
    """(N, 4) q/p -> (T, n_rows, 8, 128) tiled state + padding bookkeeping.

    Padding rays are parked outside the domain (r = 2*r_max) so they are
    born inactive and never cost a flow evaluation.  equatorial=True drops
    the theta rows (12-row layout, see hamiltonian equatorial section);
    compensated=True appends 12 zero Kahan-deficit rows (24-row layout).
    """
    n = q0s.shape[0]
    num_tiles = -(-n // TILE)
    n_pad = num_tiles * TILE

    if equatorial:
        half = jnp.stack([q0s[:, 0], q0s[:, 1], q0s[:, 3],
                          p0s[:, 0], p0s[:, 1], p0s[:, 3]], axis=0)  # (6, N)
        comp = jnp.concatenate([half, half], axis=0)                 # (12, N)
        if compensated:
            comp = jnp.concatenate([comp, jnp.zeros_like(comp)], axis=0)
        n_rows = comp.shape[0]
        r_rows = (1, 7)
    else:
        assert not compensated, "compensated path requires equatorial=True"
        comp = jnp.concatenate([q0s.T, p0s.T, q0s.T, p0s.T], axis=0)
        n_rows = 16
        r_rows = (1, 9)

    pad_col = jnp.zeros((n_rows,), comp.dtype)
    for rr in r_rows:
        pad_col = pad_col.at[rr].set(2.0 * r_max)
    if not equatorial:
        pad_col = pad_col.at[2].set(jnp.pi / 2).at[10].set(jnp.pi / 2)
    pad = jnp.broadcast_to(pad_col[:, None], (n_rows, n_pad - n))
    comp = jnp.concatenate([comp, pad], axis=1)

    state = comp.reshape(n_rows, num_tiles, SUBLANES,
                         LANES).transpose(1, 0, 2, 3)
    return state, n


def _unpack_tiles(out_state, ns, n, q0s=None, p0s=None):
    """(T, n_rows, 8, 128) -> final_q (N,4), final_p (N,4), n_steps (N,).

    For the 12-row equatorial layout, the theta slots are reconstructed from
    the (invariant) inputs: q_theta keeps its initial value, p_theta stays 0.
    """
    n_rows = out_state.shape[1]
    comp = out_state.transpose(1, 0, 2, 3).reshape(n_rows, -1)[:, :n]
    if n_rows == 24:  # compensated: fold the Kahan deficits (true = s - c)
        comp = comp[:12] - comp[12:]
        n_rows = 12
    if n_rows == 12:
        final_q = jnp.stack([comp[0], comp[1], q0s[:, 2], comp[2]], axis=-1)
        final_p = jnp.stack([comp[3], comp[4], p0s[:, 2], comp[5]], axis=-1)
    else:
        final_q = comp[0:4].T
        final_p = comp[4:8].T
    n_steps = ns.reshape(-1)[:n]
    return final_q, final_p, n_steps


def _cost_sort_key(q0s, p0s, rs):
    """Predicted integration cost key: |b - b_crit| ascending.

    Tile runtime is the max step count over its TILE rays; grouping rays by
    expected cost cuts the masked-step waste from ~16%% to ~1%% (measured on
    the 400x400 default scene).  The impact parameter follows from the
    camera momentum convention: cos(alpha) = -p_r / sqrt(f),
    b = r0 sin(alpha) / sqrt(f)  (viz.plots.alpha_from_b inverse); rays
    near the critical b_crit = 3*sqrt(3)*rs orbit longest.
    """
    r0 = q0s[:, 1]
    f = 1.0 - rs / r0
    cos_a = -p0s[:, 1] / jnp.sqrt(f)
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    b = r0 * sin_a / jnp.sqrt(f)
    b_crit = 3.0 * jnp.sqrt(3.0) * rs
    return jnp.abs(b - b_crit)


def _substep_params(delta, rs, r_max, omega, order, compensated=False,
                    staggered=False):
    """SMEM parameter vector [rs, r_max, cap, (d_i, cos_i|omc_i, sin_i
    [, bridge_i])...].  staggered=True appends the trailing-A bridge size
    0.5*(d_i + d_{(i+1) mod n}) to each substep (hamiltonian.bridge_sizes
    — computed identically here and in the XLA twin so the pair stays
    bit-exact)."""
    gammas = yoshida_gammas(order)
    deltas = [g * delta for g in gammas]
    bridges = bridge_sizes(deltas)
    scal = [rs, r_max, jump_cap(delta, delta.dtype)]
    for j, d_i in enumerate(deltas):
        if compensated:
            sh = jnp.sin(omega * d_i)
            trip = [d_i, 2.0 * sh * sh, jnp.sin(2.0 * omega * d_i)]
        else:
            angle = 2.0 * omega * d_i
            trip = [d_i, jnp.cos(angle), jnp.sin(angle)]
        if staggered:
            trip.append(bridges[j])
        scal += trip
    return jnp.stack(scal), len(gammas)


@partial(jax.jit, static_argnames=("steps", "order", "interpret"))
def advance_state_pallas(state16, steps, delta, rs, r_max, omega, order=2,
                         interpret=False):
    """Advance a (16, N) phase-space-doubled state by at most `steps` masked
    steps through the Pallas kernel.

    The resumable-checkpoint twin of integrate_batch_pallas: the carry is
    the FULL doubled state (q1,p1,q2,p2 rows — engine.checkpoint layout,
    which matches the kernel's 16-row tile layout), so a long render can be
    advanced in bounded chunks and saved/restored between chunks without
    losing the mid-trajectory copy-2 state.  Identical masked-step
    semantics to checkpoint._advance (the XLA path).  No cost-sorting: the
    caller owns ray order across chunks.

    Returns (state16, n_steps_applied) with n_steps_applied (N,) int32 —
    the count of steps each ray actually took within this chunk.
    """
    dtype = state16.dtype
    delta = jnp.asarray(delta, dtype)
    rs = jnp.asarray(rs, dtype)
    r_max = jnp.asarray(r_max, dtype)
    params, n_sub = _substep_params(delta, rs, r_max, omega, order)

    n = state16.shape[1]
    num_tiles = -(-n // TILE)
    n_pad = num_tiles * TILE
    # park padding rays outside the domain (born inactive), poles at pi/2
    pad_col = jnp.zeros((16,), dtype).at[1].set(2.0 * r_max)
    pad_col = pad_col.at[9].set(2.0 * r_max)
    pad_col = pad_col.at[2].set(jnp.pi / 2).at[10].set(jnp.pi / 2)
    comp = jnp.concatenate(
        [state16, jnp.broadcast_to(pad_col[:, None], (16, n_pad - n))],
        axis=1)
    tiles = comp.reshape(16, num_tiles, SUBLANES, LANES).transpose(1, 0, 2, 3)

    out, ns = _integrate_tiles(tiles, params, steps, interpret=interpret,
                               n_rows=16, n_sub=n_sub,
                               unroll=1 if interpret else None)
    out16 = out.transpose(1, 0, 2, 3).reshape(16, -1)[:, :n]
    return out16, ns.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("steps", "order", "interpret"))
def advance_state_pallas_eqc(state24, steps, delta, rs, r_max, omega,
                             order=2, interpret=False):
    """Advance a (24, N) STAGGERED compensated equatorial state by at most
    `steps` masked steps through the production (Kahan double-float32)
    Pallas kernel.

    The resumable-checkpoint twin of the compensated fast path: the carry
    is the staggered 24-row state (12 equatorial rows + 12 Kahan deficit
    rows, already opened by checkpoint.start — the kernel runs CORE steps
    only, open_close=False), so a chunked job applies exactly the same
    core-step sequence as the monolithic kernel and the results are
    bit-identical.  The closing half-A happens once, at
    checkpoint finalization.  No cost-sorting: the caller owns ray order
    across chunks.

    Returns (state24, n_steps_applied) with n_steps_applied (N,) int32.
    """
    dtype = state24.dtype
    delta = jnp.asarray(delta, dtype)
    rs = jnp.asarray(rs, dtype)
    r_max = jnp.asarray(r_max, dtype)
    params, n_sub = _substep_params(delta, rs, r_max, omega, order,
                                    compensated=True, staggered=True)

    n = state24.shape[1]
    num_tiles = -(-n // TILE)
    n_pad = num_tiles * TILE
    # park padding rays outside the domain (born inactive)
    pad_col = jnp.zeros((24,), dtype).at[1].set(2.0 * r_max)
    pad_col = pad_col.at[7].set(2.0 * r_max)
    comp = jnp.concatenate(
        [state24, jnp.broadcast_to(pad_col[:, None], (24, n_pad - n))],
        axis=1)
    tiles = comp.reshape(24, num_tiles, SUBLANES, LANES).transpose(1, 0, 2, 3)

    out, ns = _integrate_tiles(tiles, params, steps, interpret=interpret,
                               n_rows=24, n_sub=n_sub,
                               unroll=1 if interpret else None,
                               staggered=True, open_close=False)
    out24 = out.transpose(1, 0, 2, 3).reshape(24, -1)[:, :n]
    return out24, ns.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("steps", "interpret", "sort_rays",
                                   "equatorial", "order", "compensated",
                                   "unroll"))
def integrate_batch_pallas(q0s, p0s, steps, delta, rs, r_max, omega,
                           interpret=False, sort_rays=True,
                           equatorial=False, order=2, compensated=False,
                           unroll=None):
    """Drop-in replacement for engine.integrate.integrate_batch on TPU.

    Returns (final_q, final_p, status, n_steps), identical semantics to the
    XLA backend (masked stepping == per-ray break) but with per-tile early
    exit for real wall-clock savings on mixed scenes.  delta/rs/r_max/omega
    may be traced values (shipped to the kernel through SMEM), so one
    compilation serves every scene with the same image size and step budget.
    order in {2,4,6,8} selects the Yoshida-composed step; the static substep
    fractions ride in SMEM as (delta_i, cos_i, sin_i) triples.

    compensated=True (equatorial only) runs the Kahan double-float32 kernel
    (hamiltonian compensated section): float32 state with per-component
    deficit rows, pinning escape directions to ~1e-7 of the float64 oracle
    at the 200k-step headline budget instead of the ~1e-4 tail of the plain
    float32 kernel.  The SMEM triples carry one_minus_cos in the cos slot.

    unroll=None uses the chip-tuned UNROLL.  The result is unroll-INVARIANT
    (identical masked-step sequence per ray; only the early-exit check
    cadence changes — pinned by tests/test_pallas_kernel.py
    test_unroll_invariance),
    but Mosaic compile time scales with the inlined body, so short-lived
    probe programs (engine.validate) pass a small explicit unroll.
    """
    dtype = q0s.dtype
    delta = jnp.asarray(delta, dtype)
    rs = jnp.asarray(rs, dtype)
    r_max = jnp.asarray(r_max, dtype)
    omega = jnp.asarray(omega, dtype)
    # the equatorial layouts run the staggered (half-A-fused) loop; the
    # 16-row generic layout stays plain so it remains the bit-exact twin of
    # the XLA integrate_batch / checkpoint advance paths
    staggered = bool(equatorial)
    params, n_sub = _substep_params(delta, rs, r_max, omega, order,
                                    compensated, staggered=staggered)
    q0s_orig, p0s_orig = q0s, p0s
    if sort_rays:
        sort_idx = jnp.argsort(_cost_sort_key(q0s, p0s, rs))
        q0s = q0s[sort_idx]
        p0s = p0s[sort_idx]
    if compensated and not equatorial:
        raise ValueError("compensated=True requires equatorial=True")
    n_rows = 24 if compensated else (12 if equatorial else 16)
    state, n = _pack_tiles(q0s, p0s, r_max, equatorial=equatorial,
                           compensated=compensated)
    # explicit unroll wins even in interpret mode (the unroll-invariance
    # tests need it); interpret's default stays 1 for trace size
    if unroll is None and interpret:
        unroll = 1
    out_state, ns = _integrate_tiles(state, params, steps,
                                     interpret=interpret,
                                     n_rows=n_rows,
                                     n_sub=n_sub,
                                     unroll=unroll,
                                     staggered=staggered)
    final_q, final_p, n_steps = _unpack_tiles(out_state, ns, n, q0s, p0s)
    if sort_rays:
        inverse = jnp.argsort(sort_idx)
        final_q = final_q[inverse]
        final_p = final_p[inverse]
        n_steps = n_steps[inverse]
    q1r = final_q[:, 1]
    status = jnp.where(q1r <= 1.1 * rs, STATUS_CAPTURED,
                       jnp.where(q1r >= r_max, STATUS_ESCAPED, STATUS_ALIVE))
    # exact-predicate classification rescue (fake escapes AND fake
    # near-critical captures) — the same deterministic post-pass as the
    # XLA backend, from the ORIGINAL-order initial phase points, so
    # backend parity is preserved
    from .integrate import schw_escape_rescue, schw_true_escape_pred
    final_q, status = schw_escape_rescue(final_q, final_p, status,
                                         schw_true_escape_pred(q0s_orig,
                                                               p0s_orig,
                                                               rs),
                                         rs, r_max)
    return final_q, final_p, status, n_steps
