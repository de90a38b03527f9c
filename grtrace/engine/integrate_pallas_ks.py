"""Pallas TPU kernel for batched Kerr geodesics (Kerr-Schild chart).

The Kerr twin of engine.integrate_pallas: the generic autodiff engine
(engine.integrate_generic) is the correctness-first path for any metric;
this kernel is the speed-of-light specialization for the one metric family
beyond Schwarzschild the framework ships — Kerr in horizon-regular
Cartesian Kerr-Schild coordinates (physics.kerr_schild, hand-derived
flows pinned to the autodiff engine by tests).

Same design as the Schwarzschild kernel (see integrate_pallas's module
docstring): rays on the VPU lane axis as (16|32, 8, 128) component tiles,
a per-tile `lax.while_loop` with early exit once every ray in the tile has
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

The loop body, guard and parking come verbatim from engine.integrate_ks
(make_ks_step) — ONE source of truth shared with the XLA twin
integrate_batch_ksc, so kernel-vs-XLA parity is Mosaic-vs-XLA compilation
of identical code.

compensated=True runs the Kahan double-float32 layout (32 rows: state +
deficit rows, physics.kerr_schild compensated section), pinning f32
escape/shadow accuracy near the f64 oracle instead of the ~3 px
prograde-shadow-edge drift of the plain f32 flows.  It is the production
f32 path (engine.render_generic auto-selects it).

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

from .integrate_ks import (apply_bardeen_rescue, ks_scene_scalars,
                           ks_substeps, make_ks_step)
from .integrate_pallas import LANES, SUBLANES, TILE

N_ROWS = 16
N_ROWS_C = 32  # Kahan-compensated layout: 16 state + 16 deficit rows
N_SCAL = 6  # mass, a, charge, r_cap, r_max, plunge_zone (+ 4 per substep:
#             d_j, cw_j, sw_j, bridge_j — staggered schedule)
# The KS step body is ~4x heavier than the equatorial Schwarzschild one, so
# the any(active)/loop overhead amortizes sooner.  Re-swept on chip after
# the compensated 32-row layout became the f32 production path (interleaved
# A/B at 1024^2/30k-step spin-0.9, integration only): 8 -> 0.782 s,
# 16 -> 0.763 s, 32 -> 0.748-0.758 s, 48 -> 0.816 s, 64 -> 0.758 s.
# 32 ties 64 at the optimum with half the Mosaic body; the plain kernel
# tracks the same curve (0.650 s at 32).
UNROLL = 32


def _make_kernel_ks(steps, n_sub, compensated=False, unroll=None,
                    disk=False, subrings=0):
    if unroll is None:
        unroll = max(1, UNROLL // n_sub)
    n_rows = N_ROWS_C if compensated else N_ROWS

    def kernel(params_ref, state_ref, out_state_ref, ns_ref, *disk_refs):
        mass = params_ref[0]
        a = params_ref[1]
        charge = params_ref[2]
        r_cap = params_ref[3]
        r_max = params_ref[4]
        plunge_zone = params_ref[5]
        subs = tuple(tuple(params_ref[N_SCAL + 4 * j + k] for k in range(4))
                     for j in range(n_sub))
        d0 = subs[0][0]
        # disk annulus scalars ride AFTER the substeps so the plain
        # kernel's SMEM indices are untouched
        disk_rr = ((params_ref[N_SCAL + 4 * n_sub],
                    params_ref[N_SCAL + 4 * n_sub + 1]) if disk else None)

        active, masked_step, open_fn, close_fn = make_ks_step(
            subs, mass, a, charge, r_cap, r_max, plunge_zone,
            compensated=compensated, disk=disk_rr,
            subrings=subrings or None)

        comps = tuple(state_ref[0, i] for i in range(n_rows))
        ns0 = jnp.zeros((SUBLANES, LANES), dtype=jnp.int32)

        # staggered loop (see physics.kerr_schild staggered section): one
        # masked opening half-A, cores of B M B A(bridge), one closing
        # half-A — one A (and its _kick_drift geometry evaluation) per
        # substep instead of two.  The half-A flows write only (p1, q2),
        # so in disk mode no equatorial crossing can hide in the
        # open/close boundary flows — q1's z row never moves there.
        act0 = active(comps)
        if steps > 0:  # steps == 0 must be an exact no-op
            opened = open_fn(comps, d0)
            comps = tuple(jnp.where(act0, o, c)
                          for o, c in zip(opened, comps))

        main_iters = steps // unroll

        if subrings:
            # transparent-disk crossing slots: count (int32 — legal in an
            # scf.while carry, unlike vector<i1>) + n_orders (q, p) slot
            # 4-tuples; early exit is the PLAIN active test (rays retire
            # by escape/capture only)
            zero = jnp.zeros((SUBLANES, LANES), dtype=comps[0].dtype)
            cnt0 = jnp.zeros((SUBLANES, LANES), dtype=jnp.int32)
            slots0 = tuple((zero,) * 4 for _ in range(subrings))
            carry0 = (jnp.int32(0), comps, ns0, cnt0, slots0, slots0)

            def cond(carry):
                k, comps, _, _, _, _ = carry
                return (k < main_iters) & jnp.any(active(comps))

            def body(carry):
                k, comps, ns, cnt, hq, hp = carry
                for _ in range(unroll):
                    comps, ns, cnt, hq, hp = masked_step(comps, ns, cnt,
                                                         hq, hp)
                return k + 1, comps, ns, cnt, hq, hp

            _, comps, ns, cnt, hq, hp = jax.lax.while_loop(cond, body,
                                                           carry0)
            for _ in range(steps % unroll):
                comps, ns, cnt, hq, hp = masked_step(comps, ns, cnt, hq, hp)
        elif disk:
            # the hit mask crosses the while boundary as f32 — Mosaic
            # cannot legalize a vector<i1> in an scf.while carry — and is
            # re-boolified inside the body (one compare per UNROLL group)
            zero = jnp.zeros((SUBLANES, LANES), dtype=comps[0].dtype)
            carry0 = (jnp.int32(0), comps, ns0, zero,
                      (zero,) * 4, (zero,) * 4)

            def cond(carry):
                k, comps, _, hitf, _, _ = carry
                return (k < main_iters) & jnp.any(active(comps)
                                                 & (hitf < 0.5))

            def body(carry):
                k, comps, ns, hitf, hq, hp = carry
                hit = hitf > 0.5
                for _ in range(unroll):
                    comps, ns, hit, hq, hp = masked_step(comps, ns, hit,
                                                         hq, hp)
                return (k + 1, comps, ns, hit.astype(hitf.dtype), hq, hp)

            _, comps, ns, hitf, hq, hp = jax.lax.while_loop(cond, body,
                                                            carry0)
            hit = hitf > 0.5
            for _ in range(steps % unroll):
                comps, ns, hit, hq, hp = masked_step(comps, ns, hit, hq, hp)
        else:
            def cond(carry):
                k, comps, _ = carry
                return (k < main_iters) & jnp.any(active(comps))

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
        # (Disk-hit rays: harmless too — their final (q1, p2) are unused,
        # the recorded crossing is what shades them.)
        if steps > 0:
            closed = close_fn(comps, d0)
            comps = tuple(jnp.where(act0, cl, c)
                          for cl, c in zip(closed, comps))

        for i in range(n_rows):
            out_state_ref[0, i] = comps[i]
        ns_ref[0, 0] = ns
        if subrings:
            sub_ref, = disk_refs
            sub_ref[0, 0] = cnt.astype(comps[0].dtype)
            for s in range(subrings):
                for i in range(4):
                    sub_ref[0, 1 + 8 * s + i] = hq[s][i]
                    sub_ref[0, 5 + 8 * s + i] = hp[s][i]
        elif disk:
            disk_ref, = disk_refs
            disk_ref[0, 0] = hit.astype(comps[0].dtype)
            for i in range(4):
                disk_ref[0, 1 + i] = hq[i]
                disk_ref[0, 5 + i] = hp[i]

    return kernel


@partial(jax.jit, static_argnames=("steps", "interpret", "n_sub",
                                   "compensated", "disk", "subrings",
                                   "unroll"))
def _integrate_tiles_ks(state, params, steps, interpret=False, n_sub=1,
                        compensated=False, disk=False, subrings=0,
                        unroll=None):
    num_tiles = state.shape[0]
    n_rows = state.shape[1]
    dtype = state.dtype
    # interpret mode gets unroll=1: bit-identical results (masked no-op
    # steps and the exact-budget remainder are unchanged) but a 16x
    # smaller trace, which dominates interpret-mode wall time on CPU.
    # Explicit unroll overrides serve the same purpose on HARDWARE: the
    # step sequence (and so the result) is unroll-invariant, but the
    # Mosaic compile cost scales with the statically-inlined body — the
    # on-chip validation probes trade a few masked-step groups for a
    # severalfold cheaper compile (engine.validate PROBE_UNROLL).
    if unroll is None and interpret:
        unroll = 1  # default; explicit unroll wins (unroll-invariance tests)
    kernel = _make_kernel_ks(steps, n_sub, compensated=compensated,
                             unroll=unroll, disk=disk,
                             subrings=subrings)
    out_specs = [pl.BlockSpec((1, n_rows, SUBLANES, LANES),
                              lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 1, SUBLANES, LANES),
                              lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct(state.shape, dtype),
                 jax.ShapeDtypeStruct((num_tiles, 1, SUBLANES, LANES),
                                      jnp.int32)]
    if subrings:  # count row + per-order 4 q rows + 4 p rows
        rows = 1 + 8 * subrings
        out_specs.append(pl.BlockSpec((1, rows, SUBLANES, LANES),
                                      lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(
            (num_tiles, rows, SUBLANES, LANES), dtype))
    elif disk:  # hit flag row + 4 hit_q rows + 4 hit_p rows
        out_specs.append(pl.BlockSpec((1, 9, SUBLANES, LANES),
                                      lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(
            (num_tiles, 9, SUBLANES, LANES), dtype))
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, n_rows, SUBLANES, LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(params, state)
    return out  # (out_state, ns[, disk_rows])


def _pack_tiles_ks(q0s, p0s, r_max, compensated=False):
    """(N, 4) q/p -> (T, n_rows, 8, 128) tiles; padding rays parked outside
    the boundary sphere (x = 2 r_max) so they are born inactive.
    compensated=True appends 16 zero Kahan-deficit rows."""
    n = q0s.shape[0]
    num_tiles = -(-n // TILE)
    n_pad = num_tiles * TILE

    comp = jnp.concatenate([q0s.T, p0s.T, q0s.T, p0s.T], axis=0)
    if compensated:
        comp = jnp.concatenate([comp, jnp.zeros_like(comp)], axis=0)
    n_rows = comp.shape[0]
    pad_col = jnp.zeros((n_rows,), comp.dtype).at[1].set(2.0 * r_max)
    pad_col = pad_col.at[9].set(2.0 * r_max)
    pad = jnp.broadcast_to(pad_col[:, None], (n_rows, n_pad - n))
    comp = jnp.concatenate([comp, pad], axis=1)
    state = comp.reshape(n_rows, num_tiles, SUBLANES,
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
                                   "order", "compensated", "unroll"))
def integrate_batch_pallas_ks(q0s, p0s, steps, delta, params, r_max, omega,
                              interpret=False, sort_rays=True, order=2,
                              compensated=False, unroll=None):
    """Drop-in replacement for integrate_batch_generic(metric='KerrSchild')
    on TPU: same (final_q, final_p, status, n_steps) contract, same capture
    shell, parking coordinates and status codes, plus per-tile early exit
    and cost-sorted tiling for wall-clock.

    params = (M, a) or (M, a, Q) (traced; the Kerr-Newman charge rides a
    third slot); delta/r_max/omega traced; steps/order/compensated static.
    compensated=True runs the Kahan double-float32 kernel (XLA twin:
    integrate_ks.integrate_batch_ksc).
    """
    dtype = q0s.dtype
    delta = jnp.asarray(delta, dtype)
    r_max = jnp.asarray(r_max, dtype)
    omega = jnp.asarray(omega, dtype)
    mass, a, charge, r_cap, plunge_zone = ks_scene_scalars(params, dtype)
    subs = ks_substeps(delta, omega, order, compensated=compensated)
    scal = [mass, a, charge, r_cap, r_max, plunge_zone]
    for sub in subs:
        scal += list(sub)
    smem = jnp.stack(scal)

    q0s_orig, p0s_orig = q0s, p0s
    if sort_rays:
        sort_idx = jnp.argsort(_cost_sort_key_ks(q0s, p0s, mass))
        q0s = q0s[sort_idx]
        p0s = p0s[sort_idx]

    state, n = _pack_tiles_ks(q0s, p0s, r_max, compensated=compensated)
    out_state, ns = _integrate_tiles_ks(state, smem, steps,
                                        interpret=interpret,
                                        n_sub=len(subs),
                                        compensated=compensated,
                                        unroll=unroll)

    n_rows = out_state.shape[1]
    comp = out_state.transpose(1, 0, 2, 3).reshape(n_rows, -1)[:, :n]
    if compensated:  # fold the Kahan deficits (true = s - c)
        comp = comp[:16] - comp[16:]
    final_q = comp[0:4].T
    final_p = comp[4:8].T
    q2_spatial = comp[9:12].T
    ns_signed = ns.reshape(-1)[:n]

    if sort_rays:
        inverse = jnp.argsort(sort_idx)
        final_q = final_q[inverse]
        final_p = final_p[inverse]
        q2_spatial = q2_spatial[inverse]
        ns_signed = ns_signed[inverse]
    # analytic rescue for guard-parked rays (park flag sign-encoded in
    # ns); the predicate reads the ORIGINAL-order initial conditions
    return apply_bardeen_rescue(final_q, final_p, ns_signed, q2_spatial,
                                q0s_orig, p0s_orig, mass, a, charge,
                                r_cap, r_max)


@partial(jax.jit, static_argnames=("steps", "interpret", "sort_rays",
                                   "order", "compensated"))
def integrate_batch_pallas_disk(q0s, p0s, steps, delta, params, r_max,
                                omega, r_in, r_out, interpret=False,
                                sort_rays=True, order=2, compensated=False):
    """Disk-crossing twin of integrate_batch_pallas_ks: the production
    kernel for engine.disk renders.  Same contract as
    disk.integrate_batch_disk — (final_q, final_p, status, n_steps,
    hit_q, hit_p) with STATUS_DISK rays frozen at their first equatorial
    crossing inside [r_in, r_out] — at the tuned kernel's speed (~10x
    the generic autodiff while_loop the XLA disk path runs)."""
    from .disk import STATUS_DISK

    dtype = q0s.dtype
    delta = jnp.asarray(delta, dtype)
    r_max = jnp.asarray(r_max, dtype)
    omega = jnp.asarray(omega, dtype)
    mass, a, charge, r_cap, plunge_zone = ks_scene_scalars(params, dtype)
    subs = ks_substeps(delta, omega, order, compensated=compensated)
    scal = [mass, a, charge, r_cap, r_max, plunge_zone]
    for sub in subs:
        scal += list(sub)
    scal += [jnp.asarray(r_in, dtype), jnp.asarray(r_out, dtype)]
    smem = jnp.stack(scal)

    q0s_orig, p0s_orig = q0s, p0s
    if sort_rays:
        sort_idx = jnp.argsort(_cost_sort_key_ks(q0s, p0s, mass))
        q0s = q0s[sort_idx]
        p0s = p0s[sort_idx]

    state, n = _pack_tiles_ks(q0s, p0s, r_max, compensated=compensated)
    out_state, ns, disk_rows = _integrate_tiles_ks(
        state, smem, steps, interpret=interpret, n_sub=len(subs),
        compensated=compensated, disk=True)

    n_rows = out_state.shape[1]
    comp = out_state.transpose(1, 0, 2, 3).reshape(n_rows, -1)[:, :n]
    if compensated:  # fold the Kahan deficits (true = s - c)
        comp = comp[:16] - comp[16:]
    final_q = comp[0:4].T
    final_p = comp[4:8].T
    q2_spatial = comp[9:12].T
    ns_signed = ns.reshape(-1)[:n]
    dcomp = disk_rows.transpose(1, 0, 2, 3).reshape(9, -1)[:, :n]
    hit = dcomp[0] > 0.5
    hit_q = dcomp[1:5].T
    hit_p = dcomp[5:9].T

    if sort_rays:
        inverse = jnp.argsort(sort_idx)
        final_q = final_q[inverse]
        final_p = final_p[inverse]
        q2_spatial = q2_spatial[inverse]
        ns_signed = ns_signed[inverse]
        hit = hit[inverse]
        hit_q = hit_q[inverse]
        hit_p = hit_p[inverse]

    final_q, final_p, status, n_steps = apply_bardeen_rescue(
        final_q, final_p, ns_signed, q2_spatial, q0s_orig, p0s_orig,
        mass, a, charge, r_cap, r_max)
    status = jnp.where(hit, STATUS_DISK, status)
    return final_q, final_p, status, n_steps, hit_q, hit_p


@partial(jax.jit, static_argnames=("steps", "n_orders", "interpret",
                                   "sort_rays", "order", "compensated",
                                   "unroll"))
def integrate_batch_pallas_subrings(q0s, p0s, steps, delta, params, r_max,
                                    omega, n_orders=3, interpret=False,
                                    sort_rays=True, order=2,
                                    compensated=False, unroll=None):
    """Subring (transparent-disk) twin of integrate_batch_pallas_ks: the
    production kernel for engine.subring renders.  Same contract as
    subring.integrate_batch_subrings — (final_q, final_p, status,
    n_steps, hits_q (n_orders, N, 4), hits_p, count) with every plane
    crossing counted and the first n_orders recorded — at the tuned
    kernel's speed (the XLA subring path is the generic autodiff
    while_loop; see DESIGN.md #19)."""
    dtype = q0s.dtype
    delta = jnp.asarray(delta, dtype)
    r_max = jnp.asarray(r_max, dtype)
    omega = jnp.asarray(omega, dtype)
    mass, a, charge, r_cap, plunge_zone = ks_scene_scalars(params, dtype)
    subs = ks_substeps(delta, omega, order, compensated=compensated)
    scal = [mass, a, charge, r_cap, r_max, plunge_zone]
    for sub in subs:
        scal += list(sub)
    smem = jnp.stack(scal)

    q0s_orig, p0s_orig = q0s, p0s
    if sort_rays:
        sort_idx = jnp.argsort(_cost_sort_key_ks(q0s, p0s, mass))
        q0s = q0s[sort_idx]
        p0s = p0s[sort_idx]

    state, n = _pack_tiles_ks(q0s, p0s, r_max, compensated=compensated)
    out_state, ns, sub_rows = _integrate_tiles_ks(
        state, smem, steps, interpret=interpret, n_sub=len(subs),
        compensated=compensated, subrings=n_orders, unroll=unroll)

    n_rows = out_state.shape[1]
    comp = out_state.transpose(1, 0, 2, 3).reshape(n_rows, -1)[:, :n]
    if compensated:  # fold the Kahan deficits (true = s - c)
        comp = comp[:16] - comp[16:]
    final_q = comp[0:4].T
    final_p = comp[4:8].T
    q2_spatial = comp[9:12].T
    ns_signed = ns.reshape(-1)[:n]
    scomp = sub_rows.transpose(1, 0, 2, 3).reshape(1 + 8 * n_orders,
                                                   -1)[:, :n]
    count = scomp[0].astype(jnp.int32)
    hits_q = jnp.stack([scomp[1 + 8 * s:5 + 8 * s].T
                        for s in range(n_orders)])
    hits_p = jnp.stack([scomp[5 + 8 * s:9 + 8 * s].T
                        for s in range(n_orders)])

    if sort_rays:
        inverse = jnp.argsort(sort_idx)
        final_q = final_q[inverse]
        final_p = final_p[inverse]
        q2_spatial = q2_spatial[inverse]
        ns_signed = ns_signed[inverse]
        count = count[inverse]
        hits_q = hits_q[:, inverse]
        hits_p = hits_p[:, inverse]

    final_q, final_p, status, n_steps = apply_bardeen_rescue(
        final_q, final_p, ns_signed, q2_spatial, q0s_orig, p0s_orig,
        mass, a, charge, r_cap, r_max)
    return final_q, final_p, status, n_steps, hits_q, hits_p, count
