"""Checkpoint / resume for long integrations and multi-frame jobs.

The reference has no resume story — all state is dumped as artifacts at the
end (SURVEY.md section 5, checkpoint row).  Here the integrator state is a
first-class value: `integrate_chunked` advances the phase-space-doubled
state by bounded chunks, returning an `IntegrationState` that can be saved
(single-file np.savez for '.npz' paths, an orbax checkpoint directory
otherwise) and fed back in — resume is literally re-entering the while loop
with the loaded carry.  Both backends are resumable: `advance` routes
through the XLA masked while_loop or the Pallas kernel
(integrate_pallas.advance_state_pallas) with identical masked-step
semantics, so exactly the long renders that need resume — 200k-step Pallas
jobs — can use it.  Multi-frame orbit jobs resume at frame granularity via
their on-disk frame artifacts (grtrace.cli.orbit).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.hamiltonian import N_STATE, pack_state, substep_schedule
from .integrate import (STATUS_ALIVE, STATUS_CAPTURED, STATUS_ESCAPED,
                        _active_mask, _masked_step, jump_cap)


def _abs(path) -> str:
    import os
    return os.path.abspath(str(path))


def _orbax_checkpointer():
    """Lazy orbax PyTreeCheckpointer (imported only for directory-format
    checkpoints, so the npz path has zero extra dependencies)."""
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


@dataclasses.dataclass
class IntegrationState:
    """Resumable integrator carry.

    state: (16, N) phase-space components (q1,p1,q2,p2 x 4)
    n_steps: (N,) steps applied so far
    steps_total / steps_done: budget bookkeeping
    params: (delta, rs, r_max, omega, order)
    """
    state: np.ndarray
    n_steps: np.ndarray
    steps_total: int
    steps_done: int
    delta: float
    rs: float
    r_max: float
    omega: float
    order: int = 2

    @property
    def final_q(self):
        return np.asarray(self.state[0:4]).T

    @property
    def final_p(self):
        return np.asarray(self.state[4:8]).T

    @property
    def status(self):
        r = np.asarray(self.state[1])
        return np.where(r <= 1.1 * self.rs, STATUS_CAPTURED,
                        np.where(r >= self.r_max, STATUS_ESCAPED,
                                 STATUS_ALIVE))

    @property
    def done(self) -> bool:
        return (self.steps_done >= self.steps_total
                or not bool((self.status == STATUS_ALIVE).any()))

    def _tree(self) -> dict:
        return dict(state=np.asarray(self.state),
                    n_steps=np.asarray(self.n_steps),
                    meta=np.array([self.steps_total, self.steps_done]),
                    params=np.array([self.delta, self.rs, self.r_max,
                                     self.omega, float(self.order)]))

    def save(self, path: str) -> None:
        """Persist the carry.  A '.npz' path saves a single compressed file;
        any other path saves an orbax checkpoint directory (the multi-frame
        job format the TPU plan names, SURVEY section 5 — async-friendly,
        per-array files, safe atomic finalization)."""
        if str(path).endswith(".npz"):
            np.savez_compressed(path, **self._tree())
        else:
            _orbax_checkpointer().save(_abs(path), self._tree(), force=True)

    @staticmethod
    def load(path: str) -> "IntegrationState":
        if str(path).endswith(".npz"):
            z = np.load(path)
        else:
            z = _orbax_checkpointer().restore(_abs(path))
        meta = z["meta"]
        p = z["params"]
        return IntegrationState(
            state=z["state"], n_steps=z["n_steps"],
            steps_total=int(meta[0]), steps_done=int(meta[1]),
            delta=float(p[0]), rs=float(p[1]), r_max=float(p[2]),
            omega=float(p[3]),
            order=int(p[4]) if p.shape[0] > 4 else 2)


@partial(jax.jit, static_argnames=("max_steps", "order"))
def _advance(state16, n_steps, max_steps, delta, rs, r_max, omega, order=2):
    """Advance a (16, N) state by at most max_steps masked steps."""
    dtype = state16.dtype
    delta = jnp.asarray(delta, dtype)
    rs = jnp.asarray(rs, dtype)
    r_max = jnp.asarray(r_max, dtype)
    subs = substep_schedule(delta, jnp.asarray(omega, dtype), order)
    cap = jump_cap(delta, dtype)

    comps = tuple(state16[i] for i in range(N_STATE))

    def cond(carry):
        comps, _, k = carry
        return (k < max_steps) & jnp.any(_active_mask(comps[1], rs, r_max))

    def body(carry):
        comps, ns, k = carry
        active = _active_mask(comps[1], rs, r_max)
        comps = _masked_step(comps, active, subs, rs, cap)
        return comps, ns + active.astype(jnp.int32), k + 1

    comps, n_steps, _ = jax.lax.while_loop(cond, body,
                                           (comps, n_steps, jnp.int32(0)))
    return jnp.stack(comps), n_steps


def start(q0s, p0s, steps, delta, rs, r_max, omega,
          order=2) -> IntegrationState:
    """Fresh resumable integration state from (N, 4) initial conditions."""
    comps = pack_state(jnp.asarray(q0s), jnp.asarray(p0s))
    return IntegrationState(
        state=np.asarray(jnp.stack(comps)),
        n_steps=np.zeros(q0s.shape[0], dtype=np.int32),
        steps_total=int(steps), steps_done=0,
        delta=float(delta), rs=float(rs), r_max=float(r_max),
        omega=float(omega), order=int(order))


def advance(st: IntegrationState, chunk_steps: int, backend: str = "xla",
            interpret: bool = False) -> IntegrationState:
    """Advance by at most chunk_steps (bounded wall-time per call).

    backend 'xla' runs the masked while_loop; 'pallas' the TPU kernel
    (integrate_pallas.advance_state_pallas) — identical semantics, so a
    job may even switch backends between chunks.  'auto' resolves by
    platform.  interpret only applies to the Pallas path (CPU tests).
    """
    from .integrate import resolve_backend
    budget = min(chunk_steps, st.steps_total - st.steps_done)
    if budget <= 0:
        return st
    if resolve_backend(backend) == "pallas":
        from .integrate_pallas import advance_state_pallas
        state, applied = advance_state_pallas(
            jnp.asarray(st.state), budget, st.delta, st.rs, st.r_max,
            st.omega, order=st.order, interpret=interpret)
        n_steps = jnp.asarray(st.n_steps) + applied
    else:
        state, n_steps = _advance(
            jnp.asarray(st.state), jnp.asarray(st.n_steps), budget,
            st.delta, st.rs, st.r_max, st.omega, order=st.order)
    return dataclasses.replace(
        st, state=np.asarray(state), n_steps=np.asarray(n_steps),
        steps_done=st.steps_done + budget)


def integrate_chunked(q0s, p0s, steps, delta, rs, r_max, omega,
                      chunk_steps=10_000,
                      checkpoint_path: Optional[str] = None,
                      resume: bool = False, order: int = 2,
                      backend: str = "xla", interpret: bool = False):
    """Chunked integration with optional on-disk checkpointing.

    Equivalent to engine.integrate.integrate_batch (identical masked-step
    semantics, so the result is the same trajectory), but interruptible:
    with checkpoint_path set, the state is saved after every chunk and a
    killed job resumes from the last chunk with resume=True.  backend
    'pallas' runs the chunks through the TPU kernel (the production fast
    path is therefore resumable too).
    """
    import os
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        st = IntegrationState.load(checkpoint_path)
    else:
        st = start(q0s, p0s, steps, delta, rs, r_max, omega, order=order)
    while not st.done:
        st = advance(st, chunk_steps, backend=backend, interpret=interpret)
        if checkpoint_path:
            st.save(checkpoint_path)
    return st
