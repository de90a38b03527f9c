"""First-class observability: per-stage timers, throughput counters,
profiler hooks.

The reference's only instrumentation is tqdm progress bars and one ad-hoc
time.time() pair (SURVEY.md section 5, tracing row).  Here every render can
carry a `RenderMetrics` that records stage wall-times and derived
throughput (rays/s, geodesic steps/s), and `trace()` wraps a block in a
jax.profiler trace for TensorBoard-grade inspection on TPU.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class RenderMetrics:
    """Stage timings + throughput for one render."""
    stages: Dict[str, float] = field(default_factory=dict)
    rays: int = 0
    geodesic_steps: int = 0

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0)

    @property
    def total_s(self) -> float:
        return sum(self.stages.values())

    @property
    def rays_per_s(self) -> float:
        t = self.stages.get("device_pipeline", self.total_s)
        return self.rays / t if t > 0 else 0.0

    @property
    def steps_per_s(self) -> float:
        t = self.stages.get("device_pipeline", self.total_s)
        return self.geodesic_steps / t if t > 0 else 0.0

    def summary(self) -> dict:
        return {
            "stages_s": {k: round(v, 4) for k, v in self.stages.items()},
            "total_s": round(self.total_s, 4),
            "rays": self.rays,
            "geodesic_steps": self.geodesic_steps,
            "rays_per_s": round(self.rays_per_s),
            "geodesic_steps_per_s": round(self.steps_per_s),
        }

    def __str__(self) -> str:
        return json.dumps(self.summary())


# ---------------------------------------------------------------------------
# Roofline: give steps/s a denominator
# ---------------------------------------------------------------------------

# Weighted VPU op costs for the flop count: the VPU executes elementwise
# lanes at 1 op/lane/cycle for arithmetic/select/compare; divides, sqrts
# and transcendentals run through multi-pass lowerings.  The weights are
# the standard XLA:TPU cost-model ballpark (div/sqrt ~ 4 passes,
# transcendental ~ 8) — the model's absolute scale is approximate by
# nature; its job is to expose utilization RATIOS and order-of-magnitude
# headroom, which the weights move by < 2x.
_OP_WEIGHTS = {
    "add": 1, "sub": 1, "mul": 1, "neg": 1, "max": 1, "min": 1,
    "select_n": 1, "and": 1, "or": 1, "not": 1, "xor": 1,
    "eq": 1, "ne": 1, "lt": 1, "le": 1, "gt": 1, "ge": 1, "abs": 1,
    "sign": 1, "floor": 1, "ceil": 1, "round": 1, "clamp": 2,
    "is_finite": 1, "integer_pow": 2, "square": 1,
    "div": 4, "rem": 4, "sqrt": 4, "rsqrt": 4, "cbrt": 8,
    "exp": 8, "log": 8, "sin": 8, "cos": 8, "tan": 12, "tanh": 8,
    "atan2": 12, "asin": 12, "acos": 12, "pow": 16, "logistic": 8,
    "erf": 12, "expm1": 8, "log1p": 8,
}

# v5e VPU peak: 8x128 lanes x 4 ALU ports x ~0.94 GHz ~ 3.85e12 f32
# elementwise op/s per core (one TensorCore per v5e chip).  The MXU's
# headline TFLOPs do not apply: this kernel is pure VPU work (no
# contractions), so the VPU number is the correct speed-of-light.
VPU_PEAK_FLOPS = 3.85e12


def _count_jaxpr_flops(jaxpr) -> float:
    """Weighted elementwise op count of a closed jaxpr, PER ELEMENT of
    the vector shape (recurses into sub-jaxprs)."""
    total = 0.0
    for eqn in jaxpr.eqns:
        for sub in getattr(eqn, "params", {}).values():
            if hasattr(sub, "jaxpr"):
                inner = sub.jaxpr if hasattr(sub.jaxpr, "eqns") else sub
                total += _count_jaxpr_flops(inner)
        w = _OP_WEIGHTS.get(eqn.primitive.name)
        if w:
            total += w
    return total


def flops_per_ray_step(order: int = 2, compensated: bool = True) -> float:
    """Weighted VPU flops one ray costs per COMPOSED integration step in
    the production kernel (the staggered equatorial core the Pallas
    kernel unrolls, engine.integrate_pallas._make_kernel), counted from
    the actual jaxpr of the step function — so the number tracks the code
    instead of a hand count going stale."""
    import jax
    import jax.numpy as jnp

    from ..physics.hamiltonian import (bridge_sizes, staggered_eq,
                                       staggered_eqc, substep_schedule)

    core = (staggered_eqc if compensated else staggered_eq)[1]
    n_rows = 24 if compensated else 12
    subs = substep_schedule(jnp.float32(0.01), jnp.float32(1.0), order,
                            omc=compensated)
    bridges = bridge_sizes([s[0] for s in subs])

    def one_step(comps):
        for (d_i, omc_i, sin_i), br_i in zip(subs, bridges):
            comps = core(comps, d_i, jnp.float32(2.0), omc_i, sin_i, br_i)
        return comps

    comps0 = tuple(jnp.zeros((), jnp.float32) for _ in range(n_rows))
    jaxpr = jax.make_jaxpr(one_step)(comps0)
    return _count_jaxpr_flops(jaxpr.jaxpr)


def roofline_report(steps_per_s: float, order: int = 2,
                    compensated: bool = True,
                    wall_s: Optional[float] = None,
                    device_s: Optional[float] = None) -> dict:
    """Utilization denominator for a measured geodesic-steps/s figure.

    Reports the per-step weighted flop cost, the implied sustained VPU
    flops, and utilization against the v5e VPU peak.  When both wall_s
    and device_s are given (device_s = wall minus the measured dispatch/
    tunnel round trip), utilization is reported for both so latency-bound
    small batches are visible as the wall/device gap rather than read as
    kernel inefficiency.
    """
    fps = flops_per_ray_step(order, compensated)
    out = {
        "flops_per_ray_step": round(fps, 1),
        "vpu_peak_flops": VPU_PEAK_FLOPS,
        "sustained_flops": round(steps_per_s * fps),
        "utilization": round(steps_per_s * fps / VPU_PEAK_FLOPS, 4),
    }
    if wall_s is not None and device_s is not None and device_s > 0:
        dev_steps = steps_per_s * wall_s / device_s
        out["device_only_steps_per_s"] = round(dev_steps)
        out["device_only_utilization"] = round(
            dev_steps * fps / VPU_PEAK_FLOPS, 4)
    return out


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None).

    View with TensorBoard or xprof against the produced trace directory.
    """
    if log_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


def nan_guard(name: str, *arrays) -> None:
    """Numeric sanitizer: raise if any array contains NaN/Inf.

    The reference's closest analog is the r >= 100 'numerical error' pixel
    class (raytracing.py:213-215); this catches non-finite state directly.
    Cheap enough to call on final (not per-step) arrays.
    """
    import numpy as np
    for k, a in enumerate(arrays):
        a = np.asarray(a)
        if not np.isfinite(a).all():
            bad = int((~np.isfinite(a)).sum())
            raise FloatingPointError(
                f"{name}: array {k} has {bad} non-finite values")
