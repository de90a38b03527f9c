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
