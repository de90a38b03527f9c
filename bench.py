"""Headline benchmark: 400x400 shadow + photon-ring render, end-to-end.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the driver's north-star target of 1 s on one TPU v5e chip
(BASELINE.md — the reference publishes no numbers of its own).
vs_baseline > 1 means faster than the 1 s target.

Method notes:
  * warm-up call first, then best-of-3 timed calls
  * the observer distance is jittered per call (1e-6) to defeat the axon
    tunnel's result cache for identical executions
  * timing includes host->device scalar upload, camera, integration
    (Pallas kernel), classification, compositing and the device->host
    image fetch — i.e. a full frame a user would see.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from grtrace import IntegratorConfig, PatchConfig, SceneConfig, render

    size = 400
    steps = 200_000  # reference default budget (config.py:9)
    scene = SceneConfig(
        size=size, fov_deg=80.0, background=None, bh_mass=1.0,
        boundary_radius=31.0, observer_distance=30.0,
        integrator=IntegratorConfig(steps=steps, delta=0.01, omega=1.0,
                                    backend="auto"),
        patch=PatchConfig(), n_samples=0)

    rng = np.random.default_rng(0)
    tex = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)

    # warm-up (compile)
    t0 = time.time()
    res = render(scene, bg_array=tex)
    warm = time.time() - t0

    times = []
    total_steps = None
    for i in range(3):
        scene.observer_distance = 30.0 + 1e-6 * (i + 1)
        t0 = time.time()
        res = render(scene, bg_array=tex)
        times.append(time.time() - t0)
        total_steps = int(res.n_steps.astype(np.int64).sum())
    t = min(times)

    rays = size * size
    info = {
        "warmup_s": round(warm, 2),
        "rays_per_s": round(rays / t),
        "geodesic_steps_per_s": round(total_steps / t),
        "counts": res.counts,
        "backend": jax.default_backend(),
    }
    print(json.dumps(info), file=sys.stderr)

    print(json.dumps({
        "metric": "render_400x400_wall_s",
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(1.0 / t, 2),
    }))


if __name__ == "__main__":
    main()
