"""Headline benchmark: 400x400 shadow + photon-ring render, end-to-end.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the driver's north-star target of 1 s on one TPU v5e chip
(BASELINE.md — the reference publishes no numbers of its own).
vs_baseline > 1 means faster than the 1 s target.

Method notes:
  * warm-up call first, then best-of-5 timed calls
  * the observer distance is jittered per call by (i+1) float32 ulps — the
    smallest perturbation guaranteed to survive the f32 cast — to defeat
    the axon tunnel's result cache for identical executions
  * timing includes host->device scalar upload, camera, integration
    (Pallas kernel), classification, compositing and the device->host
    classification-count fetch that synchronizes the whole pipeline.
    The rendered image itself stays device-resident (RenderResult is
    lazy); pulling the 480 KB image adds ~5 ms of tunnel bandwidth on
    top of the reported number.
  * stderr carries a second JSON line with per-stage timings, an ON-CHIP
    Pallas<->XLA parity block (the Mosaic-compiled kernel and the XLA
    while_loop backend render the same reduced-budget scene and are
    compared on classification counts and escape-direction agreement —
    interpret-mode tests can't see Mosaic numerics; this runs on the real
    chip every round), and an on-chip float32 VALIDATION block
    (engine.validate): shadow boundaries vs closed-form GR (Schwarzschild
    arcsin + Kerr Bardeen through the compensated Kerr-Schild kernel) and
    KS kernel<->XLA-twin parity, so the accuracy claims are reproduced in
    every round's driver artifact.
"""
import json
import sys
import time

import numpy as np


def _ulp_jitter(x: float, n_ulps: int) -> float:
    """x advanced by n float32 ulps (guaranteed to change the f32 value)."""
    v = np.float32(x)
    for _ in range(n_ulps):
        v = np.nextafter(v, np.float32(np.inf))
    return float(v)


def _parity_check(size, steps, delta, omega):
    """On-chip Pallas vs XLA agreement at a reduced step budget.

    Two comparisons:
      * kernel-twin: the compensated Pallas kernel vs its XLA twin
        integrate_batch_compensated (the SAME step function through the
        XLA compiler) on the headline camera rays — any disagreement is a
        Mosaic-vs-XLA compilation difference, the exact blind spot of the
        CPU interpret-mode tests.
      * render-level: full render() with backend='pallas' vs 'xla'
        (different integrators by design: compensated vs plain f32), so
        count drift between the production paths stays visible.
    """
    import jax
    import jax.numpy as jnp
    from grtrace.engine.integrate import (STATUS_ESCAPED,
                                          integrate_batch_compensated)
    from grtrace.engine.integrate_pallas import integrate_batch_pallas
    from grtrace.physics.camera import camera_rays

    f32 = jnp.float32
    obs = jnp.stack([f32(30.0), f32(0.0), f32(0.0)])
    q0, p0, alpha0, heading, beta = camera_rays(
        obs, f32(np.radians(80.0)), size, size, mass_bh=f32(1.0),
        dtype=jnp.float32)
    q0 = q0.reshape(-1, 4)
    p0 = p0.reshape(-1, 4)

    qa, pa, sa, na = integrate_batch_pallas(
        q0, p0, steps, f32(delta), f32(2.0), f32(31.0), f32(omega),
        equatorial=True, compensated=True)
    qb, pb, sb, nb = integrate_batch_compensated(
        q0, p0, steps, f32(delta), f32(2.0), f32(31.0), f32(omega))
    jax.block_until_ready(qb)

    sa = np.asarray(sa)
    sb = np.asarray(sb)
    esc = (sa == STATUS_ESCAPED) & (sb == STATUS_ESCAPED)
    # escape direction = boundary-sphere position angle; rays are folded to
    # the equator so the great-circle distance is the wrapped delta-phi
    dphi = np.abs(np.asarray(qa)[esc, 3] - np.asarray(qb)[esc, 3])
    # wrap FIRST so |dphi| > 2*pi (differing winding counts) still reports
    # the great-circle difference, then fold to [0, pi]
    dphi = dphi % (2 * np.pi)
    dphi = np.minimum(dphi, 2 * np.pi - dphi)
    return {
        "steps": steps,
        "kernel_status_mismatch": int((sa != sb).sum()),
        "kernel_max_escape_angle_delta": float(dphi.max()) if esc.any() else 0.0,
        "kernel_median_escape_angle_delta": (float(np.median(dphi))
                                             if esc.any() else 0.0),
        "kernel_exit_step_mismatch": int(
            (np.asarray(na) != np.asarray(nb)).sum()),
    }


def main():
    import jax
    import jax.numpy as jnp

    import grtrace
    from grtrace import IntegratorConfig, PatchConfig, SceneConfig, render
    from grtrace.engine.metrics import RenderMetrics

    # persistent compilation cache: the warm-up number reflects a cold
    # process but not (after the first ever run on a machine) cold Mosaic
    # compiles — the deeply-unrolled kernels cost minutes to rebuild
    grtrace.enable_compilation_cache()

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

    def tunnel_rtt():
        """Median fetch-synchronized round trip of a trivial compiled
        program: the fixed dispatch latency every wall-clock number pays
        on the tunneled chip (~33 ms measured; a direct-attached TPU
        pays ~0).  Reported so the roofline can separate device
        throughput from latency."""
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.arange(8.0)
        np.asarray(f(x))
        samples = []
        for _ in range(11):
            t0 = time.time()
            np.asarray(f(x))
            samples.append(time.time() - t0)
        return float(np.median(samples))

    # warm-up (compile).  The first compile+execute of a PROCESS pays a
    # large tunnel-state-dependent remote-service warmup (measured 0-400 s
    # for the SAME program depending on how recently the service ran;
    # warm-service compiles are 3-25 s/program).  Absorb it with a trivial
    # program first so the split is visible in warmup_detail — warmup_s
    # still reports the honest total.
    t0 = time.time()
    np.asarray(jnp.arange(8.0) + 1.0)
    service_s = time.time() - t0
    t0 = time.time()
    res = render(scene, bg_array=tex)
    render_compile_s = time.time() - t0
    warm = service_s + render_compile_s

    times = []
    total_steps = None
    # best-of-5: the tunnel to the chip adds a fixed ~45 ms round trip with
    # occasional multi-10ms latency spikes; 5 samples make the min robust
    for i in range(5):
        scene.observer_distance = _ulp_jitter(30.0, i + 1)
        t0 = time.time()
        res = render(scene, bg_array=tex)
        times.append(time.time() - t0)
        total_steps = int(res.n_steps.astype(np.int64).sum())
    t = min(times)

    # stage breakdown from a separate instrumented call (requesting metrics
    # adds an n_steps host fetch, so it must stay out of the timed runs)
    metrics = RenderMetrics()
    scene.observer_distance = _ulp_jitter(30.0, 6)  # 1..5 used by the loop
    render(scene, bg_array=tex, metrics=metrics)

    # render-level parity at a reduced budget: same scene, both backends.
    # 19,968 = 312 * 64: an exact multiple of the kernel's UNROLL group,
    # so no statically-inlined remainder bloats the Mosaic compile (see
    # engine/validate.py module docstring)
    parity_steps = 19_968
    pscene = SceneConfig(
        size=size, fov_deg=80.0, background=None, bh_mass=1.0,
        boundary_radius=31.0, observer_distance=30.0,
        integrator=IntegratorConfig(steps=parity_steps, delta=0.01,
                                    omega=1.0, backend="pallas"),
        patch=PatchConfig(), n_samples=0)
    counts_pallas = render(pscene, bg_array=tex).counts
    pscene.integrator.backend = "xla"
    counts_xla = render(pscene, bg_array=tex).counts
    parity = _parity_check(size, parity_steps, 0.01, 1.0)
    parity["render_counts_pallas"] = counts_pallas
    parity["render_counts_xla"] = counts_xla
    parity["render_counts_equal"] = counts_pallas == counts_xla

    # on-chip float32 validation vs closed-form GR (engine.validate):
    # Schwarzschild arcsin boundary, Kerr a=0.9 Bardeen boundary through
    # the compensated KS kernel, and KS kernel<->XLA-twin parity — the
    # results the README quotes, reproduced in every driver artifact
    # the four checks run on worker threads with small-unroll probe
    # kernels (results are unroll-invariant; compiles are severalfold
    # cheaper and overlap on the compile service) — see validate.run_all
    from grtrace.engine import validate as val
    t0 = time.time()
    onchip = val.run_all()
    onchip["validate_s"] = round(time.time() - t0, 1)

    # roofline: steps/s with a denominator (round-3 verdict item 6).
    # The tunnel RTT is the fixed latency floor of every wall number; the
    # device-only figure is what a direct-attached chip would sustain.
    # Measured decomposition of the 400x400 headline: wall ~0.105 s =
    # ~0.033 s tunnel round trip + ~0.072 s device, giving device-only
    # ~1.25e10 steps/s — EQUAL to the 4K figure (1.23e10, BENCH4K_r03),
    # i.e. the small-batch "throughput gap" is pure dispatch latency,
    # not kernel occupancy; see engine/metrics.py roofline_report.
    rtt = tunnel_rtt()
    from grtrace.engine.metrics import roofline_report
    roofline = roofline_report(total_steps / t, wall_s=t,
                               device_s=max(t - rtt, 1e-6))
    roofline["tunnel_rtt_s"] = round(rtt, 4)

    rays = size * size
    info = {
        "warmup_s": round(warm, 2),
        "warmup_detail": {"service_first_program_s": round(service_s, 1),
                          "render_compile_s": round(render_compile_s, 1)},
        "rays_per_s": round(rays / t),
        "geodesic_steps_per_s": round(total_steps / t),
        "roofline": roofline,
        "counts": res.counts,
        "backend": jax.default_backend(),
        "stages_s": {k: round(v, 4) for k, v in (metrics.stages or {}).items()},
        "parity": parity,
        "onchip_validation": onchip,
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
