"""End-to-end observational workflow: trace once, derive every observable.

The modern black-hole-imaging workflow asks several questions of one
scene — what does it look like, where is the shadow edge, what does an
interferometer see, what spectrum does the disk emit, what does a flare
light curve look like, and how do all of those change with the disk
model?  This example runs that whole chain on ONE geodesic pass via the
transfer-map machinery (io/transfer.py): everything after step 1 is
shading-cost only (milliseconds), no re-tracing.

    python examples/observables_workflow.py [out_dir]

Products (in out_dir, default /tmp/grtrace_workflow):
    disk.png / disk_nt.png      Shakura-Sunyaev vs Novikov-Thorne shading
    redshift_map.png            combined gravitational + Doppler g factor
    line_profile.png            relativistic broad-line shape
    shadow_overlay.png          analytic Bardeen critical curve on the render
    shadow_metrics.json         EHT-style shape metrics
    visibility_amp.png          u-v-plane amplitudes + first null (M87* scale)
    hotspot/lightcurve.png      orbiting-flare light curve + Doppler tracker

No reference counterpart: the reference renders one static lensing view.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_dir="/tmp/grtrace_workflow", size=192, steps=12_000,
         delta=0.03, spin=0.9):
    from grtrace import IntegratorConfig, PatchConfig, SceneConfig
    from grtrace.engine.disk import DiskConfig, render_disk, save_disk_maps
    from grtrace.engine.shadow import (analytic_boundary, overlay_png,
                                       shadow_metrics)
    from grtrace.engine.visibility import (first_null, radial_profile,
                                           visibility_map)
    from grtrace.io import artifacts
    from grtrace.io.transfer import (TransferMap, hotspot_from_transfer,
                                     reshade)

    os.makedirs(out_dir, exist_ok=True)
    scene = SceneConfig(size=size, metric="kerr", spin=spin, n_samples=0,
                        integrator=IntegratorConfig(steps=steps,
                                                    delta=delta),
                        patch=PatchConfig())
    disk = DiskConfig(r_out=14.0)

    # 1. the ONE geodesic pass
    print("tracing...")
    res = render_disk(scene, disk, bg_array=None)
    tm = TransferMap.from_result(res, scene, disk)
    tm.save(os.path.join(out_dir, "scene.transfer.npz"))
    artifacts.save_image(res.image, os.path.join(out_dir, "disk.png"))
    print(f"  {res.counts}")

    # 2. disk-model exploration from the saved invariants (no tracing)
    print("reshading (Novikov-Thorne)...")
    nt = reshade(tm, profile="novikov", t_peak=12000.0)
    artifacts.save_image(nt.image, os.path.join(out_dir, "disk_nt.png"))
    save_disk_maps(nt, out_dir)          # redshift map + line profile

    # 3. shadow science: analytic critical curve + shape metrics
    print("shadow analysis...")
    psis, rho = analytic_boundary(spin, n_psi=96)
    metrics = shadow_metrics(psis, rho)
    overlay_png(res, psis, rho, os.path.join(out_dir,
                                             "shadow_overlay.png"),
                title=f"a = {spin:g}")
    with open(os.path.join(out_dir, "shadow_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(f"  mean diameter {metrics['mean_diameter_px']:.2f} px, "
          f"Delta C = {metrics['circularity_deviation']:.4f}")

    # 4. what an interferometer sees (M87* angular scale)
    print("visibilities...")
    from grtrace.engine.visibility import camera_to_earth
    pixel_cam = 2.0 * np.tan(scene.fov / 2.0) / size
    to_earth = camera_to_earth(scene.observer_distance, scene.bh_mass,
                               mass_msun=6.5e9, distance_mpc=16.8)
    amp, u, v = visibility_map(res.image, pixel_cam * to_earth)
    base, prof = radial_profile(amp, u, v, n_bins=400,
                                b_max=min(u.max(), v.max()) / 4.0)
    b0 = first_null(base, prof)
    print(f"  first null {b0 / 1e9:.2f} Glambda" if np.isfinite(b0)
          else "  no null in range")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.semilogy(base / 1e9, np.maximum(prof, 1e-8))
    ax.set_xlabel("baseline (G$\\lambda$)")
    ax.set_ylabel("|V|")
    fig.savefig(os.path.join(out_dir, "visibility_amp.png"), dpi=110,
                bbox_inches="tight")
    plt.close(fig)

    # 5. an orbiting hot-spot flare, shaded from the same transfer map
    print("hot-spot light curve...")
    from grtrace.engine.hotspot import HotspotConfig, save_hotspot_artifacts
    hs_dir = os.path.join(out_dir, "hotspot")
    os.makedirs(hs_dir, exist_ok=True)
    out = hotspot_from_transfer(tm, HotspotConfig(n_frames=32))
    save_hotspot_artifacts(out, hs_dir, gif=False)
    print(f"  blob r = {out['r_blob']:.3g} M, period = "
          f"{out['period']:.4g} M")

    print(f"all products -> {out_dir}")
    return out_dir


if __name__ == "__main__":
    main(*sys.argv[1:2])
