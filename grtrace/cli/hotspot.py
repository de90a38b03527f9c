"""Orbiting hot-spot flare driver — the GRAVITY-style light-curve product.

One geodesic pass (the tuned disk render) shades the whole movie: the
spacetime is stationary, so every frame is an elementwise re-paint of the
captured per-pixel crossing invariants (engine/hotspot.py has the full
physics).  Writes the frame stack, an animated GIF, and the flare light
curve with its flux-weighted Doppler tracker.

Run: python -m grtrace.cli.hotspot --size 256 --metric kerr --spin 0.9

No reference counterpart (the reference renders one static lensing view).
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="orbiting hot-spot flares")
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--fov', type=float, default=80.0)
    p.add_argument('--steps', type=int, default=20_000)
    p.add_argument('--delta', type=float, default=0.02)
    p.add_argument('--background', type=str, default=None)
    p.add_argument('--bh-mass', type=float, default=1.0)
    p.add_argument('--boundary-radius', type=float, default=31.0)
    p.add_argument('--observer-distance', type=float, default=30.0)
    p.add_argument('--metric', type=str, default='schwarzschild',
                   choices=['schwarzschild', 'kerr'])
    p.add_argument('--spin', type=float, default=0.0)
    p.add_argument('--charge', type=float, default=0.0)
    p.add_argument('--backend', type=str, default='auto')
    # disk geometry (the blob rides the thin-disk scene)
    p.add_argument('--disk-elevation', type=float, default=12.0)
    p.add_argument('--disk-r-out', type=float, default=14.0)
    p.add_argument('--disk-profile', choices=('shakura', 'novikov'),
                   default='shakura')
    # blob
    p.add_argument('--blob-r', type=float, default=None,
                   help='orbit radius (default: placed inside the annulus)')
    p.add_argument('--blob-sigma', type=float, default=0.5)
    p.add_argument('--blob-phi0', type=float, default=0.0)
    p.add_argument('--blob-temp', type=float, default=12000.0)
    p.add_argument('--amplitude', type=float, default=4.0)
    p.add_argument('--frames', type=int, default=64)
    p.add_argument('--periods', type=float, default=1.0)
    p.add_argument('--no-gif', action='store_true')
    p.add_argument('--closure', action='store_true',
                   help='also compute the closure-phase time series of '
                        'the movie (one FFT per frame; the dynamical-'
                        'imaging observable) -> closure_vs_time.csv/.png')
    p.add_argument('--mass-msun', type=float, default=None,
                   help='black-hole mass in solar masses: adds physical '
                        'time (minutes) to the light curve and the '
                        'printed period')
    p.add_argument('--preset', choices=('sgra', 'm87'), default=None,
                   help='source preset (sets --mass-msun; sgra = the '
                        'GRAVITY flare source)')
    p.add_argument('--transfer', type=str, default=None, metavar='NPZ',
                   help='shade the movie from a saved geodesic transfer '
                        'map (io.transfer) instead of tracing — all '
                        'scene/integrator flags are then ignored')
    p.add_argument('--save-transfer', type=str, default=None, metavar='NPZ',
                   help='persist this run\'s transfer map for later '
                        're-shading (cli.reshade / --transfer here)')
    p.add_argument('--out-dir', type=str, default='hotspot_out')
    p.add_argument('--bench', action='store_true',
                   help='print one JSON line: render wall time + frame '
                        'shading throughput (compile-warm)')
    p.add_argument('--out-json', type=str, default=None)
    args = p.parse_args(argv)
    from . import driver_startup
    driver_startup()

    if args.spin and args.metric != 'kerr':
        raise SystemExit("--spin requires --metric kerr")
    if args.spin ** 2 + args.charge ** 2 > args.bh_mass ** 2:
        raise SystemExit("naked singularity: need a^2 + Q^2 <= M^2")

    import numpy as np

    from .. import IntegratorConfig, PatchConfig, SceneConfig
    from ..engine.disk import DiskConfig
    from ..engine.hotspot import (HotspotConfig, render_hotspot,
                                  save_hotspot_artifacts)
    from ..io import artifacts

    hs = HotspotConfig(r_blob=args.blob_r, sigma=args.blob_sigma,
                       phi0=args.blob_phi0, t_blob=args.blob_temp,
                       amplitude=args.amplitude, n_frames=args.frames,
                       n_periods=args.periods)

    os.makedirs(args.out_dir, exist_ok=True)
    if args.transfer:
        from ..io.transfer import TransferMap, hotspot_from_transfer, reshade
        tm = TransferMap.load(args.transfer)
        out = hotspot_from_transfer(tm, hs)
        if args.bench:              # per-pixel inputs only --bench needs
            res = reshade(tm)
        mass, spin, charge = (float(v) for v in tm.params)
    else:
        scene = SceneConfig(
            size=args.size, fov_deg=args.fov, background=args.background,
            bh_mass=args.bh_mass, spin=args.spin, charge=args.charge,
            metric='kerr' if (args.metric == 'kerr' or args.charge) else
            'schwarzschild',
            boundary_radius=args.boundary_radius,
            observer_distance=args.observer_distance, n_samples=0,
            integrator=IntegratorConfig(steps=args.steps, delta=args.delta,
                                        omega=1.0, backend=args.backend),
            patch=PatchConfig())

        if artifacts.background_available(args.background):
            bg = artifacts.load_background(args.background,
                                           size=(args.size, args.size))
        else:
            from ..io import textures
            bg = textures.starfield(args.size, args.size)

        disk = DiskConfig(r_out=args.disk_r_out, profile=args.disk_profile,
                          elevation_deg=args.disk_elevation)
        out = render_hotspot(scene, disk, hs, bg_array=bg)
        res = out["result"]
        mass, spin, charge = args.bh_mass, args.spin, args.charge
        if args.save_transfer:
            from ..io.transfer import TransferMap
            TransferMap.from_result(res, scene, disk).save(
                args.save_transfer)
            print(f"transfer map -> {args.save_transfer}")
    mass_msun = args.mass_msun
    if args.preset and mass_msun is None:
        from ..engine.visibility import PRESETS
        mass_msun = PRESETS[args.preset]["mass_msun"]
    save_hotspot_artifacts(out, args.out_dir, gif=not args.no_gif,
                           mass_msun=mass_msun)
    phys = ""
    if mass_msun:
        from ..engine.hotspot import T_SUN_S
        phys = (f" = {out['period'] * mass_msun * T_SUN_S / 60.0:.1f} min"
                f" at {mass_msun:.3g} M_sun")
    print(f"blob r = {out['r_blob']:.4g} M, period = {out['period']:.5g} M"
          f"{phys}, {args.frames} frames -> {args.out_dir}")

    if args.closure:
        from ..engine.hotspot import closure_phase_series

        size = out["frames"].shape[1]
        pixel_rad = 2.0 * np.tan(np.radians(args.fov) / 2.0) / size
        du = 1.0 / (2 * size * pixel_rad)        # pad=2 frequency spacing
        tris = []
        for s in (3, 6, 11, 18):
            l1 = np.array([s, 1 - s // 3]) * du
            l2 = np.array([1 - s // 3, s]) * du
            tris.append([l1, l2, -(l1 + l2)])
        tris = np.asarray(tris)
        series = closure_phase_series(out["frames"], pixel_rad, tris)
        np.savetxt(
            os.path.join(args.out_dir, "closure_vs_time.csv"),
            np.column_stack([out["times"], np.degrees(series)]),
            delimiter=",", comments="", fmt="%.8g",
            header="tau," + ",".join(
                f"tri{k}_deg" for k in range(len(tris))))

        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4))
        for k in range(series.shape[1]):
            blen = np.linalg.norm(tris[k, 0]) * pixel_rad * size  # ~cycles/fov
            ax.plot(out["times"] / out["period"],
                    np.degrees(np.unwrap(series[:, k])),
                    label=f"triangle {k} (leg ~{blen:.0f} cyc/fov)")
        ax.set_xlabel("observer time (orbital periods)")
        ax.set_ylabel("closure phase (deg)")
        ax.set_title("flare closure-phase swings")
        ax.legend(fontsize=8)
        fig.savefig(os.path.join(args.out_dir, "closure_vs_time.png"),
                    dpi=110, bbox_inches="tight")
        plt.close(fig)
        rng = np.degrees(np.ptp(series, axis=0))
        print(f"closure-phase swings: {np.round(rng, 1)} deg "
              f"-> closure_vs_time.csv/.png")

    if args.bench:
        import json
        import time

        import jax.numpy as jnp

        from ..engine.hotspot import hotspot_statics, shade_hotspot_frames

        params = jnp.asarray(np.array([mass, spin, charge]),
                             res.device("hit_q").dtype)
        psi, r_hit, g, valid = hotspot_statics(
            res.device("hit_q"), res.device("status"),
            res.device("redshift"), params, out["omega"])
        ts = jnp.asarray(out["times"])
        shade = lambda t0: np.asarray(shade_hotspot_frames(  # noqa: E731
            res.device("image"), psi, r_hit, g, valid, ts + t0,
            out["omega"], out["r_blob"], args.blob_sigma, args.blob_phi0,
            t_blob=args.blob_temp, amplitude=args.amplitude)[0])
        shade(0.0)                      # warm the compile
        t0 = time.time()
        reps = 5
        for i in range(reps):           # jittered inputs defeat caching
            shade(1e-3 * (i + 1))
        dt = time.time() - t0
        fps = reps * args.frames / dt
        size = res.device("image").shape[0]
        line = json.dumps({
            "metric": f"hotspot_{size}_shading_frames_per_s",
            "value": round(fps, 1), "unit": "frames/s",
            "vs_baseline": round(fps * size ** 2 / 400 ** 2, 2),
            "frames": args.frames, "size": size,
            "metric_family": "kerr" if spin else "schwarzschild",
            "spin": spin, "wall_s": round(dt, 4),
        })
        print(line)
        if args.out_json:
            with open(args.out_json, "w") as f:
                f.write(line + "\n")
    return args.out_dir


def console(argv=None):
    main(argv)
    return 0


if __name__ == "__main__":
    main()
