"""End-to-end pipeline driver — the reference main.py analog.

Pipeline (parity with reference main.py:22-157):
  scene -> flat-space reference image (no_gravity.png, scene_full.png)
        -> curved render (manual_output.png, photon_data.csv,
           sampled_rays.csv)
        -> scene diagnostics (topdown, closeup 3D, embedding 3D x 8 azimuths)
        -> photon summary printed from the photon data.

Run: python -m grtrace.cli.main [flags]  (flag parity: cli/args.py)
"""
from __future__ import annotations

import logging
import os
import time

import numpy as np

from ..engine.flat import flat_render_scene
from ..engine.render import render
from ..io import artifacts
from .args import disk_from_args, parse_args, scene_from_args

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s: %(message)s")


def main(argv=None):
    args = parse_args(argv)
    from . import driver_startup
    driver_startup()
    scene = scene_from_args(args)
    out = args.out_dir
    images_dir = os.path.join(out, "images")

    bg_array = None
    if artifacts.background_available(scene.background):
        # reference behavior: texture resized to the output resolution
        # (raytracing.py:36)
        bg_array = artifacts.load_background(
            scene.background, size=(scene.size, scene.size))
    elif scene.background:
        logging.warning(
            "Background %s not found; rendering without it (tip: "
            "--background procedural:starfield needs no asset files)",
            scene.background)

    observer = scene.observer()
    bh = scene.black_hole()

    # --- flat-space reference image (main.py:44-58) ---
    flat_trajs = None
    if not scene.no_flat_trajectories and bg_array is not None:
        logging.info("Saving no-gravity image using background...")
        flat_img, flat_trajs = flat_render_scene(
            observer, bg_array,
            boundary_radius=scene.boundary_radius,
            patch_center_theta=scene.patch.center_theta,
            patch_center_phi=scene.patch.center_phi,
            patch_size_theta=scene.patch.size_theta,
            patch_size_phi=scene.patch.size_phi,
            flip_theta=scene.patch.flip_theta,
            flip_phi=scene.patch.flip_phi,
            n_sampled=10, seed=args.seed,
            override_patch_center=False)
        artifacts.save_image(flat_img,
                             os.path.join(images_dir, "no_gravity.png"))
        artifacts.save_image(bg_array,
                             os.path.join(images_dir, "scene_full.png"))

    # --- curved render (main.py:67-99) ---
    logging.info("Starting manual ray tracing simulation...")
    t0 = time.time()
    from ..engine.metrics import RenderMetrics, trace
    rm = RenderMetrics() if args.print_metrics else None
    disk_cfg = disk_from_args(args)
    if args.save_transfer and disk_cfg is None:
        raise SystemExit("--save-transfer requires --disk (the transfer "
                         "map records disk-crossing invariants)")
    if args.camera_omega is not None and disk_cfg is None:
        raise SystemExit("--camera-omega requires --disk (the orbiting "
                         "camera rides the disk pipeline)")
    if args.save_transfer and args.aa:
        raise SystemExit(
            "--save-transfer with --aa is not supported: the transfer "
            "map stores single-ray crossing invariants, so reshading "
            "would replace the AA-averaged disk-edge pixels with "
            "single-ray colors and break the bit-exact reshade "
            "contract — save the transfer from a non-AA run")
    with trace(os.path.join(out, "jax_trace") if args.profile else None):
        if disk_cfg is not None:
            metric_lc = scene.metric.lower()
            if metric_lc in ("kottler", "sds", "bardeen", "hayward"):
                # beyond-Kerr static families: the planar-fold disk
                # renderer (engine.disk_static); AA and transfer maps
                # ride the Kerr-Schild path only
                if args.aa:
                    raise SystemExit(
                        "--aa with --disk is implemented on the "
                        "Kerr-family disk path; static-family disks "
                        "render without edge refinement")
                if args.save_transfer:
                    raise SystemExit(
                        "--save-transfer records Kerr-Schild chart "
                        "crossings; not supported with static-family "
                        "metrics")
                from ..engine.disk_static import render_disk_static
                result = render_disk_static(scene, disk_cfg,
                                            bg_array=bg_array, metrics=rm)
            elif metric_lc in ("kerr-ds", "kerrds"):
                # Kerr-de Sitter: BL-chart theta-crossing disk renderer
                if args.aa:
                    raise SystemExit(
                        "--aa with --disk rides the Kerr-family path; "
                        "kerr-ds disks render without edge refinement")
                if args.save_transfer:
                    raise SystemExit(
                        "--save-transfer records Kerr-Schild chart "
                        "crossings; not supported with kerr-ds")
                from ..engine.disk_kds import render_disk_kds
                result = render_disk_kds(scene, disk_cfg,
                                         bg_array=bg_array, metrics=rm)
            else:
                # Kerr-Newman family AND the rotating regular families
                # (render_disk routes on scene.metric; the family
                # parameter rides the charge slot)
                if args.save_transfer and metric_lc.startswith("rotating"):
                    raise SystemExit(
                        "--save-transfer reshading is wired for the "
                        "Kerr-Newman family; not supported with rotating "
                        "regular metrics")
                from ..engine.disk import render_disk
                result = render_disk(scene, disk_cfg, bg_array=bg_array,
                                     metrics=rm, aa_samples=args.aa or None)
        else:
            result = render(scene, bg_array=bg_array, seed=args.seed,
                            metrics=rm, aa_samples=args.aa or None)
    logging.info("Curved render finished in %.2fs (%s backend)",
                 time.time() - t0, scene.integrator.backend)
    if rm is not None:
        print(rm)
    if args.profile:
        logging.info("jax.profiler trace written to %s/jax_trace "
                     "(view with TensorBoard/xprof)", out)
    artifacts.save_image(result.image,
                         os.path.join(images_dir, "manual_output.png"))
    logging.info("Saved manual_output.png")
    if disk_cfg is not None:
        # per-pixel combined gravitational+Doppler g = nu_obs/nu_em (0
        # off-disk) and the BL emission radius — the disk mode's science
        # products (redshift maps are what thin-disk renders are FOR)
        from ..engine.disk import save_disk_maps
        # spherical-chart crossings: the planar-fold static families AND
        # the BL-chart kerr-ds disk store (t, r, theta, phi) hits
        spherical_disk = scene.metric.lower() in (
            "kottler", "sds", "bardeen", "hayward", "kerr-ds", "kerrds")
        save_disk_maps(result, out,
                       emissivity_index=disk_cfg.emissivity_index,
                       spin=scene.spin,
                       chart="spherical" if spherical_disk else "ks")
        logging.info("Saved redshift_map.csv/.png + line_profile.csv/.png")
        if args.save_transfer:
            from ..io.transfer import TransferMap
            TransferMap.from_result(result, scene, disk_cfg).save(
                args.save_transfer)
            logging.info("Saved geodesic transfer map to %s "
                         "(re-shade with python -m grtrace.cli.reshade)",
                         args.save_transfer)

    artifacts.save_photon_data(result, os.path.join(out, "photon_data.csv"))
    if result.sampled_trajectories:
        artifacts.save_sampled_rays(result,
                                    os.path.join(out, "sampled_rays.csv"))

    # --- scene diagnostics (main.py:104-142) ---
    if not args.no_plots:
        from ..viz import plots
        photon_trajs = None
        if result.sampled_trajectories:
            photon_trajs = []
            for traj in result.sampled_trajectories:
                keep = ~np.all(traj == 0, axis=1)
                if keep.any():
                    photon_trajs.append(traj[keep])
            print(f"Filtered {len(photon_trajs)} trajectories")
        logging.info("Saving top-down scene view...")
        plots.plot_scene_topdown(
            bh, observer, scene.image_size, scene.boundary_radius,
            out_path=os.path.join(images_dir, "scene_topdown.png"),
            fov_deg=scene.fov_deg,
            patch_center_theta=scene.patch.center_theta,
            patch_size_theta=scene.patch.size_theta,
            patch_size_phi=scene.patch.size_phi,
            photon_trajectories=photon_trajs)
        logging.info("Saving close-up 3D scene view...")
        plots.plot_scene_closeup_3d(
            bh, observer, scene.image_size,
            out_path=os.path.join(images_dir, "scene_closeup_3d.png"),
            fov_deg=scene.fov_deg, photon_trajectories=photon_trajs)
        logging.info("Saving 3D embedding scene view...")
        plots.plot_scene_embedding_3d(
            bh, observer, scene.image_size, scene.boundary_radius,
            out_path=os.path.join(images_dir, "scene_topdown_3d.png"),
            fov_deg=scene.fov_deg,
            photon_trajectories=photon_trajs, flat_trajectories=flat_trajs,
            patch_center_theta=scene.patch.center_theta,
            patch_center_phi=scene.patch.center_phi,
            patch_size_theta=scene.patch.size_theta,
            patch_size_phi=scene.patch.size_phi,
            override_patch_center=False)

    # --- photon summary (main.py:144-157) ---
    artifacts.print_summary(result.counts)
    return result


def console(argv=None):
    """setuptools console-script entry (must not return a value — sys.exit
    would print it and exit non-zero)."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
