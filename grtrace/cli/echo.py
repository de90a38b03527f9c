"""Lamp-post reverberation driver: X-ray echo transfer functions.

    python -m grtrace.cli.echo --spin 0.9 --height 10 --size 192

Two legs (engine/echo.py): a lamp-post source fan (1D, axisymmetric)
plus one disk render; writes the GR emissivity profile, the 2D transfer
function Psi(tau, g), the lag profile, and a JSON summary.  Prints one
JSON metrics line.

No reference counterpart (the reference has no emitters or time axis).
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(
        description="lamp-post reverberation transfer functions")
    p.add_argument('--size', type=int, default=192)
    p.add_argument('--fov', type=float, default=80.0)
    p.add_argument('--steps', type=int, default=30_000)
    p.add_argument('--delta', type=float, default=0.05)
    p.add_argument('--spin', type=float, default=0.0)
    p.add_argument('--charge', type=float, default=0.0)
    p.add_argument('--height', type=float, default=10.0,
                   help='Lamp-post height on the spin axis [M]')
    p.add_argument('--fan-rays', type=int, default=768,
                   help='Rays in the source fan (1D, axisymmetric)')
    p.add_argument('--elevation', type=float, default=30.0,
                   help='Camera elevation above the disk plane (deg)')
    p.add_argument('--r-out', type=float, default=20.0)
    p.add_argument('--weight-power', type=float, default=4.0,
                   help='g_obs exponent of the reflected intensity '
                        '(4 = bolometric, 3 = photon counts)')
    p.add_argument('--out-dir', type=str, default='.')
    args = p.parse_args(argv)
    from . import driver_startup
    driver_startup()
    if args.spin ** 2 + args.charge ** 2 > 1.0:
        raise SystemExit("naked singularity: need a^2 + Q^2 <= M^2")
    if args.height <= 0:
        raise SystemExit("--height must be positive (above the hole)")

    import numpy as np

    from .. import IntegratorConfig, PatchConfig, SceneConfig
    from ..engine.disk import DiskConfig, disk_observer_position, render_disk
    from ..engine.echo import (save_echo_artifacts, trace_lamppost,
                               transfer_function)

    scene = SceneConfig(
        size=args.size, fov_deg=args.fov, metric='kerr', spin=args.spin,
        charge=args.charge, n_samples=0,
        integrator=IntegratorConfig(steps=args.steps, delta=args.delta))
    disk = DiskConfig(r_out=args.r_out, elevation_deg=args.elevation,
                      show_background=False)

    fan = trace_lamppost(args.height,
                         [scene.bh_mass, args.spin, args.charge],
                         n_rays=args.fan_rays, steps=args.steps,
                         delta=args.delta)
    result = render_disk(scene, disk)

    obs_pos = disk_observer_position(scene, disk)
    t_direct = float(np.linalg.norm(
        obs_pos - np.array([0.0, 0.0, args.height])))
    tf = transfer_function(result, fan, weight_power=args.weight_power,
                           t_direct=t_direct)

    os.makedirs(args.out_dir, exist_ok=True)
    written, summary = save_echo_artifacts(fan, tf, args.out_dir,
                                           fan["params"])
    metrics = summary | {"spin": args.spin, "t_direct_M": t_direct,
                         "files": len(written)}
    print(json.dumps(metrics))
    return metrics


def console(argv=None):
    main(argv)
    return 0


if __name__ == "__main__":
    main()
