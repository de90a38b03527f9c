"""Semi-analytic disk renders + on-demand parity vs the traced engine.

    python -m grtrace.cli.exact --spin 0.9 --size 256 --elevation 25
    python -m grtrace.cli.exact --spin 0.7 --size 48 --compare

No integration: every pixel's equatorial crossings come from the
separated-Hamiltonian quadrature (physics/geodesic_exact.py), shaded
with the same Killing-constant physics as the traced disk pipeline.
``--compare`` re-renders the scene with the traced engine and reports
the per-pixel parity (mask agreement, max/median |dg|) — the user-facing
version of tests/test_render_exact.py.

No reference counterpart (the reference has neither a disk nor any
non-stepping solver; simulation/raytracing.py).
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser(
        description="semi-analytic (no-stepping) thin-disk render")
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--fov', type=float, default=80.0)
    p.add_argument('--spin', type=float, default=0.0)
    p.add_argument('--charge', type=float, default=0.0)
    p.add_argument('--elevation', type=float, default=25.0)
    p.add_argument('--orders', type=int, default=3)
    p.add_argument('--r-in', type=float, default=None)
    p.add_argument('--r-out', type=float, default=14.0)
    p.add_argument('--profile', choices=('shakura', 'novikov'),
                   default='shakura')
    p.add_argument('--retrograde', action='store_true')
    p.add_argument('--t-peak', type=float, default=9000.0)
    p.add_argument('--compare', action='store_true',
                   help='also run the traced disk engine and report '
                        'pixel parity (slow: it integrates)')
    p.add_argument('--steps', type=int, default=20_000,
                   help='traced-engine budget for --compare')
    p.add_argument('--delta', type=float, default=0.02)
    p.add_argument('--out-dir', type=str, default='.')
    args = p.parse_args(argv)
    if args.spin ** 2 + args.charge ** 2 > 1.0:
        raise SystemExit("naked singularity: need a^2 + Q^2 <= M^2")

    import numpy as np

    from .. import IntegratorConfig, PatchConfig, SceneConfig
    from ..engine.disk import DiskConfig
    from ..engine.render_exact import render_disk_exact
    from ..io import artifacts

    scene = SceneConfig(
        size=args.size, fov_deg=args.fov, metric='kerr', spin=args.spin,
        charge=args.charge, n_samples=0,
        integrator=IntegratorConfig(steps=args.steps, delta=args.delta),
        patch=PatchConfig())
    disk = DiskConfig(r_in=args.r_in, r_out=args.r_out,
                      prograde=not args.retrograde, profile=args.profile,
                      elevation_deg=args.elevation,
                      show_background=False, t_peak=args.t_peak)

    t0 = time.time()
    out = render_disk_exact(scene, disk, n_orders=args.orders)
    dt = time.time() - t0

    os.makedirs(args.out_dir, exist_ok=True)
    artifacts.save_image(out["image_u8"],
                         os.path.join(args.out_dir, "exact_disk.png"))
    hw = out["shape"]
    g = np.asarray(out["g"]).reshape(hw)
    r_em = np.asarray(out["r_em"]).reshape(hw)
    order = np.asarray(out["order"]).reshape(hw)
    np.savetxt(os.path.join(args.out_dir, "exact_g_map.csv"), g,
               delimiter=",")
    np.savetxt(os.path.join(args.out_dir, "exact_r_em.csv"), r_em,
               delimiter=",")

    mask = g > 0.0
    per_order = [int((order == k).sum()) for k in range(args.orders)]
    metrics = {
        "size": args.size,
        "spin": args.spin,
        "charge": args.charge,
        "orders": args.orders,
        "disk_pixels": int(mask.sum()),
        "pixels_per_order": per_order,
        "g_min": float(g[mask].min()) if mask.any() else None,
        "g_max": float(g[mask].max()) if mask.any() else None,
        "render_s": round(dt, 3),
        "files": 3,
    }

    if args.compare:
        from ..engine.disk import render_disk
        t0 = time.time()
        res = render_disk(scene, disk)
        t_traced = time.time() - t0
        g_tr = np.asarray(res.device("redshift")).reshape(hw)
        m_tr = np.asarray(res.device("cls")).reshape(hw) == 5  # CLS_DISK
        both = mask & m_tr
        dg = np.abs(g_tr[both] - g[both]) if both.any() else np.array(
            [0.0])
        metrics |= {
            "traced_disk_pixels": int(m_tr.sum()),
            "mask_mismatch_pixels": int((mask ^ m_tr).sum()),
            "dg_max": float(dg.max()),
            "dg_median": float(np.median(dg)),
            "traced_render_s": round(t_traced, 3),
        }

    print(json.dumps(metrics))
    return metrics


def console(argv=None):
    main(argv)
    return 0


if __name__ == "__main__":
    main()
