"""Lensing-magnification driver: signed magnification + parity maps.

    python -m grtrace.cli.magnify --metric kerr --spin 0.9 --size 256

One curved render (Cartesian chart), then the magnification is finite
differences of its escape-angle map normalized by the straight-ray twin
(engine/lensing.py) — the Einstein-ring divergence, the parity-flipped
secondary-image annulus, and the far-field mu -> 1 all come out of data
the render already computed.  Writes magnification.csv/.png and prints
one JSON metrics line.

No reference counterpart (the reference never differentiates its map).
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(
        description="lensing magnification / image-parity maps")
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--fov', type=float, default=80.0)
    p.add_argument('--steps', type=int, default=20_000)
    p.add_argument('--delta', type=float, default=0.02)
    p.add_argument('--metric', type=str, default='schwarzschild',
                   choices=['schwarzschild', 'kerr'])
    p.add_argument('--spin', type=float, default=0.0)
    p.add_argument('--charge', type=float, default=0.0)
    p.add_argument('--backend', type=str, default='auto')
    p.add_argument('--out-dir', type=str, default='.')
    args = p.parse_args(argv)
    from . import driver_startup
    driver_startup()
    if args.spin ** 2 + args.charge ** 2 > 1.0:
        raise SystemExit("naked singularity: need a^2 + Q^2 <= M^2")
    if args.spin and args.metric != 'kerr':
        raise SystemExit("--spin requires --metric kerr")

    import numpy as np

    from .. import IntegratorConfig, PatchConfig, SceneConfig
    from ..engine.lensing import (inverse_magnification_map,
                                  save_magnification_maps)
    from ..engine.render_generic import render_generic

    scene = SceneConfig(
        size=args.size, fov_deg=args.fov, metric='kerr', spin=args.spin,
        charge=args.charge, n_samples=0,
        integrator=IntegratorConfig(steps=args.steps, delta=args.delta,
                                    backend=args.backend),
        patch=PatchConfig())
    # horizon-regular Cartesian chart explicitly: render_generic's
    # default is the BL chart, whose polar stripe would contaminate the
    # FD map for rays passing near the axis
    res = render_generic(scene, spin=args.spin, charge=args.charge,
                         metric="KerrSchild", bg_array=None)
    mu_inv, valid = inverse_magnification_map(res,
                                              scene.boundary_radius)

    os.makedirs(args.out_dir, exist_ok=True)
    save_magnification_maps(mu_inv, valid, args.out_dir)

    def _finite(x):
        """NaN/inf -> None so the metrics line stays valid JSON."""
        return float(x) if np.isfinite(x) else None

    mu = 1.0 / mu_inv[valid]
    near_unity = mu[np.abs(mu - 1.0) < 0.5] if mu.size else mu
    metrics = {
        "valid_pixels": int(valid.sum()),
        "flipped_pixels": int((mu_inv[valid] < 0).sum()),
        "max_abs_magnification": _finite(np.abs(mu).max())
        if mu.size else None,
        "far_field_mu": _finite(np.median(np.abs(near_unity)))
        if near_unity.size else None,
        "spin": args.spin, "charge": args.charge,
    }
    print(json.dumps(metrics))
    return metrics


def console(argv=None):
    main(argv)
    return 0


if __name__ == "__main__":
    main()
