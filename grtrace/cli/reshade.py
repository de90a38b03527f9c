"""Re-shade a saved geodesic transfer map — disk-model exploration at
shading cost, zero geodesic work.

    # trace once (writes scene.transfer.npz alongside the render):
    python -m grtrace.cli.main --disk --metric kerr --spin 0.9 \
        --save-transfer scene.transfer.npz
    # then explore models instantly:
    python -m grtrace.cli.reshade --transfer scene.transfer.npz \
        --disk-profile novikov --disk-temp 12000 --out-dir nt/
    python -m grtrace.cli.reshade --transfer scene.transfer.npz \
        --disk-bfield toroidal --out-dir pol/
    # emissivity-index scan: one line-profile artifact per q
    python -m grtrace.cli.reshade --transfer scene.transfer.npz \
        --disk-emissivity 2 3 4 --out-dir qscan/

Writes manual_output.png plus the disk science products
(redshift_map/line_profile, polarization maps when --disk-bfield is set)
for every knob combination — identical artifacts to a fresh
`--disk` render with those knobs (pinned bit-exact in
tests/test_transfer.py), in milliseconds instead of a full trace.

No reference counterpart (the reference recomputes every render).
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(
        description="re-shade a saved geodesic transfer map")
    p.add_argument('--transfer', type=str, required=True,
                   help='transfer-map .npz written by --save-transfer')
    p.add_argument('--disk-temp', type=float, default=None,
                   help='peak color temperature (K); default: as traced')
    p.add_argument('--disk-exposure', type=float, default=None,
                   help='tone-mapping gain; default: as traced')
    p.add_argument('--disk-profile', choices=('shakura', 'novikov'),
                   default=None, help='temperature law; default: as traced')
    p.add_argument('--disk-bfield',
                   choices=('vertical', 'toroidal', 'radial', 'none'),
                   default=None,
                   help='polarized-imaging field geometry (EVPA maps '
                        'recomputed from the saved camera); default: as '
                        'traced, "none" disables')
    p.add_argument('--disk-retrograde', action='store_true',
                   help='re-shade with counter-rotating emitters (the '
                        'annulus stays as traced)')
    p.add_argument('--disk-emissivity', type=float, nargs='+', default=None,
                   help='emissivity index q for the line profile; several '
                        'values write line_profile_q<q>.csv/.png each')
    p.add_argument('--out-dir', type=str, default='.')
    args = p.parse_args(argv)
    from . import driver_startup
    driver_startup()

    from ..engine.disk import save_disk_maps
    from ..io.transfer import TransferMap, reshade

    tm = TransferMap.load(args.transfer)
    res = reshade(tm, t_peak=args.disk_temp, exposure=args.disk_exposure,
                  profile=args.disk_profile, bfield=args.disk_bfield,
                  prograde=False if args.disk_retrograde else None)

    os.makedirs(args.out_dir, exist_ok=True)
    from ..io import artifacts
    artifacts.save_image(res.image,
                         os.path.join(args.out_dir, "manual_output.png"))

    spin = float(tm.params[1])
    qs = args.disk_emissivity or [tm.meta.get("emissivity_index", 3.0)]
    save_disk_maps(res, args.out_dir, emissivity_index=qs[0], spin=spin)
    for q in qs[1:]:
        sub = os.path.join(args.out_dir, f"q{q:g}")
        os.makedirs(sub, exist_ok=True)
        save_disk_maps(res, sub, emissivity_index=q, spin=spin)

    h, w = tm.shape
    print(f"reshaded {w}x{h} transfer map ({res.counts['disk']} disk px, "
          f"traced at steps={tm.meta['steps']} delta={tm.meta['delta']}) "
          f"-> {args.out_dir}")
    return args.out_dir


def console(argv=None):
    main(argv)
    return 0


if __name__ == "__main__":
    main()
