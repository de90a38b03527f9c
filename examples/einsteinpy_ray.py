"""Executable analog of the reference's EinsteinPy single-ray notebook.

The reference's `tests/einsteinpy-geodesic-test/einsteinpy_ray.ipynb` traces
ONE null geodesic with EinsteinPy's `Nulllike` (r=4, equatorial, tangential
3-momentum p0=(0,1,0), 10,000 steps, delta=0.001, omega=0.01 — reference:
einsteinpy_ray.ipynb cell 4), loads the (steps, 8) trajectory into a pandas
DataFrame with a derived radius column (cell 8), and renders a 4-panel
lambda-coloured diagnostic figure (cells 10-11).  This script does exactly
that through grtrace's drop-in compat layer (grtrace.compat.Nulllike) and
the shared plotting helper (grtrace.viz.plots.plot_geodesic) — no EinsteinPy
install needed, same conventions (past-directed p_t root, FANTASY ord-2).

Run from the repo root:

    python examples/einsteinpy_ray.py [out.png]
"""
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grtrace.compat import Nulllike
from grtrace.viz.plots import plot_geodesic


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    out = argv[0] if argv else "einsteinpy_ray.png"

    # the notebook's scenario (einsteinpy_ray.ipynb cells 1, 4) — integrate
    # ONCE in spherical coordinates; the Cartesian DataFrame columns are a
    # trig conversion away (the same conversion `trajectory` itself does
    # when return_cartesian=True)
    geod = Nulllike(
        metric="Schwarzschild",
        metric_params=(0.0,),
        position=(4.0, np.pi / 2, 0.0),
        momentum=(0.0, 1.0, 0.0),   # the notebook's p0: theta-directed
        steps=10_000,
        delta=0.001,
        omega=0.01,                 # small omega -> stable integration
        return_cartesian=False,
        suppress_warnings=True,
    )
    print(f"Starting geodesic integration... {geod!r}")
    lambdas, sph = geod.trajectory  # rows: t, r, th, ph, pt, pr, pth, pph

    t, r, th, ph = sph[:, 0], sph[:, 1], sph[:, 2], sph[:, 3]
    sin_th = np.sin(th)
    # the notebook's DataFrame (cell 8): t,x,y,z,pt,pr,pth,pph + radius
    df = pd.DataFrame({
        "t": t, "x": r * sin_th * np.cos(ph), "y": r * sin_th * np.sin(ph),
        "z": r * np.cos(th), "pt": sph[:, 4], "pr": sph[:, 5],
        "pth": sph[:, 6], "pph": sph[:, 7]})
    df["r"] = np.linalg.norm(df[["x", "y", "z"]], axis=1)
    print(df.head())
    print(f"\n{len(df)} samples; r range [{df.r.min():.4f}, {df.r.max():.4f}]"
          "  (tangential at r0=4: impact parameter b = 4/sqrt(1-2/4) = 5.66"
          " > b_crit = 3*sqrt(3) = 5.196, so the ray slowly spirals out)")

    # 4-panel lambda-coloured figure (cells 10-11) from the spherical rows
    plot_geodesic(sph[:, :4], mass_bh=1.0, step=25, out_path=out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
