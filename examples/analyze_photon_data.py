"""Executable analog of the reference's photon-data analysis notebook.

The reference ships `tests/analysis.ipynb` (reference: tests/analysis.ipynb
cells 0-2), which loads `photon_data.csv` into pandas and previews it; the
interesting statistics live in main.py's end-of-run summary (reference:
main.py:144-157).  This script is that notebook made executable and
reproducible: it loads an existing photon_data.csv (pass a path) or renders
the default scene to produce one, prints the notebook's `df.head()` preview,
and then the per-class summary the reference computes plus per-class
alpha0 / final-radius statistics.

Run from the repo root:

    python examples/analyze_photon_data.py [path/to/photon_data.csv]
"""
import os
import sys
import tempfile

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(df: pd.DataFrame) -> dict:
    """Reference main.py:147-155 photon summary + per-class distributions."""
    counts = df["collision"].value_counts().to_dict()
    total = len(df)
    print(f"\nPhoton summary ({total} rays):")
    for k in ("bh", "escape_bg", "escape_no_patch", "in_domain", "error"):
        if k in counts:
            print(f"  {k:16s} {counts[k]:8d}  ({100.0 * counts[k] / total:.2f}%)")
    print("\nPer-class alpha0 (camera angle off optical axis, rad):")
    for k, grp in df.groupby("collision"):
        a = grp["alpha0"]
        print(f"  {k:16s} min {a.min():.4f}  median {a.median():.4f} "
              f" max {a.max():.4f}")
    print("\nPer-class final radius:")
    for k, grp in df.groupby("collision"):
        r = grp["final_r"]
        print(f"  {k:16s} min {r.min():.3f}  median {r.median():.3f} "
              f" max {r.max():.3f}")
    # the shadow edge: largest captured alpha0 vs smallest escaping alpha0
    if "bh" in counts and "escape_bg" in counts:
        cap_max = df[df.collision == "bh"]["alpha0"].max()
        esc_min = df[df.collision == "escape_bg"]["alpha0"].min()
        print(f"\nShadow edge: max captured alpha0 {cap_max:.5f} rad, "
              f"min escaped alpha0 {esc_min:.5f} rad")
    return counts


def render_default(out_dir: str) -> str:
    """Produce photon_data.csv for the default scene (64x64, short budget)."""
    from grtrace import IntegratorConfig, PatchConfig, SceneConfig, render
    from grtrace.io.artifacts import save_photon_data

    scene = SceneConfig(size=64,
                        integrator=IntegratorConfig(steps=5000, delta=0.05),
                        patch=PatchConfig(), n_samples=0)
    tex = np.full((64, 64, 3), 200, np.uint8)
    res = render(scene, bg_array=tex)
    path = f"{out_dir}/photon_data.csv"
    save_photon_data(res, path)
    return path


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv:
        path = argv[0]
    else:
        print("no CSV given - rendering the default scene first...")
        path = render_default(tempfile.mkdtemp(prefix="grtrace_analyze_"))
    df = pd.read_csv(path)
    print(f"loaded {path}: {len(df)} rows")
    print(df.head())  # the notebook's preview cell
    summarize(df)


if __name__ == "__main__":
    main()
