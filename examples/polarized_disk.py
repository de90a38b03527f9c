"""Polarized Novikov-Thorne disk: the full science-product workflow.

No reference counterpart (the reference renders background lensing only);
this example shows the capabilities layered on top of the reference's
pipeline: render a Kerr accretion disk with the relativistic
Novikov-Thorne temperature profile and a vertical magnetic field, then
work with the three science products —

  * the per-pixel redshift factor g (gravitational + Doppler, exact from
    each ray's Killing constants),
  * the relativistic broad-line profile (flux vs g),
  * the EVPA polarization map from the conserved Walker-Penrose constant,

and reproduce two closed-form checks inline: the vertical-field pitch
angle against the local Keplerian speed, and the per-pixel redshift
against sqrt(1-3M/r)/sqrt(1-2M/r_obs) in the face-on Schwarzschild limit.

Run from the repo root (CPU is fine at this size):

    python examples/polarized_disk.py [out_dir]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(out_dir="polarized_disk_out"):
    from grtrace import DiskConfig, IntegratorConfig, SceneConfig
    from grtrace.engine.disk import render_disk, save_disk_maps

    os.makedirs(out_dir, exist_ok=True)
    scene = SceneConfig(size=96, metric="kerr", spin=0.9, n_samples=0,
                        integrator=IntegratorConfig(steps=4000, delta=0.05))
    disk = DiskConfig(profile="novikov", bfield="vertical",
                      emissivity_index=3.0)
    res = render_disk(scene, disk)
    print("counts:", res.counts)
    save_disk_maps(res, out_dir, emissivity_index=disk.emissivity_index)
    print("wrote:", sorted(os.listdir(out_dir)))

    dm = res.cls == 5
    g = np.asarray(res.device("redshift"))[dm]
    w = np.asarray(res.device("pol_weight"))[dm]
    hq = np.asarray(res.device("hit_q"))[dm]
    r_em = np.sqrt((hq[:, 1:] ** 2).sum(axis=-1))
    print(f"\n{dm.sum()} disk pixels; g in [{g.min():.3f}, {g.max():.3f}] "
          f"(blue horn {np.quantile(g, 0.95):.3f})")

    # check 1: near-edge-on view of a vertical field -> photons travel
    # almost in the disk plane, nearly perpendicular to B: pitch weight
    # sin^2(theta_B) ~ 1.  (Face-on the same weight collapses to the
    # Keplerian aberration v_loc^2 = M/(r-2M) — that regime is pinned
    # quantitatively in tests/test_polarization.py.)
    outer = r_em > 11.0
    if outer.any():
        print(f"pitch weight sin^2(theta_B), outer disk: median "
              f"{np.median(w[outer]):.3f} (expect ~1 for this edge-on view)")

    # check 2: face-on Schwarzschild redshift closed form
    scene0 = SceneConfig(size=64, metric="kerr", spin=0.0, n_samples=0,
                         integrator=IntegratorConfig(steps=4000, delta=0.05))
    res0 = render_disk(scene0, DiskConfig(elevation_deg=89.9,
                                          show_background=False))
    dm0 = res0.cls == 5
    g0 = np.asarray(res0.device("redshift"))[dm0]
    hq0 = np.asarray(res0.device("hit_q"))[dm0]
    r0 = np.sqrt((hq0[:, 1:] ** 2).sum(axis=-1))
    expect = np.sqrt(1 - 3 / r0) / np.sqrt(1 - 2 / 30.0)
    err = np.abs(g0 / expect - 1).max()
    print(f"face-on closed-form redshift: max rel err {err:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
