"""Regenerate the README showcase renders (committed under images/).

Run on the real chip:  python tools/showcase.py
Each render uses the library API with a dense procedural starfield so the
lensed sky band and photon ring read clearly at README scale.
"""
import sys
import time

import numpy as np
from PIL import Image

from grtrace import DiskConfig, SceneConfig, IntegratorConfig, render
from grtrace.engine.disk import render_disk
from grtrace.io import textures

BG = np.clip(textures.starfield(density=1.5e-3, seed=3).astype(np.float32)
             * 2.4, 0, 255).astype(np.uint8)

CONFIGS = [
    ("schwarzschild_400",
     SceneConfig(size=400, n_samples=0,
                 integrator=IntegratorConfig(steps=200_000, delta=0.01))),
    ("kerr_a09_512",
     SceneConfig(size=512, metric="kerr", spin=0.9, n_samples=0,
                 integrator=IntegratorConfig(steps=30_000, delta=0.02))),
    ("kerr_newman_a06_q05_256",
     SceneConfig(size=256, metric="kerr", spin=0.6, charge=0.5, n_samples=0,
                 integrator=IntegratorConfig(steps=30_000, delta=0.02))),
    # README's third panel: the thin-disk showcase (production kernel path)
    ("kerr_disk_a09_512", "disk",
     SceneConfig(size=512, metric="kerr", spin=0.9, n_samples=0,
                 integrator=IntegratorConfig(steps=30_000, delta=0.02))),
    # polarized Novikov-Thorne disk: EVPA ticks from the Walker-Penrose
    # constant, vertical field (the EHT-style presentation)
    ("kerr_disk_pol_a09_384", "disk_pol",
     SceneConfig(size=384, metric="kerr", spin=0.9, n_samples=0,
                 integrator=IntegratorConfig(steps=30_000, delta=0.02))),
]


def main():
    t0 = time.time()
    # every panel gets the adaptive edge-refinement pass (--aa 3): 3x3
    # sub-rays at the shadow boundary / disk silhouette, ~10% of a frame
    for name, *mode_scene in CONFIGS:
        scene = mode_scene[-1]
        if mode_scene[0] == "disk":
            res = render_disk(scene, DiskConfig(), bg_array=BG,
                              aa_samples=3)
        elif mode_scene[0] == "disk_pol":
            from grtrace.engine.disk import polarization_ticks_png
            res = render_disk(scene, DiskConfig(profile="novikov",
                                                bfield="vertical"),
                              bg_array=BG, aa_samples=3)
            polarization_ticks_png(res, f"images/{name}.png", stride=12,
                                   dpi=150, scale=34.0, width=0.0035)
            print(name, "counts:", res.counts, f"{time.time()-t0:.1f}s",
                  flush=True)
            continue
        else:
            res = render(scene, bg_array=BG, aa_samples=3)
        Image.fromarray(np.asarray(res.image)).save(f"images/{name}.png")
        print(name, "counts:", res.counts, f"{time.time()-t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
