"""Theta-band sweep driver — the test-band-axis.py analog.

Reruns the full render, then builds N custom rays spanning theta in [0, pi)
at phi in pi +/- 10 deg, integrates with trajectory capture and plots 3D
(parity: reference test-band-axis.py:22-138 — same scene constants:
M=1, observer x=20, boundary 21, 500x500, 30k steps, delta=0.05).

Run: python -m grtrace.cli.band_sweep [flags]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="theta-band geodesic sweep")
    p.add_argument('--size', type=int, default=500)
    p.add_argument('--fov', type=float, default=90)
    p.add_argument('--steps', type=int, default=30_000)
    p.add_argument('--delta', type=float, default=0.05)
    p.add_argument('--omega', type=float, default=0.001)
    p.add_argument('--n-rays', type=int, default=50)
    p.add_argument('--background', type=str, default=None)
    p.add_argument('--backend', type=str, default='auto')
    p.add_argument('--out-dir', type=str, default='images')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)
    from . import driver_startup
    driver_startup()

    import jax.numpy as jnp
    from .. import IntegratorConfig, PatchConfig, SceneConfig
    from ..engine.integrate import integrate_batch_full
    from ..engine.render import render
    from ..io import artifacts
    from ..physics.camera import initial_conditions
    from ..physics.coords import spherical_to_cartesian

    # scene constants from the reference driver (test-band-axis.py:34-39)
    BH_MASS, OBS_X, BOUNDARY = 1.0, 20.0, 21.0
    scene = SceneConfig(
        size=args.size, fov_deg=args.fov, background=args.background,
        bh_mass=BH_MASS, boundary_radius=BOUNDARY, observer_distance=OBS_X,
        integrator=IntegratorConfig(steps=args.steps, delta=args.delta,
                                    omega=1.0, backend=args.backend),
        patch=PatchConfig(center_theta=np.pi / 2, center_phi=np.pi,
                          size_theta=np.deg2rad(126),
                          size_phi=np.deg2rad(224),
                          flip_theta=True, flip_phi=True),
        n_samples=0)

    bg = None
    if artifacts.background_available(args.background):
        bg = artifacts.load_background(args.background,
                                      size=(args.size, args.size))
    res = render(scene, bg_array=bg)
    os.makedirs(args.out_dir, exist_ok=True)
    artifacts.save_image(res.image,
                         os.path.join(args.out_dir, 'theta_band_image.png'))
    print(f"wrote {args.out_dir}/theta_band_image.png")

    # custom theta-band rays (test-band-axis.py:73-93)
    rng = np.random.default_rng(args.seed)
    thetas = np.linspace(0, np.pi, args.n_rays, endpoint=False)
    phis = rng.uniform(np.pi - np.deg2rad(10), np.pi + np.deg2rad(10),
                       args.n_rays)
    dirs = np.stack([-np.sin(thetas) * np.cos(phis),
                     np.sin(thetas) * np.sin(phis),
                     np.cos(thetas)], axis=-1)
    obs = np.array([OBS_X, 0.0, 0.0])
    pixel_pos = obs + dirs  # fictitious screen pixels
    dtype = jnp.float64 if jnp.zeros(()).dtype == jnp.float64 else jnp.float32
    q0, p0, *_ = initial_conditions(jnp.asarray(obs, dtype),
                                    jnp.asarray(pixel_pos, dtype),
                                    mass_bh=BH_MASS)
    traj = np.asarray(integrate_batch_full(
        q0, p0, args.steps, args.delta, 2.0 * BH_MASS, BOUNDARY, 1.0,
        n_keep=500))

    # 3D plot (test-band-axis.py:104-136)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection='3d')
    rs = 2 * BH_MASS
    ph_g, th_g = np.mgrid[0:2 * np.pi:40j, 0:np.pi:20j]
    ax.plot_surface(rs * np.sin(th_g) * np.cos(ph_g),
                    rs * np.sin(th_g) * np.sin(ph_g),
                    rs * np.cos(th_g), color='black', alpha=1.0)
    ax.plot_wireframe(rs * np.sin(th_g) * np.cos(ph_g),
                      rs * np.sin(th_g) * np.sin(ph_g),
                      rs * np.cos(th_g), color='yellow', linewidth=0.3)
    ax.scatter([OBS_X], [0], [0], s=60, color='red')
    for k in range(args.n_rays):
        pts = traj[k]
        keep = ~np.all(pts == 0, axis=1)
        r, th, ph = pts[keep, 1], pts[keep, 2], pts[keep, 3]
        xx, yy, zz = spherical_to_cartesian(r, th, ph)
        ax.plot(np.asarray(xx), np.asarray(yy), np.asarray(zz),
                lw=0.8, color='orange')
    ax.set_xlabel('x'); ax.set_ylabel('y'); ax.set_zlabel('z')
    ax.set_title('theta-band (pi +/- 10 deg) null geodesics')
    lim = BOUNDARY * 1.1
    for axis in 'xyz':
        getattr(ax, f'set_{axis}lim')([-lim, lim])
    plt.tight_layout()
    out_png = os.path.join(args.out_dir, 'theta_band_trajectories.png')
    plt.savefig(out_png, dpi=200)
    plt.close(fig)
    print(f"wrote {out_png}")
    return res


def console(argv=None):
    """setuptools console-script entry (must not return a value — sys.exit
    would print it and exit non-zero)."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
