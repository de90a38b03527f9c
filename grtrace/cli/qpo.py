"""QPO-frequency driver: the three epicyclic frequencies vs radius.

    python -m grtrace.cli.qpo --spin 0.9 --preset grs1915
    python -m grtrace.cli.qpo --spin 0.5 --charge 0.3 --mass-msun 4.3e6

Sweeps the orbital (nu_phi), radial epicyclic (nu_r) and vertical
epicyclic (nu_theta) frequencies of circular equatorial geodesics from
the ISCO outward — all from autodiff of the same metric the ray tracer
integrates (physics/epicyclic.py), no closed forms — plus the two
precession frequencies the relativistic-precession QPO model is built
from (periastron nu_phi - nu_r, Lense-Thirring nodal nu_phi - nu_theta).
Writes qpo_frequencies.csv / .png and prints one JSON metrics line with
the ISCO radius, the frequencies at the ISCO, and the maximum of nu_r
(the highest radial QPO the spacetime supports).

No reference counterpart: the reference renders lensed backgrounds only
(/root/reference/simulation/raytracing.py) and has no orbit dynamics.
"""
from __future__ import annotations

import argparse
import json
import os

# stellar-mass QPO sources join the imaging presets (masses: McClintock
# et al. 2006 for GRS 1915+105; Orosz et al. 2011 for Cyg X-1)
QPO_PRESETS = {
    "grs1915": 12.4,
    "cygx1": 14.8,
    "sgra": 4.297e6,
    "m87": 6.5e9,
}


def main(argv=None):
    p = argparse.ArgumentParser(
        description="epicyclic / QPO frequencies of circular orbits")
    p.add_argument('--mass', type=float, default=1.0,
                   help='geometrized mass M (code units)')
    p.add_argument('--spin', type=float, default=0.0)
    p.add_argument('--charge', type=float, default=0.0)
    p.add_argument('--metric', type=str, default='kerr',
                   choices=('kerr', 'kottler', 'sds', 'bardeen', 'hayward',
                            'rotating-bardeen', 'rotating-hayward',
                            'kerr-ds'),
                   help='spacetime family: kerr (spin/charge), a static '
                        'beyond-Kerr family (physics/static_orbits), a '
                        'rotating regular family (physics/rotating_orbits) '
                        'or Kerr-de Sitter (physics/kerr_de_sitter; '
                        '--spin + --metric-param)')
    p.add_argument('--metric-param', type=float, default=0.0,
                   help='static-family parameter: Lambda (kottler), '
                        'magnetic charge g (bardeen), core length l '
                        '(hayward)')
    p.add_argument('--retrograde', action='store_true')
    p.add_argument('--mass-msun', type=float, default=None,
                   help='physical mass in solar masses (for Hz axes)')
    p.add_argument('--preset', type=str, default=None,
                   choices=sorted(QPO_PRESETS))
    p.add_argument('--r-max', type=float, default=20.0,
                   help='outer sweep radius in units of M')
    p.add_argument('--platform', type=str, default='cpu',
                   choices=('cpu', 'default'),
                   help="backend: 'cpu' (default — the sweeps are a few "
                        "hundred scalar orbits, far below accelerator "
                        "compile cost) or 'default' (whatever jax picks)")
    p.add_argument('--n', type=int, default=256, help='radial samples')
    p.add_argument('--out-dir', type=str, default='.')
    args = p.parse_args(argv)
    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from . import driver_startup
    driver_startup()
    if args.metric == 'kerr' and \
            args.spin ** 2 + args.charge ** 2 > args.mass ** 2:
        raise SystemExit("naked singularity: need a^2 + Q^2 <= M^2")
    mass_msun = (QPO_PRESETS[args.preset] if args.preset
                 else args.mass_msun)

    import jax.numpy as jnp
    import numpy as np

    from ..physics.epicyclic import T_SUN_S

    import jax

    prograde = not args.retrograde
    static_names = {"kottler": "Kottler", "sds": "Kottler",
                    "bardeen": "Bardeen", "hayward": "Hayward"}
    rotating_names = {"rotating-bardeen": "RotatingBardeen",
                      "rotating-hayward": "RotatingHayward"}
    if args.metric == 'kerr-ds':
        # spin + cosmological constant: the orbit band is FINITE on both
        # ends (ISCO inside, the Lambda tide's OSCO outside) — the sweep
        # clips r_max to the outer stability edge
        from ..physics.kerr_de_sitter import (epicyclic_kds, isco_kds,
                                              osco_kds)
        params = jnp.array([args.mass, args.spin, args.metric_param])
        r_isco = float(isco_kds(params, prograde))
        if not np.isfinite(r_isco):
            raise SystemExit(
                f"kerr-ds at (a, Lambda) = ({args.spin:g}, "
                f"{args.metric_param:g}) has no stable circular orbits "
                "— no QPO band")
        r_top = args.r_max * args.mass
        r_osco = float(osco_kds(params, prograde))
        if np.isfinite(r_osco):
            r_top = min(r_top, r_osco)
        r = jnp.linspace(r_isco, r_top, args.n)
        om_phi, kappa, om_th = jax.vmap(
            lambda rr: epicyclic_kds(rr, params, prograde))(r)
    elif args.metric in rotating_names:
        # rotating regular families: the mass-function epicyclic layer —
        # Lense-Thirring nodal precession survives but is weakened by
        # the regular core's smaller enclosed mass
        from ..physics.rotating_orbits import (epicyclic_rotating,
                                               isco_rotating)
        from ..physics.rotating_regular import MASS_FN
        m_fn = MASS_FN[rotating_names[args.metric]]
        params = jnp.array([args.mass, args.spin, args.metric_param])
        r_isco = float(isco_rotating(params, m_fn, prograde))
        if not np.isfinite(r_isco):
            raise SystemExit(
                f"{args.metric} at (a, p) = ({args.spin:g}, "
                f"{args.metric_param:g}) has no stable circular orbits "
                "— no QPO band")
        r = jnp.linspace(r_isco, args.r_max * args.mass, args.n)
        om_phi, kappa, om_th = jax.vmap(
            lambda rr: epicyclic_rotating(rr, params, m_fn, prograde))(r)
    elif args.metric in static_names:
        # beyond-Kerr static families: the same observables from the
        # lapse function alone (physics/static_orbits) — the nodal
        # precession is identically zero, itself the discriminator
        from ..physics.static_metrics import STATIC_F
        from ..physics.static_orbits import epicyclic_static, isco_static
        f_fn = STATIC_F[static_names[args.metric]]
        params = jnp.array([args.mass, args.metric_param, 0.0])
        r_isco = float(isco_static(f_fn, params))
        if not np.isfinite(r_isco):
            raise SystemExit(
                f"{args.metric} with parameter {args.metric_param:g} has "
                "no stable circular orbits — no QPO band")
        r = jnp.linspace(r_isco, args.r_max * args.mass, args.n)
        # spherical symmetry: retrograde orbits are the mirror image of
        # prograde ones — identical |frequencies| (unlike Kerr)
        om_phi, kappa, om_th = jax.vmap(
            lambda rr: epicyclic_static(rr, f_fn, params))(r)
    else:
        from ..physics.epicyclic import epicyclic_frequencies, isco_from_kappa
        params = jnp.array([args.mass, args.spin, args.charge])
        r_isco = float(isco_from_kappa(params, prograde))
        r = jnp.linspace(r_isco, args.r_max * args.mass, args.n)
        om_phi, kappa, om_th = jax.vmap(
            lambda rr: epicyclic_frequencies(rr, params, prograde))(r)

    # code units -> Hz (nu = Omega M_code / (2 pi M_phys); identity
    # scale when no physical mass is given, columns then in c^3/GM)
    scale = (args.mass / (2.0 * np.pi * mass_msun * T_SUN_S)
             if mass_msun else args.mass / (2.0 * np.pi))
    unit = "Hz" if mass_msun else "c^3/(2 pi G M)"
    r_np = np.asarray(r)
    nu = {k: np.asarray(v) * scale for k, v in
          [("nu_phi", om_phi), ("nu_r", kappa), ("nu_theta", om_th)]}
    nu["nu_periastron"] = nu["nu_phi"] - nu["nu_r"]
    nu["nu_nodal"] = nu["nu_phi"] - nu["nu_theta"]

    os.makedirs(args.out_dir, exist_ok=True)
    csv_path = os.path.join(args.out_dir, "qpo_frequencies.csv")
    cols = ["nu_phi", "nu_r", "nu_theta", "nu_periastron", "nu_nodal"]
    header = "r_over_M," + ",".join(f"{c}_{unit.split()[0]}" for c in cols)
    np.savetxt(csv_path, np.column_stack(
        [r_np / args.mass] + [nu[c] for c in cols]),
        delimiter=",", header=header, comments="")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(7, 5))
    for c, style in zip(cols, ["-", "-", "-", "--", "--"]):
        ax.plot(r_np / args.mass, nu[c], style, label=c.replace("_", " "))
    ax.axvline(r_isco / args.mass, color="gray", lw=0.8, ls=":",
               label=f"ISCO {r_isco / args.mass:.3f} M")
    ax.set_xlabel("r / M")
    ax.set_ylabel(f"frequency [{unit}]")
    ax.set_yscale("log")
    sense = "prograde" if prograde else "retrograde"
    if args.metric in static_names:
        ax.set_title(f"epicyclic frequencies  {static_names[args.metric]} "
                     f"param={args.metric_param:g} ({sense})")
    elif args.metric in rotating_names:
        ax.set_title(f"epicyclic frequencies  "
                     f"{rotating_names[args.metric]} a={args.spin} "
                     f"param={args.metric_param:g} ({sense})")
    else:
        ax.set_title(f"epicyclic frequencies  a={args.spin} "
                     f"Q={args.charge} ({sense})")
    ax.legend(fontsize=8)
    fig.tight_layout()
    png_path = os.path.join(args.out_dir, "qpo_frequencies.png")
    fig.savefig(png_path, dpi=120)
    plt.close(fig)

    i_max = int(np.argmax(nu["nu_r"]))

    # 3:2 epicyclic resonance radius (twin-peak HF QPOs): the unique
    # crossing of nu_theta / nu_r = 3/2 outside the nu_r maximum (the
    # ratio falls monotonically from infinity at the ISCO toward 1),
    # linearly interpolated on the sweep grid
    h = 2.0 * nu["nu_theta"] - 3.0 * nu["nu_r"]
    r32 = nu32_hi = nu32_lo = None
    cross = np.nonzero((h[:-1] > 0) & (h[1:] <= 0))[0]
    if cross.size:
        i = int(cross[-1])
        w = h[i] / (h[i] - h[i + 1])
        r32 = float((1 - w) * r_np[i] + w * r_np[i + 1]) / args.mass
        nu32_hi = float((1 - w) * nu["nu_theta"][i]
                        + w * nu["nu_theta"][i + 1])
        nu32_lo = nu32_hi * 2.0 / 3.0

    metrics = {
        "r_32_resonance_over_M": r32,
        "nu_32_upper": nu32_hi, "nu_32_lower": nu32_lo,
        "r_isco_over_M": r_isco / args.mass,
        "nu_phi_isco": float(nu["nu_phi"][0]),
        "nu_r_max": float(nu["nu_r"][i_max]),
        "r_nu_r_max_over_M": float(r_np[i_max] / args.mass),
        "unit": unit,
        "metric": args.metric, "metric_param": args.metric_param,
        "spin": args.spin, "charge": args.charge, "prograde": prograde,
        "mass_msun": mass_msun,
        "csv": csv_path, "png": png_path,
    }
    print(json.dumps(metrics))
    return metrics


def console(argv=None):
    main(argv)
    return 0


if __name__ == "__main__":
    main()
