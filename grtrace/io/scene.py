"""Scene entities and render configuration.

Dataclass scene config replacing the reference's argparse-only flag system
(reference: config.py:4-33) and scene entities (simulation/blackhole.py:4-39).
Every reference flag is preserved by name in `RenderConfig` with its *actual*
default (several reference help strings contradict their defaults —
config.py:9-11 — and a few flags are parsed but dead; the dead ones are wired
up here deliberately and documented, per SURVEY.md section 5).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class BlackHole:
    """Schwarzschild black hole, geometrized units (r_s = 2M).

    Parity with reference simulation/blackhole.py:4-13.
    """
    mass: float = 1.0
    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    @property
    def rs(self) -> float:
        return 2.0 * self.mass


@dataclasses.dataclass
class Observer:
    """Pinhole-camera observer (reference simulation/blackhole.py:15-25)."""
    position: Tuple[float, float, float]
    fov: float                      # radians
    image_size: Tuple[int, int]     # (height, width)


@dataclasses.dataclass
class Photon:
    """Kept for API parity (defined but unused by the reference pipeline,
    simulation/blackhole.py:27-39)."""
    position: Tuple[float, float, float]
    direction: Tuple[float, float, float]
    mesh_idx: Tuple[int, int]
    collision: Optional[str] = None
    collision_pos: Optional[Tuple[float, float, float]] = None


@dataclasses.dataclass
class PatchConfig:
    """Background-patch geometry on the boundary sphere (radians)."""
    center_theta: float = np.pi / 2
    center_phi: float = np.pi
    size_theta: float = np.deg2rad(180)
    size_phi: float = np.deg2rad(360)
    flip_theta: bool = False
    flip_phi: bool = False


@dataclasses.dataclass
class IntegratorConfig:
    """Fixed-step FANTASY symplectic-integrator settings.

    Deliberate fix vs the reference: `omega` IS forwarded to the integrator
    (the reference parses --omega but never passes it on, so the class default
    omega=1.0 silently wins — raytracing.py:118 vs config.py:11; SURVEY.md
    section 3.2).  Set omega=1.0 to reproduce reference renders bit-for-bit;
    the CLI default preserves the reference's *effective* behavior.

    `order` in {2,4,6,8}: the reference CLI accepts these (config.py:14) but
    only ever implemented order 2 on its GPU (cuda_geodesic.py:569); here
    orders 4/6/8 are real Yoshida triple-jump compositions on every backend
    (physics/hamiltonian.py).  `steps` counts composed steps.
    """
    steps: int = 200_000
    delta: float = 0.01
    omega: float = 1.0
    order: int = 2
    rtol: float = 1e-2      # parsed-but-unused in the reference CUDA path; kept
    atol: float = 1e-2      #   for flag parity (config.py:12-13)
    backend: str = "auto"   # 'auto' | 'pallas' | 'xla'
    dtype: str = "float32"  # 'float32' | 'float64'


@dataclasses.dataclass
class SceneConfig:
    """Full scene — the union of every reference CLI flag (config.py:4-33)."""
    size: int = 200
    fov_deg: float = 80.0
    background: Optional[str] = "images/backgrounds/milky-way-equirec.jpg"
    bh_mass: float = 1.0
    # beyond the reference: metric selection (routing in engine.render,
    # case-insensitive).  'Schwarzschild' runs the specialized fast path;
    # 'kerr' (or 'KerrSchild') renders spinning holes through the
    # horizon-regular Cartesian Kerr-Schild chart — the production Kerr
    # path, matching the CLI's --metric kerr; 'kerr-bl' selects the
    # Boyer-Lindquist chart explicitly (its polar-axis coordinate
    # singularity can flag near-axis rays as numerical errors).  spin = a,
    # charge = Q with a^2 + Q^2 <= M^2 (Kerr-Newman family; charge != 0
    # always routes to the generic engines — Reissner-Nordstrom is
    # metric='Schwarzschild' with charge set).
    metric: str = "Schwarzschild"
    spin: float = 0.0
    charge: float = 0.0
    # beyond-Kerr static families (physics/static_metrics.py): the single
    # family parameter — Lambda for metric='kottler' (Schwarzschild-de
    # Sitter), magnetic charge g for 'bardeen', core length l for
    # 'hayward'.  Ignored by the Kerr-Newman family (use spin/charge).
    metric_param: float = 0.0
    boundary_radius: float = 31.0
    observer_distance: float = 30.0
    integrator: IntegratorConfig = dataclasses.field(default_factory=IntegratorConfig)
    patch: PatchConfig = dataclasses.field(default_factory=PatchConfig)
    n_samples: int = 20
    suppress_warnings: bool = False
    no_flat_trajectories: bool = False

    def __post_init__(self):
        # The reference classifies r >= 100 as 'numerical error' BEFORE the
        # boundary test (raytracing.py:213-215), and the blow-up guard parks
        # failed rays outside the domain (engine.integrate_generic) — both
        # implicitly require boundary_radius < 100.  Validate here instead
        # of silently misclassifying every escaped ray.
        if not (0.0 < self.boundary_radius < 100.0):
            raise ValueError(
                f"boundary_radius must be in (0, 100) (the reference's "
                f"r >= 100 numerical-error sentinel caps the domain); got "
                f"{self.boundary_radius}")
        if self.observer_distance >= self.boundary_radius:
            raise ValueError(
                f"observer_distance ({self.observer_distance}) must be "
                f"inside boundary_radius ({self.boundary_radius})")

    @property
    def fov(self) -> float:
        return float(np.radians(self.fov_deg))

    @property
    def image_size(self) -> Tuple[int, int]:
        return (self.size, self.size)

    def black_hole(self) -> BlackHole:
        return BlackHole(mass=self.bh_mass)

    def observer(self) -> Observer:
        return Observer(position=(self.observer_distance, 0.0, 0.0),
                        fov=self.fov, image_size=self.image_size)


def apply_relative_offsets(theta_base_deg, phi_base_deg,
                           dtheta_deg=0.0, dphi_deg=0.0):
    """Observer-relative patch aiming (reference simulation/utils.py:27-36)."""
    theta = np.clip(np.deg2rad(theta_base_deg) + np.deg2rad(dtheta_deg),
                    0.0, np.pi)
    phi = (np.deg2rad(phi_base_deg) + np.deg2rad(dphi_deg)) % (2 * np.pi)
    return theta, phi
