"""Regenerate the README's observational-product figures (committed
under images/).  These are diagnostic plots, not performance claims, so
they render fine anywhere:

    python tools/product_figures.py            # on the chip
    JAX_PLATFORMS='' python - <<'PY'           # or force CPU first
    import jax; jax.config.update("jax_platforms", "cpu")
    import tools.product_figures as p; p.main()
    PY

Products:
    images/line_grid_demo.png      iron-line profile matrix (spin x incl)
    images/hotspot_astrometry.png  flare centroid track + light curve
    images/shadow_overlay_a09.png  Bardeen critical curve on the render
"""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "images")


def main(size=160, steps=10_000, delta=0.03):
    from grtrace.cli import hotspot as hotspot_cli
    from grtrace.cli import line_grid as line_grid_cli
    from grtrace.cli import shadow as shadow_cli

    os.makedirs(OUT, exist_ok=True)
    ctx = tempfile.TemporaryDirectory(prefix="grtrace_figs_")
    tmp = ctx.name

    print("line grid...")
    line_grid_cli.main([
        "--spins", "0", "0.5", "0.9", "--inclinations", "20", "45", "70",
        "--size", str(size), "--steps", str(steps), "--delta", str(delta),
        "--emissivity", "3", "--out-dir", tmp])
    shutil.copy(os.path.join(tmp, "line_grid.png"),
                os.path.join(OUT, "line_grid_demo.png"))

    print("hot-spot astrometry...")
    hotspot_cli.main([
        "--size", str(size), "--metric", "kerr", "--spin", "0.9",
        "--steps", str(steps), "--delta", str(delta), "--frames", "48",
        "--no-gif", "--out-dir", os.path.join(tmp, "hs")])
    shutil.copy(os.path.join(tmp, "hs", "astrometry.png"),
                os.path.join(OUT, "hotspot_astrometry.png"))

    print("shadow overlay...")
    shadow_cli.main([
        "--spin", "0.9", "--azimuths", "128", "--render",
        "--size", str(max(size, 192)), "--steps", str(steps),
        "--delta", str(delta), "--out-dir", tmp])
    shutil.copy(os.path.join(tmp, "shadow_overlay.png"),
                os.path.join(OUT, "shadow_overlay_a09.png"))

    ctx.cleanup()          # (finalizer also fires on exceptions/exit)
    print(f"figures -> {OUT}")


if __name__ == "__main__":
    main()
