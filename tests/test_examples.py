"""The examples/ notebook-analogs stay runnable (reference parity:
tests/analysis.ipynb and tests/einsteinpy-geodesic-test/einsteinpy_ray.ipynb
made executable)."""
import importlib.util
import os
import sys

import numpy as np
import pandas as pd

EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_analyze_photon_data(tmp_path, capsys):
    mod = _load("analyze_photon_data")
    path = mod.render_default(str(tmp_path))
    df = pd.read_csv(path)
    counts = mod.summarize(df)
    out = capsys.readouterr().out
    assert "Photon summary" in out and "Shadow edge" in out
    assert counts.get("bh", 0) > 0 and counts.get("escape_bg", 0) > 0


def test_einsteinpy_ray_example(tmp_path, monkeypatch):
    mod = _load("einsteinpy_ray")
    out = str(tmp_path / "ray.png")
    mod.main([out])
    assert os.path.exists(out)


def test_observables_workflow(tmp_path):
    """The trace-once/derive-everything workflow example runs end to end
    (tiny scene) and drops every advertised product."""
    mod = _load("observables_workflow")
    out = mod.main(str(tmp_path), size=40, steps=2000, delta=0.1)
    for f in ("scene.transfer.npz", "disk.png", "disk_nt.png",
              "redshift_map.png", "shadow_overlay.png",
              "shadow_metrics.json", "visibility_amp.png",
              os.path.join("hotspot", "lightcurve.csv")):
        assert os.path.exists(os.path.join(out, f)), f
