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
