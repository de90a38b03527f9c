"""Procedural texture generators (io.textures) and the background-spec
loading path (io.artifacts) — the replacement for the reference's binary
panorama assets (SURVEY.md C17, reference config.py:8)."""
import numpy as np
import pytest

from grtrace.io import artifacts, textures


@pytest.mark.parametrize("name", sorted(textures.GENERATORS))
def test_generators_shape_dtype(name):
    img = textures.GENERATORS[name](64, 128)
    assert img.shape == (64, 128, 3)
    assert img.dtype == np.uint8
    assert img.max() > 0          # not all black


def test_starfield_deterministic():
    a = textures.starfield(32, 64, seed=7)
    b = textures.starfield(32, 64, seed=7)
    c = textures.starfield(32, 64, seed=8)
    assert (a == b).all()
    assert (a != c).any()


def test_from_spec_parsing():
    img = textures.from_spec("procedural:checker", size=(16, 32))
    assert img.shape == (16, 32, 3)
    img = textures.from_spec("procedural:starfield:5", size=(16, 32))
    assert img.shape == (16, 32, 3)
    with pytest.raises(ValueError):
        textures.from_spec("procedural:nope")
    with pytest.raises(ValueError):
        textures.from_spec("images/foo.jpg")


def test_load_background_procedural():
    # load_background takes size=(w, h) like PIL resize
    img = artifacts.load_background("procedural:graticule", size=(40, 20))
    assert img.shape == (20, 40, 3)
    assert artifacts.background_available("procedural:starfield")
    assert not artifacts.background_available("definitely/missing.jpg")
    assert not artifacts.background_available(None)


def test_probe_runs():
    import io
    from grtrace.cli.probe import probe
    buf = io.StringIO()
    assert probe(file=buf)
    out = buf.getvalue()
    assert "device(s) visible" in out
    assert "compile+run OK" in out
