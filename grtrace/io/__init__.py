from . import artifacts, scene
