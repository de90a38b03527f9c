from . import artifacts, scene, transfer
