from . import grid, mesh
