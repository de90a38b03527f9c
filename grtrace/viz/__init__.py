from . import plots
