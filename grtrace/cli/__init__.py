"""CLI drivers (application context — not imported by the library core).

Importing this package enables the persistent JAX compilation cache: every
driver here jits the deeply-unrolled Pallas kernels, whose Mosaic
compilation is minutes on a cold process, so for CLI use the cache is
effectively mandatory (one-time cost per machine).  Library users call
grtrace.enable_compilation_cache() explicitly instead.
"""
from .. import enable_compilation_cache

enable_compilation_cache()
