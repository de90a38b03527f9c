"""Accelerator environment probe — the analog of the reference's GPU probe
(reference: tests/cuda-test.py:3-25, which printed CUDA device
count/name/capability/memory/SMs via torch).

Prints the JAX platform, every visible device with its kind and memory
stats, the virtual-device configuration, and a one-op sanity check that
compiles and runs on each device.
"""
from __future__ import annotations

import sys


def probe(file=sys.stdout):
    import jax
    import jax.numpy as jnp

    def p(*a):
        print(*a, file=file)

    p(f"jax {jax.__version__}  backend={jax.default_backend()}")
    devs = jax.devices()
    p(f"{len(devs)} device(s) visible "
      f"({jax.local_device_count()} local, {jax.process_count()} process(es))")

    for d in devs:
        p(f"  [{d.id}] {d.device_kind}  platform={d.platform} "
          f"process={d.process_index}")
        try:
            ms = d.memory_stats()
            if ms:
                lim = ms.get("bytes_limit")
                use = ms.get("bytes_in_use")
                if lim:
                    p(f"       memory: {use / 2**30:.2f} / "
                      f"{lim / 2**30:.2f} GiB in use")
        except Exception:
            p("       memory: stats unavailable")

    # one-op sanity check per device (the reference multiplied on the GPU
    # implicitly by JIT-compiling; here it's explicit)
    ok = True
    for d in devs:
        try:
            x = jax.device_put(jnp.arange(8.0), d)
            y = jax.jit(lambda v: (v * v).sum())(x)
            assert float(y) == 140.0
            p(f"  [{d.id}] compile+run OK")
        except Exception as e:  # pragma: no cover - only on broken installs
            ok = False
            p(f"  [{d.id}] FAILED: {e}")
    return ok


def console():
    sys.exit(0 if probe() else 1)


if __name__ == "__main__":
    console()
