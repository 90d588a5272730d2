"""Platform bootstrap helpers (SURVEY.md layer T0).

This environment's sitecustomize registers the TPU chip behind the
``axon`` PJRT plugin and force-sets ``jax_platforms='axon,cpu'``; a plain
CPU run (tests, golden generation) must re-pin the platform before the
first backend initialisation, and a TPU run should claim the chip once
per process.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["force_cpu", "cpu_mesh_devices", "on_tpu", "device_kind",
           "fetch"]


def fetch(x):
    """``np.asarray`` that survives backends without complex-array
    transfer or eager complex dispatch (this environment's axon tunnel
    raises UNIMPLEMENTED on both — r3 finding): complex arrays are
    split to (real, imag) ON DEVICE under jit and recombined on the
    host.  Real arrays pass straight through."""
    import numpy as np
    import jax.numpy as jnp

    if jnp.iscomplexobj(x):
        r, i = jax.jit(
            lambda v: (jnp.real(v), jnp.imag(v))
        )(x)
        return np.asarray(r).astype(np.complex128) + 1j * np.asarray(
            i, np.float64
        )
    return np.asarray(x)


def force_cpu(n_devices: Optional[int] = None) -> None:
    """Pin this process to the CPU backend (optionally with ``n_devices``
    virtual devices — only effective if called before jax backend init)."""
    if n_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    jax.config.update("jax_platforms", "cpu")


def cpu_mesh_devices(n: int = 8):
    """Devices for a simulated n-way CPU mesh (test fixture)."""
    devs = jax.devices("cpu")
    if len(devs) < n:
        raise RuntimeError(
            f"need {n} CPU devices; start the process with "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n}"
        )
    return devs[:n]


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def device_kind() -> str:
    return jax.devices()[0].device_kind
