"""Failure detection: lightweight heartbeat collectives (SURVEY.md §5).

XLA meshes are static — there is no elastic recovery; the mechanism is
detect-fast + restart-from-checkpoint (scripts/multihost_fir_demo.py
demonstrates the full kill/restart loop).  The heartbeat here is the
detection half: a zero-byte-scale psum across the mesh every N blocks.
A hung or dead peer turns the heartbeat into a distributed deadlock that
surfaces as a timeout in the caller rather than silent data corruption;
a NaN/Inf payload surfaces numerical poisoning of any shard.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

__all__ = ["heartbeat", "Heartbeat"]


def heartbeat(mesh, payload: Optional[jnp.ndarray] = None) -> dict:
    """One synchronous heartbeat over every mesh axis.

    Returns {"ok": bool, "rtt_s": float, "devices": int}.  ``payload``
    (any array) is finiteness-checked through the same collective, so a
    shard that produced NaN/Inf is reported.
    """
    axes = tuple(mesh.axis_names)

    def local(v):
        s = jnp.sum(v)
        for ax in axes:
            s = lax.psum(s, ax)
        return jnp.reshape(jnp.isfinite(s), (1,))

    x = (
        jnp.zeros((mesh.devices.size,), jnp.float32)
        if payload is None
        else jnp.ravel(payload).astype(jnp.float32)
    )
    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=P(axes if len(axes) > 1 else axes[0]),
            out_specs=P(None),
            check_vma=False,
        )
    )
    t0 = time.perf_counter()
    ok = bool(np.asarray(fn(x))[0])
    rtt = time.perf_counter() - t0
    return {"ok": ok, "rtt_s": rtt, "devices": int(mesh.devices.size)}


class Heartbeat:
    """Every-N-blocks heartbeat helper for streaming loops."""

    def __init__(self, mesh, every: int = 16):
        self.mesh = mesh
        self.every = max(int(every), 1)
        self._count = 0
        self.last: Optional[dict] = None

    def tick(self, payload: Optional[jnp.ndarray] = None) -> Optional[dict]:
        self._count += 1
        if self._count % self.every:
            return None
        self.last = heartbeat(self.mesh, payload)
        if not self.last["ok"]:
            raise FloatingPointError(
                "heartbeat detected non-finite values on some shard"
            )
        return self.last
