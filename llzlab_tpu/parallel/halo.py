"""Halo exchange primitives for time-sequence parallelism (SURVEY.md §2d).

The DSP analog of blockwise ring attention: each time shard needs the last
``h`` input samples of its left neighbour (overlap-save history for FIR,
input history for the polyphase resampler).  One non-circular ``ppermute``
per block — nearest-neighbour ICI traffic (BASELINE.json:5 "exchanging
overlap-save edge samples ... via ICI collectives (ppermute halo
exchange)").  All functions here run *inside* ``shard_map``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from llzlab_tpu.parallel.mesh import TIME_AXIS

__all__ = ["left_halo", "broadcast_from_last", "axis_size_static"]


def left_halo(
    x_local: jnp.ndarray,
    h: int,
    *,
    axis_name: str = TIME_AXIS,
    first_shard_value: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fetch the last ``h`` samples (last axis) of the left neighbour.

    Shard 0 receives ``first_shard_value`` (the carried stream history for
    super-block streaming) or zeros.  Non-circular: uses a shifted
    ppermute so no wrap-around traffic exists.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    send = x_local[..., -h:]
    recv = lax.ppermute(
        send, axis_name, [(i, i + 1) for i in range(n - 1)]
    )  # shard 0 receives zeros
    if first_shard_value is not None:
        recv = jnp.where(idx == 0, first_shard_value.astype(recv.dtype), recv)
    return recv


def broadcast_from_last(
    value_local: jnp.ndarray, *, axis_name: str = TIME_AXIS
) -> jnp.ndarray:
    """Return the last shard's ``value_local`` on every shard (used to
    surface the global stream tail as a replicated streaming state)."""
    gathered = lax.all_gather(value_local, axis_name)  # (n, ...)
    return gathered[-1]


def axis_size_static(mesh, axis_name: str) -> int:
    return mesh.shape[axis_name]
