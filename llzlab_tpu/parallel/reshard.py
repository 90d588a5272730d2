"""All-to-all reshard between time-major and channel-major layouts.

The Ulysses analog (SURVEY.md §2d): inside a chain, the FIR/resample
stages want full channels × sharded time (halo locality), while a frame
transform that straddles shard boundaries wants full time × sharded
channels.  The reshard swaps the sharded dimension with one all-to-all —
each device ends up with the full time range for a channel subset.

Two implementations:
* ``reshard`` — declarative ``with_sharding_constraint`` under jit; XLA
  emits the all-to-all (the production path — it fuses with neighbours).
* ``all_to_all_shard_map`` — explicit ``lax.all_to_all`` inside
  ``shard_map`` (the teaching/verification path; used by tests to pin
  down the exact collective semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llzlab_tpu.parallel.mesh import CHANNEL_AXIS, TIME_AXIS

__all__ = ["reshard", "to_channel_major", "to_time_major",
           "all_to_all_shard_map"]


def reshard(x: jnp.ndarray, mesh: Mesh, spec: P) -> jnp.ndarray:
    """Move ``x`` to ``NamedSharding(mesh, spec)`` (XLA inserts the
    collective — an all-to-all when a sharded axis migrates)."""
    return lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def to_channel_major(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """(C, T) from P(channel, time) → P(('channel','time'), None):
    every device holds full time for a channel subset."""
    return reshard(x, mesh, P((CHANNEL_AXIS, TIME_AXIS), None))


def to_time_major(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Inverse of :func:`to_channel_major`."""
    return reshard(x, mesh, P(CHANNEL_AXIS, TIME_AXIS))


def all_to_all_shard_map(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Explicit time-sharded → channel-sharded over the ``time`` axis.

    Local view goes from (C_loc, T_loc) to (C_loc/nt, T) via one
    ``lax.all_to_all`` on the channel dimension.  Requires
    ``C_loc % n_time == 0``.
    """
    nt = mesh.shape[TIME_AXIS]

    def local(x_l):
        # split channels into nt groups; trade channel groups for time.
        return lax.all_to_all(
            x_l, TIME_AXIS, split_axis=0, concat_axis=1, tiled=True
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(CHANNEL_AXIS, TIME_AXIS),
        out_specs=P((CHANNEL_AXIS, TIME_AXIS), None),
        check_vma=False,
    )(x)
