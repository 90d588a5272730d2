"""Pallas ring halo exchange via inter-chip RDMA (SURVEY.md §2c.1, §2e).

The shard_map halo path (parallel/halo.py) uses ``lax.ppermute`` — XLA
schedules it as a standalone collective.  This kernel issues the same
nearest-neighbour transfer as an explicit ``make_async_remote_copy`` with
DMA semaphores, the latency-critical form that can be fused/overlapped
with compute on real pod slices (pattern: Pallas distributed guide /
SNIPPETS.md §2).  Semantics match ``halo.left_halo``: every shard sends
its tail one step right along ``time``; shard 0's received buffer is
replaced by the stream-carry (or zeros) by the caller-side mask.

A ``ppermute`` fallback stays available permanently (SURVEY.md §7 hard
part 4) — `left_halo_ring(..., use_rdma=False)` or parallel/halo.py.

Limitation: jax 0.9.0's ``dma_start`` only addresses peers on meshes
with ONE named axis — re-verified this round on the 8-device CPU mesh:
LOGICAL-scalar ids fail with "Sharding with more than one named axis not
implemented in dma_start_p for LOGICAL device_id_type" and MESH-tuple ids
with "Meshes with more than 1 named dimension not implemented in
dma_start_p".  The RDMA form therefore applies to time-only 1-D meshes
(``Channelizer.sharded_step(mesh, halo="rdma")`` exercises it); the 2-D
(channel, time) production mesh uses the ppermute path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llzlab_tpu.parallel.mesh import CHANNEL_AXIS, TIME_AXIS

__all__ = ["left_halo_ring"]


def _ring_send_kernel(axis_names, tail_ref, out_ref, send_sem, recv_sem):
    """Send ``tail_ref`` to the right neighbour on the time axis; receive
    the left neighbour's tail into ``out_ref`` (circular; caller masks
    shard 0)."""
    n = lax.axis_size(TIME_AXIS)
    my = lax.axis_index(TIME_AXIS)
    dst_t = lax.rem(my + 1, n)
    # Flat row-major logical id over the (channel, time) mesh — the
    # scalar LOGICAL form is the widest-supported device addressing.
    if CHANNEL_AXIS in axis_names:
        device_id = lax.axis_index(CHANNEL_AXIS) * n + dst_t
    else:
        device_id = dst_t
    rdma = pltpu.make_async_remote_copy(
        src_ref=tail_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=device_id,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()


def left_halo_ring(
    x_local: jnp.ndarray,
    h: int,
    *,
    axis_names=(CHANNEL_AXIS, TIME_AXIS),
    first_shard_value: Optional[jnp.ndarray] = None,
    use_rdma: bool = True,
    interpret: bool = False,
    collective_id: int = 13,
) -> jnp.ndarray:
    """Inside shard_map: fetch the left neighbour's last ``h`` samples.

    RDMA form of :func:`llzlab_tpu.parallel.halo.left_halo` (which is the
    ppermute fallback, selected with ``use_rdma=False``).
    """
    if not use_rdma:
        from llzlab_tpu.parallel.halo import left_halo

        return left_halo(
            x_local, h, first_shard_value=first_shard_value
        )

    tail = x_local[..., -h:]
    recv = pl.pallas_call(
        functools.partial(_ring_send_kernel, tuple(axis_names)),
        out_shape=jax.ShapeDtypeStruct(tail.shape, tail.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Distinct concurrent RDMA kernels need distinct ids (they
            # key the barrier); parametrized so chains can coordinate.
            collective_id=collective_id,
        ),
        interpret=interpret,
    )(tail)
    idx = lax.axis_index(TIME_AXIS)
    if first_shard_value is not None:
        recv = jnp.where(idx == 0, first_shard_value.astype(recv.dtype), recv)
    else:
        recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
    return recv
