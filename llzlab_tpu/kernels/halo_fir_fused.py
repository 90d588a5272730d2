"""Pallas kernel: FUSED halo-exchange + block2 FIR compute (SURVEY.md
§2c.1 "fused halo-exchange via make_async_remote_copy", §7 hard part 4).

Capability parity target: the reference is serial C with no
communication (mount empty); this is the TPU-native overlap form of the
overlap-save edge exchange named in BASELINE.json:5.

`kernels/halo_ring.py` performs the halo RDMA as a standalone kernel —
the transfer completes before any FIR work starts.  Here the exchange
and the compute live in ONE kernel and genuinely overlap:

  grid step 0          : start the async remote copy of this shard's
                         input tail to the right neighbour (DMA flies
                         from here on), then compute y-block 1
  grid steps 1..n−2    : compute y-blocks 2..n−1 (no halo dependence —
                         block j needs input blocks (j−1, j) only)
  grid step n−1 (last) : wait on the receive semaphore, then compute
                         y-block 0, whose LEFT operand is the received
                         halo (or the carried stream history on time
                         shard 0)

The only data that waits on the interconnect is the one block that
mathematically needs it; every other block's (VMEM-prefetched) matmuls
run while the DMA is in flight.  The compute per block reproduces
``kernels/block2_fir.py``'s banded-window dot sequence operand-for-
operand, so the output is BITWISE equal to running the standalone halo
exchange followed by the block2 kernel.

Same 1-D-mesh limitation as halo_ring.py (jax dma_start cannot address
peers on multi-axis meshes); `use_rdma=False` keeps a ppermute fallback
permanently (the halo is fetched up front, the same grid then runs with
the exchange already resolved — correct everywhere, just unfused).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llzlab_tpu.kernels.block2_fir import band_k, block2_pallas_tables
from llzlab_tpu.ops.fir import block2_block
from llzlab_tpu.parallel.mesh import TIME_AXIS

__all__ = ["block2_fir_halo_fused", "halo_fused_supports"]


def halo_fused_supports(channels: int, ntaps: int, t_local: int) -> bool:
    """Shape envelope: ≥2 whole blocks per shard, lane-aligned block,
    bounded channel count (single channel tile per program)."""
    block = block2_block(ntaps)
    if not (ntaps - 1 <= block and block % 128 == 0):
        return False
    if channels < 1 or channels > 256:
        return False
    nblk = t_local // block
    return nblk >= 2 and t_local == nblk * block


def _dots(mode, s, tables_refs, block, kb):
    """The block2 banded dot sequence — operand-for-operand identical to
    kernels/block2_fir.py's _kernel_high/_kernel_highest (bitwise-equal
    output is what the tests pin)."""
    nt = block // 128
    cols = []
    if mode == "high":
        whi_ref, wlo_ref = tables_refs
        s_hi = s.astype(jnp.bfloat16)
        s_lo = (s - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def dot(a, b):
            return lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        for g in range(nt):
            ms = g * 128 + block + 128 - kb
            sh = s_hi[:, ms : ms + kb]
            sl = s_lo[:, ms : ms + kb]
            cols.append(dot(sh, whi_ref[g]) + dot(sl, whi_ref[g])
                        + dot(sh, wlo_ref[g]))
    else:
        (w_ref,) = tables_refs
        for g in range(nt):
            ms = g * 128 + block + 128 - kb
            cols.append(lax.dot_general(
                s[:, ms : ms + kb], w_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ))
    return jnp.concatenate(cols, axis=1)


def _kernel(nblk, block, kb, h, mode, use_rdma,
            xl_ref, xr_ref, tail_ref, carry_ref, *rest):
    if mode == "high":
        tables_refs = rest[:2]
        o_ref = rest[2]
    else:
        tables_refs = rest[:1]
        o_ref = rest[1]
    halo_ref, send_sem, recv_sem = rest[-3:]

    i = pl.program_id(0)
    n = lax.axis_size(TIME_AXIS)
    my = lax.axis_index(TIME_AXIS)

    if use_rdma:
        rdma = pltpu.make_async_remote_copy(
            src_ref=tail_ref,
            dst_ref=halo_ref,
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=lax.rem(my + 1, n),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

        @pl.when(i == 0)
        def _start():
            rdma.start()

    # steps 0..nblk-2: interior y-blocks (i+1) — no halo dependence
    @pl.when(i < nblk - 1)
    def _interior():
        s = jnp.concatenate([xl_ref[:, :], xr_ref[:, :]], axis=1)
        o_ref[:, :] = _dots(mode, s, tables_refs, block, kb)

    # last step: resolve the exchange, then y-block 0
    @pl.when(i == nblk - 1)
    def _boundary():
        if use_rdma:
            rdma.wait()
            halo = jnp.where(my == 0, carry_ref[:, :], halo_ref[:, :])
        else:
            # unfused fallback: the exchange was resolved by ppermute
            # before the kernel; carry_ref holds every shard's halo
            halo = carry_ref[:, :]
        b = halo.shape[0]
        if h < block:
            # taps beyond ntaps−1 are zero, so the left block's leading
            # samples never contribute — pad freely
            halo = jnp.concatenate(
                [jnp.zeros((b, block - h), jnp.float32), halo], axis=1
            )
        s = jnp.concatenate([halo, xr_ref[:, :]], axis=1)
        o_ref[:, :] = _dots(mode, s, tables_refs, block, kb)


@functools.partial(
    jax.jit,
    static_argnames=("block", "h", "mode", "interpret", "use_rdma",
                     "collective_id"),
)
def _halo_fused_jit(x_local, tail, carry, tables, *, block, h, mode,
                    interpret, use_rdma, collective_id):
    b, t = x_local.shape
    nblk = t // block
    kb = tables[0].shape[1]

    def lm(i):
        return (0, jnp.where(i == nblk - 1, 0, i))

    def rm(i):
        return (0, jnp.where(i == nblk - 1, 0, i + 1))

    wspecs = [
        pl.BlockSpec(w.shape, (lambda i, _n=w.ndim: (0,) * _n),
                     memory_space=pltpu.VMEM)
        for w in tables
    ]
    return pl.pallas_call(
        functools.partial(_kernel, nblk, block, kb, h, mode, use_rdma),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((b, block), lm, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, block), rm, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=pl.BlockSpec((b, block), rm, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=collective_id,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_local, x_local, tail, carry, *tables)


def block2_fir_halo_fused(
    x_local: jnp.ndarray,
    taps,
    *,
    first_shard_value: Optional[jnp.ndarray] = None,
    mode: str = "high",
    use_rdma: bool = True,
    interpret: Optional[bool] = None,
    collective_id: int = 15,
) -> jnp.ndarray:
    """Inside shard_map on a 1-D ``(time,)`` mesh: halo-exchange +
    block2 FIR in one overlapped kernel.

    ``x_local (C, T_loc)``; returns the local FIR output ``(C, T_loc)``
    such that concatenating shard outputs equals the unsharded
    ``fir_filter(method="block2")`` stream (time shard 0 starts from
    ``first_shard_value`` — the carried ``ntaps−1`` input history — or
    zeros).  ``use_rdma=False`` fetches the halo with the permanent
    ppermute fallback and runs the same grid unfused.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    taps_np = np.asarray(jax.device_get(taps), np.float64)
    ntaps = len(taps_np)
    block = block2_block(ntaps)
    b, t = x_local.shape
    # history width: ntaps−1 minimum; callers may carry a full block
    # (the block2 streaming-state contract, ops/fir.fir_state_len)
    h = (ntaps - 1 if first_shard_value is None
         else int(first_shard_value.shape[-1]))
    if not (ntaps - 1 <= h <= block):
        raise ValueError(
            f"history width {h} outside [{ntaps - 1}, {block}]"
        )
    if not halo_fused_supports(b, ntaps, t):
        raise ValueError(
            f"unsupported shape for halo-fused FIR: C={b} ntaps={ntaps} "
            f"T_loc={t} (need >=2 whole {block}-blocks)"
        )
    tables = block2_pallas_tables(taps_np, block, mode)
    x_local = x_local.astype(jnp.float32)
    carry = (jnp.zeros((b, h), jnp.float32) if first_shard_value is None
             else first_shard_value.reshape(b, h).astype(jnp.float32))
    tail = x_local[:, -h:]
    if not use_rdma:
        from llzlab_tpu.parallel.halo import left_halo

        # permanent fallback: resolve the exchange up front (ppermute),
        # then run the same grid with carry as every shard's halo
        carry = left_halo(x_local, h, first_shard_value=carry)
    return _halo_fused_jit(
        x_local, tail, carry, tables, block=block, h=h, mode=mode,
        interpret=interpret, use_rdma=use_rdma,
        collective_id=collective_id,
    )
