"""Stage pipelining: chain stages on disjoint device groups (SURVEY.md §2d PP).

GPipe-style schedule over a 1-D ``stage`` axis: micro-blocks of the
stream flow through S stages; at step t, stage s processes micro-block
``t − s`` and hands its output to stage ``s+1`` with one neighbour
``ppermute`` — micro-batch = time-block, bubble = S−1 steps.

Constraint: stages must be shape-preserving ``(B, L) → (B, L)`` maps
(cascaded filter/gain stages).  Rate-changing stages (the resampler)
belong in the time-SP layout with an a2a reshard (parallel/reshard.py) —
this module exists for capability parity with pipeline parallelism and
for deep same-rate cascades, where it genuinely overlaps stage compute.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["stage_pipeline", "make_stage_mesh"]

STAGE_AXIS = "stage"


def make_stage_mesh(n_stages: int, devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_stages]), (STAGE_AXIS,))


def stage_pipeline(
    stage_fns: Sequence[Callable[[jnp.ndarray], jnp.ndarray]],
    mesh: Mesh,
    x: jnp.ndarray,
    *,
    micro_block: int,
) -> jnp.ndarray:
    """Run ``stage_fns[0] ∘ … ∘ stage_fns[-1]`` pipelined over the mesh.

    ``x (B, T)`` with ``T % micro_block == 0``.  Each stage function must
    be shape-preserving on ``(B, micro_block)`` blocks and stateless
    across blocks (wrap stateful filters with their own carried state
    outside, or use the time-SP ops instead).
    """
    s_count = len(stage_fns)
    if mesh.shape[STAGE_AXIS] != s_count:
        raise ValueError("mesh stage axis must equal number of stages")
    b, t = x.shape
    if t % micro_block:
        raise ValueError(f"T={t} not a multiple of micro_block={micro_block}")
    n_micro = t // micro_block
    n_steps = n_micro + s_count - 1

    def local(x_full):
        s = lax.axis_index(STAGE_AXIS)

        def apply_stage(blk):
            return lax.switch(s, [lambda v, f=f: f(v) for f in stage_fns], blk)

        def step(carry, ti):
            held, outputs = carry
            # Stage 0 ingests micro-block ti (if in range); others use held.
            feed_idx = jnp.clip(ti, 0, n_micro - 1)
            fresh = lax.dynamic_slice(
                x_full, (0, feed_idx * micro_block), (b, micro_block)
            )
            inp = jnp.where(s == 0, fresh, held)
            valid = (ti - s >= 0) & (ti - s < n_micro)
            out = jnp.where(valid, apply_stage(inp), jnp.zeros_like(inp))
            # pass to the next stage (ring ppermute, last drops)
            held_next = lax.ppermute(
                out, STAGE_AXIS,
                [(i, i + 1) for i in range(s_count - 1)],
            )
            # last stage records its finished micro-block
            out_idx = jnp.clip(ti - (s_count - 1), 0, n_micro - 1)
            record = (s == s_count - 1) & (ti - (s_count - 1) >= 0)
            outputs = lax.cond(
                record,
                lambda o: lax.dynamic_update_slice(
                    o, out, (0, out_idx * micro_block)
                ),
                lambda o: o,
                outputs,
            )
            return (held_next, outputs), None

        init = (
            jnp.zeros((b, micro_block), x_full.dtype),
            jnp.zeros_like(x_full),
        )
        (_, outputs), _ = lax.scan(step, init, jnp.arange(n_steps))
        # only the last stage holds real outputs; share via psum (others 0)
        mask = (s == s_count - 1).astype(x_full.dtype)
        return lax.psum(outputs * mask, STAGE_AXIS)

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False
    )
    return fn(x)
