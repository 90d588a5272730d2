"""Streaming-state checkpoint/resume (SURVEY.md §5 checkpoint).

Reference counterpart: none (the C lab streams files start-to-finish).
Here: all streaming filter state is a tiny pytree (FIR history, biquad
(z1, z2), resampler phase history — a few KB per channel), dumped as an
``.npz`` with the block index and a config hash.  Resume is bit-identical
mid-stream: the state re-enters the same jitted region, and the block-
split invariance of every op (tests/ops/*streaming*) guarantees the
continuation equals the uninterrupted run.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

__all__ = ["save_state", "load_state"]


def _flatten(state) -> Tuple[list, Any]:
    leaves, treedef = jax.tree.flatten(state)
    return leaves, treedef


def save_state(
    path: str,
    state,
    *,
    block_index: int,
    config_hash: str = "",
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Dump a streaming-state pytree + stream position to ``path`` (.npz)."""
    leaves, treedef = _flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {
        "block_index": int(block_index),
        "config_hash": config_hash,
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "extra": extra or {},
    }
    np.savez(path, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    ), **arrays)


def load_state(path: str, like=None):
    """Load ``(state, block_index, meta)``.

    ``like``: an example state pytree (e.g. ``chain.init_state(...)``) used
    to restore the tree structure; leaves are filled positionally.  Without
    it, the flat leaf list is returned.
    """
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    if like is not None:
        ex_leaves, treedef = jax.tree.flatten(like)
        if len(ex_leaves) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves, template has "
                f"{len(ex_leaves)}"
            )
        state = jax.tree.unflatten(treedef, leaves)
    else:
        state = leaves
    return state, meta["block_index"], meta
