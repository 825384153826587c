"""State checkpoint / resume.

The reference's checkpointing is explicit State()/SetState on every
processor (SURVEY.md §5.4). Here every processor already exposes its
state as a pytree; these helpers serialize any such pytree to a single
.npz file and restore it with the original structure — covering
streaming-resume across process restarts (biquad carries, conv reverb
FDLs, envelope followers, chain node states, ...).
"""

from __future__ import annotations

import io
import json

import numpy as np
import jax
import jax.numpy as jnp


def save_state(path: str, state) -> None:
    """Serialize a state pytree to an .npz with its treedef."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    # store the structure via flatten-with-path round trip instead of
    # eval: keep an example pytree skeleton in JSON where possible
    np.savez(path, **arrays)


def load_state(path: str, like):
    """Restore a pytree saved by save_state; `like` provides the
    structure (e.g. a freshly built init_state())."""
    data = np.load(path, allow_pickle=False)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        leaves.append(jnp.asarray(arr, dtype=np.asarray(ref).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
