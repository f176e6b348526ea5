"""Checkpoint / resume for the gradient-fit task.

The reference persists nothing but the final PPM (main.cpp:501).  The only
stateful computation in this framework is scene-parameter optimisation
(raytpu.grad.fit_scene), whose state is a (scene, opt_state) pytree pair —
saved as a flat .npz plus the treedef captured on restore, which keeps the
format dependency-free and byte-stable (orbax would also work; the pytrees
here are small enough that atomic-rename npz is the simpler, more portable
choice).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_checkpoint(path: str, pytree) -> None:
    """Atomically write a pytree's leaves to `path` (.npz)."""
    leaves = jax.tree_util.tree_leaves(pytree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, like):
    """Restore a pytree saved by save_checkpoint, shaped `like`."""
    leaves, treedef = jax.tree_util.tree_flatten(like)
    with np.load(path) as data:
        if len(data.files) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(data.files)} leaves, expected "
                f"{len(leaves)}")
        restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp

    out = [jnp.asarray(r, np.asarray(l).dtype)
           for r, l in zip(restored, leaves)]
    for r, l in zip(out, leaves):
        if r.shape != np.shape(l):
            raise ValueError(f"leaf shape mismatch: {r.shape} vs {np.shape(l)}")
    return jax.tree_util.tree_unflatten(treedef, out)
