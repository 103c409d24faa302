"""Checkpoint/resume of progressive rendering state.

The reference has none (SURVEY.md §5: errors kill the process, film state is
lost); this module adds restartable progressive rendering: film + pass count +
sampler seed state serialize to npz, so a killed job resumes mid-render.
Scene parameters (for inverse rendering) round-trip the same way.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    paths = [
        "/".join(str(p) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    ]
    return leaves, paths, treedef


def save_pytree(path: str, tree: Any) -> None:
    leaves, paths, _ = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__paths__"] = np.asarray(paths, dtype=object)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_pytree(path: str, like: Any) -> Any:
    z = np.load(path, allow_pickle=True)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    out = [jnp.asarray(z[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, out)


class ProgressiveCheckpoint:
    """Every-K-pass film checkpointing for a restartable pass loop."""

    def __init__(self, path: str, every: int = 16):
        self.path = path
        self.every = every

    def maybe_save(self, film, pass_idx: int) -> None:
        if (pass_idx + 1) % self.every == 0:
            save_pytree(self.path, {"film": film, "pass_idx": jnp.int32(pass_idx)})

    def load(self, film_like):
        if not os.path.exists(self.path):
            return None, 0
        state = load_pytree(self.path, {"film": film_like, "pass_idx": jnp.int32(0)})
        return state["film"], int(state["pass_idx"]) + 1
