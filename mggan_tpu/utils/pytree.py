"""Small pytree helpers (reference utils.py:38-39 param counting etc.)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def count_parameters(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def tree_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))


def relative_to_abs(rel_traj, start_pos):
    """Cumulative-sum integration (utils.py:70-83).

    rel_traj: (..., T, 2); start_pos: (..., 2) -> abs (..., T, 2).
    """
    return jnp.cumsum(rel_traj, axis=-2) + start_pos[..., None, :]
