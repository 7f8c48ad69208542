"""Device mesh + sharding layout.

The reference is strictly single-device (SURVEY.md §2: no DP/TP/PP anywhere);
the TPU build adds two parallel axes (SURVEY.md §5 "distributed backend"):

* ``data``  — scenes of the padded batch are sharded over ICI; scenes are
  atomic (all peds of a scene live on one shard), mirroring the
  ``seq_start_end`` sub-batch semantics.  Gradients are all-reduced by XLA
  (GSPMD inserts psums for the global masked means/sums).
* ``model`` — the stacked generator-decoder axis (the vmap over N
  generators) can be sharded, giving an intra-model parallel axis the
  reference expresses as a Python loop (standard.py:255-261).  The sharding
  applies to the decoder params AND their optimizer moments (matched by tree
  path), so the whole optimizer update stays local to the shard.

All other parameters are replicated.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, GetAttrKey, tree_map_with_path


def make_mesh(dp: int | None = None, gp: int = 1, slices: int = 1,
              devices=None) -> Mesh:
    """(slice, data, model) mesh.

    ``slices`` is the DCN axis for multi-slice pods: scenes shard over
    (slice, data) jointly, parameters replicate across slices, and GSPMD's
    gradient psum over the combined axes becomes an ICI reduce-scatter
    within each slice plus one cross-slice all-reduce over DCN — scenes
    stay atomic within a shard either way. On a single slice the axis has
    size 1 and is free. For real multi-slice hardware pass ``devices`` from
    ``mesh_utils.create_hybrid_device_mesh`` so the slice axis follows the
    DCN topology.
    """
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // (gp * slices)
    assert slices * dp * gp <= len(devices), (slices, dp, gp, len(devices))
    arr = np.array(devices[: slices * dp * gp]).reshape(slices, dp, gp)
    return Mesh(arr, ("slice", "data", "model"))


def data_shard_count(mesh: Mesh) -> int:
    return mesh.shape["slice"] * mesh.shape["data"]


def batch_sharding(mesh: Mesh):
    """Scene axis sharded over (slice, data); everything else replicated."""
    return NamedSharding(mesh, P(("slice", "data")))


def batch_shardings(mesh: Mesh, batch_tree):
    shard = batch_sharding(mesh)
    return jax.tree.map(lambda _: shard, batch_tree)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def _path_has_key(path, name: str) -> bool:
    for entry in path:
        if isinstance(entry, DictKey) and entry.key == name:
            return True
        if isinstance(entry, GetAttrKey) and entry.name == name:
            return True
    return False


def state_shardings(mesh: Mesh, state, shard_generators: bool = True):
    """Sharding tree for a full TrainState.

    Any leaf whose tree path passes through a ``decoders`` key (the stacked
    generator pytree — in g_params and in the AdamW moments inside g_opt) is
    sharded over ``model`` on its leading axis; everything else replicated.
    """
    rep = replicated(mesh)
    gen = NamedSharding(mesh, P("model"))
    use_gp = shard_generators and mesh.shape["model"] > 1

    def pick(path, leaf):
        if use_gp and _path_has_key(path, "decoders") and hasattr(leaf, "ndim"):
            if leaf.ndim >= 1:
                return gen
        return rep

    return tree_map_with_path(pick, state)
