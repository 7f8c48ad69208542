"""Multi-host dataset sharding + global batch assembly.

The reference is strictly single-process: its DataLoader workers all read
the same filesystem view (data_loaders.py:92-99) and there is no notion of
a pod. On multi-host TPU, each HOST must feed only its own addressable
devices, and every host must dispatch the SAME number of identically-shaped
programs per epoch (SPMD lockstep — a host that runs out of batches early
deadlocks the collectives). This module provides:

* ``shard_windows``      — deterministic, balanced, disjoint partition of a
                           SceneDataset's windows across processes;
* ``lockstep_batches``   — the per-host batch count every host must run,
                           computed from GLOBAL quantities only;
* ``make_global_batch``  — per-host local batch -> one globally-sharded
                           jax.Array over the mesh's (slice, data) axes.

Scenes stay atomic (a window never straddles hosts), matching the
scene-atomic shard invariant of parallel/dp.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mggan_tpu.data.dataset import SceneDataset


def _live_process_info():
    import jax

    return jax.process_index(), jax.process_count()


def shard_windows(ds: SceneDataset, process_index: int | None = None,
                  process_count: int | None = None,
                  interleave: bool = True) -> SceneDataset:
    """Return the sub-dataset of windows owned by ``process_index``.

    Deterministic given (len(ds), process_count): every window belongs to
    exactly one process and shard sizes differ by at most 1. ``interleave``
    assigns round-robin (process p takes windows p, p+P, p+2P, ...) so each
    host sees every scene/size mix; ``False`` gives contiguous blocks
    (better file locality if callers later shard at the file level).
    Defaults read the live ``jax.process_index()/process_count()``.
    """
    if process_index is None or process_count is None:
        process_index, process_count = _live_process_info()
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} not in "
                         f"[0, {process_count})")
    n = len(ds)
    if interleave:
        idxs = list(range(process_index, n, process_count))
    else:
        base, rem = divmod(n, process_count)
        start = process_index * base + min(process_index, rem)
        stop = start + base + (1 if process_index < rem else 0)
        idxs = list(range(start, stop))
    return dataclasses.replace(
        ds,
        trajectories=[ds.trajectories[i] for i in idxs],
        scene_names=[ds.scene_names[i] for i in idxs],
        big_patches=(
            [ds.big_patches[i] for i in idxs] if ds.big_patches else None
        ),
        ped_ids=[ds.ped_ids[i] for i in idxs] if ds.ped_ids else None,
    )


def lockstep_batches(global_windows: int, process_count: int,
                     local_batch_size: int) -> int:
    """Per-host batch count for SPMD lockstep: every host runs this many
    batches per epoch (short hosts pad all-masked empty batches). Computed
    from global quantities only, so all hosts agree without communication.
    """
    max_shard = -(-global_windows // process_count)  # ceil
    return max(1, -(-max_shard // local_batch_size))


def make_global_batch(local_batch: dict, mesh):
    """Assemble per-host local numpy batches into global jax.Arrays sharded
    over the mesh's (slice, data) scene axis.

    Single-process: a plain ``device_put`` with the batch sharding (the
    existing dp.py path). Multi-process: each host contributes its local
    scene rows via ``jax.make_array_from_process_local_data`` — no
    cross-host data movement; XLA addresses each host's shard locally.

    Leaves may be host numpy OR process-local device arrays (the
    shard-local patch bank's gathered ``big_patches``,
    data/patch_bank.py::maybe_build_bank): ``np.asarray`` fetches device
    leaves before reassembly. The D2H bounce costs one contiguous copy —
    still far cheaper than the per-ped host assembly loop it replaces.
    """
    import jax
    from mggan_tpu.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )
