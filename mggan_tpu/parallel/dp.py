"""Data-parallel (+ optional generator-parallel) train step over a mesh.

The step function is the same single-chip program; GSPMD partitions it from
the input shardings: the batch's scene axis rides the ``data`` ICI axis,
masked loss means/sums become cross-shard psums, and (when gp > 1) the
stacked-decoder vmap is split over ``model``, with the one-hot sample gather
contracting over the generator axis via an all-reduce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mggan_tpu.parallel.mesh import batch_shardings, replicated, state_shardings
from mggan_tpu.training.steps import build_train_step


def pad_scenes_to_multiple(batch, multiple: int):
    """Pad the leading scene axis of every leaf up to a multiple.

    Padded scenes are all-zero with ``ped_mask`` False everywhere, so they
    contribute nothing to the global masked reductions inside the step (the
    losses divide by the global mask count, never per-shard counts).
    """
    s = jax.tree.leaves(batch)[0].shape[0]
    rem = (-s) % multiple
    if rem == 0:
        return batch

    def pad(x, fill=0):
        widths = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(jnp.asarray(x), widths, constant_values=fill)

    if isinstance(batch, dict):
        # window_idx uses -1 as the "empty scene" sentinel (batcher.py);
        # zero-padding would alias window 0. None leaves (e.g. patches on
        # image-free datasets) pass through untouched.
        return {
            k: v if v is None else pad(v, fill=-1 if k == "window_idx" else 0)
            for k, v in batch.items()
        }
    return jax.tree.map(pad, batch)


def make_parallel_train_step(config, g_spec, d_spec, mesh, state, example_batch,
                             donate: bool = True):
    """Returns (sharded_step, sharded_state).

    ``state`` is re-laid-out according to the mesh; call the returned step
    with batches laid out by ``shard_batch`` (or plain host arrays — jit will
    move them). On a multi-process pod the device_put relies on every host
    holding an identical ``state`` (guaranteed: init is PRNG-keyed from the
    config seed and checkpoint restores are deterministic), so each host's
    addressable portion of the replicated layout comes from its local copy.
    """
    impl = build_train_step(config, g_spec, d_spec, jit=False)
    st_sh = state_shardings(mesh, state)
    b_sh = batch_shardings(mesh, example_batch)
    metrics_sh = None  # let GSPMD choose (scalars -> replicated)

    step = jax.jit(
        impl,
        in_shardings=(st_sh, b_sh),
        out_shardings=(st_sh, metrics_sh),
        donate_argnums=(0,) if donate else (),
    )
    state = jax.device_put(state, st_sh)
    return step, state


def shard_batch(mesh, batch):
    """Lay a padded (S, ...) batch out over the mesh's ``data`` axis.

    The scene axis must divide the data-axis size for an even layout; when
    it does not (e.g. ``batch_size`` not divisible by ``--dp``), empty
    masked scenes are appended first. All batches of an epoch therefore
    share one padded shape -> one compiled program.

    Single-process: a plain device_put of the (global == local) batch.
    Multi-process: ``batch`` is this host's LOCAL rows (the disjoint
    per-process window shard from data/elastic.py); the global array is
    assembled via ``make_array_from_process_local_data`` — device_put'ing
    a local batch as if it were global would silently drop every row
    outside this host's addressable shard. Local rows are padded to the
    per-process shard multiple so all shards stay equal-sized.
    """
    from mggan_tpu.parallel.mesh import data_shard_count

    procs = jax.process_count()
    if procs == 1:
        batch = pad_scenes_to_multiple(batch, data_shard_count(mesh))
        return jax.device_put(batch, batch_shardings(mesh, batch))

    from mggan_tpu.data.elastic import make_global_batch

    shards = data_shard_count(mesh)
    assert shards % procs == 0, (
        f"data shards ({shards}) must distribute evenly over "
        f"processes ({procs})"
    )
    batch = pad_scenes_to_multiple(batch, shards // procs)
    return make_global_batch(batch, mesh)
