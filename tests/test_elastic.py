"""Multi-host dataset sharding (data/elastic.py): disjoint balanced
shards, SPMD-lockstep batch counts, and global batch assembly on the
virtual mesh."""

import numpy as np
import pytest

from mggan_tpu.data import elastic
from mggan_tpu.data.batcher import PaddedBatcher
from mggan_tpu.data.loaders import get_dataloader
from mggan_tpu.data.synthetic import make_synthetic_dataset


@pytest.mark.parametrize("interleave", [True, False])
@pytest.mark.parametrize("pc", [1, 3, 4])
def test_shards_disjoint_balanced_complete(interleave, pc):
    ds = make_synthetic_dataset(num_windows=22, seed=0)
    shards = [
        elastic.shard_windows(ds, p, pc, interleave=interleave)
        for p in range(pc)
    ]
    sizes = [len(s) for s in shards]
    assert sum(sizes) == len(ds)
    assert max(sizes) - min(sizes) <= 1
    # disjoint + complete: each window's trajectory array appears once
    seen = []
    for s in shards:
        seen.extend(id(t) for t in s.trajectories)
    assert sorted(seen) == sorted(id(t) for t in ds.trajectories)
    # determinism
    again = elastic.shard_windows(ds, 0, pc, interleave=interleave)
    assert [id(t) for t in again.trajectories] == [
        id(t) for t in shards[0].trajectories
    ]


def test_lockstep_batch_counts_agree():
    from mggan_tpu.data.loaders import get_dataset

    ds = get_dataset("synthetic_memory", "train")
    pc, bs = 4, 3
    n_steps = elastic.lockstep_batches(len(ds), pc, bs)
    for p in range(pc):
        loader = get_dataloader(
            "synthetic_memory", "train", batch_size=bs,
            shard_by_process=True, process_index=p, process_count=pc,
        )
        batches = list(loader)
        assert len(batches) == len(loader) == n_steps
        for b in batches:
            assert b["xy"].shape[0] == bs  # static shapes incl. padding


def test_lockstep_padding_is_masked():
    """A host whose shard runs short yields all-masked empty batches that
    carry the -1 window sentinel (patch-bank / eval contract)."""
    ds = make_synthetic_dataset(num_windows=5, seed=0)
    shard = elastic.shard_windows(ds, 2, 3)  # 1 window
    loader = PaddedBatcher(shard, batch_size=2, num_batches=3)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["ped_mask"].any()
    for b in batches[1:]:
        assert not b["ped_mask"].any()
        assert (b["window_idx"] == -1).all()


def test_sharded_loader_uses_global_max_peds():
    """max_peds must come from the GLOBAL dataset, not the local shard:
    per-shard derivation would give hosts different (S, P) program shapes
    and break SPMD lockstep (collectives mismatch across the pod)."""
    from mggan_tpu.data.loaders import get_dataset

    global_max = max(
        len(t) for t in get_dataset("synthetic_memory", "train").trajectories
    )
    loaders = [
        get_dataloader(
            "synthetic_memory", "train", batch_size=2,
            shard_by_process=True, process_index=p, process_count=16,
        )
        for p in range(16)
    ]
    shard_maxes = [max(len(t) for t in ld.ds.trajectories) for ld in loaders]
    # at least one local shard must lack a global-max scene, else vacuous
    assert min(shard_maxes) < global_max
    assert all(ld.max_peds == global_max for ld in loaders)


def test_pad_scenes_preserves_sentinels_and_none():
    """pad_scenes_to_multiple pads window_idx with the -1 empty-scene
    sentinel (zero would alias window 0) and passes None leaves (image-free
    datasets) through untouched."""
    import jax.numpy as jnp

    from mggan_tpu.parallel import dp

    batch = {
        "xy": jnp.ones((3, 2, 20, 2)),
        "ped_mask": jnp.ones((3, 2), bool),
        "window_idx": jnp.arange(3),
        "patches": None,
    }
    padded = dp.pad_scenes_to_multiple(batch, 4)
    assert padded["patches"] is None
    assert padded["xy"].shape[0] == 4
    np.testing.assert_array_equal(np.asarray(padded["window_idx"]),
                                  [0, 1, 2, -1])
    assert not bool(padded["ped_mask"][3].any())


def test_make_global_batch_single_process_mesh():
    import jax

    from mggan_tpu.parallel.mesh import make_mesh

    ds = make_synthetic_dataset(num_windows=8, seed=0)
    loader = PaddedBatcher(ds, batch_size=8)
    batch = next(iter(loader))
    mesh = make_mesh(dp=4, gp=1, slices=2)
    gbatch = elastic.make_global_batch(batch, mesh)
    for k, v in gbatch.items():
        assert isinstance(v, jax.Array)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(batch[k]))
        # scene axis laid out over the 8 (slice, data) devices
        assert len(v.sharding.device_set) == 8
