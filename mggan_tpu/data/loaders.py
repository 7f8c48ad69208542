"""Loader factory (reference get_dataloader, data_loaders.py:10-100).

Returns a ``PaddedBatcher`` over a ``SceneDataset``.  Also fixes the
reference API drift where call sites unpack two values
(abstract_train.py:303, scripts/evaluate.py:134) from a single-return
factory — this function always returns one loader.
"""

from __future__ import annotations

from mggan_tpu.data.batcher import PaddedBatcher
from mggan_tpu.data.synthetic import make_synthetic_dataset

_SYNTH_CACHE = {}

# per-dataset patch-image scaling (data_loaders.py:30-87)
SCALING_SMALL = {
    "stanford_synthetic": 1.2,
    "stanford_synthetic_2": 1.2,
    "social_stanford_synthetic": 1.2,
    "stanford": 0.7,
    "eth": 0.5,
    "hotel": 0.5,
    "zara1": 0.5,
    "zara2": 0.5,
    "univ": 0.5,
    "gofp": 0.5,
}


def get_dataset(dataset: str, phase: str, data_root="./data/datasets", split=None):
    if dataset == "synthetic_memory":
        key = (phase,)
        if key not in _SYNTH_CACHE:
            seeds = {"train": 0, "val": 1, "test": 2}
            _SYNTH_CACHE[key] = make_synthetic_dataset(
                num_windows={"train": 48, "val": 16, "test": 16}[phase],
                seed=seeds[phase],
            )
        return _SYNTH_CACHE[key]

    from mggan_tpu.data import parsing

    ds = parsing.load_scene_dataset(dataset, phase, data_root=data_root)
    if split in ("upper", "lower"):
        ds = parsing.filter_split(ds, split)
    return ds


def get_dataloader(
    dataset: str,
    phase: str,
    augment=False,
    batch_size=8,
    workers=0,  # kept for CLI parity; host pipeline is in-process numpy
    shuffle=False,
    split=None,
    max_peds=None,
    data_root="./data/datasets",
    seed=0,
    patch_bank=False,
    bank_mesh=None,
    shard_by_process=False,
    process_index=None,
    process_count=None,
):
    """``shard_by_process`` enables multi-host feeding (data/elastic.py):
    this process loads only its disjoint window shard and the loader yields
    the SPMD-lockstep batch count (short shards pad all-masked batches).
    ``process_index/process_count`` default to the live JAX runtime and are
    overridable for tests."""
    assert phase in ("train", "val", "test")
    if phase in ("val", "test") and augment:
        augment = False  # data_loaders.py:21-23
    ds = get_dataset(dataset, phase, data_root=data_root, split=split)
    num_batches = None
    if shard_by_process:
        from mggan_tpu.data import elastic

        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        global_windows = len(ds)
        if max_peds is None:
            # Resolve the padded ped axis from the GLOBAL dataset before
            # sharding: deriving it per-shard would give hosts different
            # (S, P) program shapes and break SPMD lockstep.
            max_peds = max((len(t) for t in ds.trajectories), default=1)
        ds = elastic.shard_windows(ds, process_index, process_count)
        num_batches = elastic.lockstep_batches(
            global_windows, process_count, batch_size
        )
    bank = None
    if patch_bank:
        from mggan_tpu.data.patch_bank import maybe_build_bank

        sizes = [len(t) for t in ds.trajectories]
        resolved_max = max_peds or (max(sizes) if sizes else 1)
        bank = maybe_build_bank(ds, resolved_max, mesh=bank_mesh)
    return PaddedBatcher(
        ds,
        batch_size=batch_size,
        max_peds=max_peds,
        shuffle=shuffle,
        seed=seed,
        patch_bank=bank,
        num_batches=num_batches,
    )
