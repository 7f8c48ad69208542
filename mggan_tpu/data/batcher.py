"""Padded-batch assembly (replaces torch DataLoader + ``seq_collate_scene``,
data_loaders.py:92-100 / trajectories_scene.py:40-78).

Windows (scenes) are batched along a scene axis and peds are padded to a
fixed ``max_peds`` so every batch has the same (S, P, ...) shape — one
compiled program services the whole epoch.  Scenes remain atomic (a scene
never straddles a batch or a DP shard), mirroring ``seq_start_end``
semantics.  The last partial batch is padded with empty scenes and masked
(reference uses ``drop_last=False``).
"""

from __future__ import annotations

import numpy as np

from mggan_tpu.data.dataset import SceneDataset, SEQ_LEN, BIG_PATCH


class PaddedBatcher:
    def __init__(
        self,
        ds: SceneDataset,
        batch_size: int,
        max_peds: int | None = None,
        shuffle: bool = False,
        seed: int = 0,
        pad_final: bool = True,
        include_patches: bool = True,
        patch_bank=None,
        num_batches: int | None = None,
    ):
        self.ds = ds
        self.batch_size = batch_size
        self.shuffle = shuffle
        # Epoch order is a pure function of (seed, epoch) so a resumed run
        # replays the exact batch stream of an uninterrupted one (the
        # reference's torch DataLoader reshuffles from global RNG state and
        # cannot): the Trainer pins the epoch via set_epoch(); standalone
        # iteration advances the counter itself.
        self.seed = seed
        self._epoch = 0
        self.pad_final = pad_final
        # SPMD lockstep (data/elastic.py): force this many batches per
        # epoch, padding trailing all-masked empty batches if the local
        # shard runs short (requires pad_final so shapes stay static).
        self.num_batches = num_batches
        assert num_batches is None or pad_final
        # With a device-resident bank (data/patch_bank.py) the host stops
        # assembling patch arrays entirely; make_batch attaches the device
        # gather instead (dispatched from the prefetch thread -> overlaps
        # the train step).
        self.patch_bank = patch_bank
        self.include_patches = (
            include_patches and patch_bank is None
            and ds.big_patches is not None
        )

        sizes = [len(t) for t in ds.trajectories]
        data_max = max(sizes) if sizes else 1
        self.max_peds = max_peds or data_max
        if data_max > self.max_peds:
            raise ValueError(
                f"dataset has a scene with {data_max} peds > max_peds="
                f"{self.max_peds}; raise --max_peds"
            )
        assert self.patch_bank is None or self.patch_bank.max_peds == self.max_peds

        # Scene extent in meters for augmentation (width, height).
        self._wh_m = {}
        for name, info in ds.images.items():
            h, w = info["small"].shape[:2]
            self._wh_m[name] = (w / ds.px_per_meter, h / ds.px_per_meter)

    def __len__(self):
        n = len(self.ds)
        data_batches = (n + self.batch_size - 1) // self.batch_size
        if self.num_batches is not None:
            assert self.num_batches >= data_batches, (
                f"num_batches={self.num_batches} < {data_batches} batches "
                "of local data — lockstep count must cover the shard"
            )
            return self.num_batches
        return data_batches

    def num_windows(self):
        return len(self.ds)

    def set_epoch(self, epoch: int):
        """Pin the shuffle order of the NEXT ``__iter__`` to ``epoch``
        (same contract as torch's ``DistributedSampler.set_epoch``)."""
        self._epoch = int(epoch)

    def __iter__(self):
        order = np.arange(len(self.ds))
        if self.shuffle:
            epoch_rng = np.random.RandomState(
                (self.seed * 1_000_003 + self._epoch) % (2**31 - 1)
            )
            epoch_rng.shuffle(order)
        self._epoch += 1
        bs, p = self.batch_size, self.max_peds
        for i in range(0, len(order), bs):
            idxs = order[i : i + bs]
            yield self.make_batch(idxs)
        if self.num_batches is not None:
            produced = -(-len(order) // bs) if len(order) else 0
            for _ in range(produced, self.num_batches):
                yield self.make_batch(np.zeros((0,), np.int64))

    def make_batch(self, idxs):
        ds, p = self.ds, self.max_peds
        s = self.batch_size if self.pad_final else len(idxs)
        xy = np.zeros((s, p, SEQ_LEN, 2), np.float32)
        ped_mask = np.zeros((s, p), bool)
        wh_m = np.ones((s, 2), np.float32)
        scale = np.ones((s,), np.float32)
        window_idx = np.full((s,), -1, np.int64)
        if self.include_patches:
            big = np.zeros((s, p, BIG_PATCH, BIG_PATCH, 3), np.uint8)
        for row, wi in enumerate(idxs):
            traj = ds.trajectories[wi]
            n = len(traj)
            xy[row, :n] = traj
            ped_mask[row, :n] = True
            wh_m[row] = self._wh_m[ds.scene_names[wi]]
            scale[row] = ds.eval_scaling(wi)
            window_idx[row] = wi
            if self.include_patches:
                big[row, :n] = ds.big_patches[wi]
        batch = {
            "xy": xy,
            "ped_mask": ped_mask,
            "wh_m": wh_m,
            "scale": scale,
            "window_idx": window_idx,
        }
        if self.include_patches:
            batch["big_patches"] = big
        elif self.patch_bank is not None:
            batch["big_patches"] = self.patch_bank.gather(window_idx)
        return batch
