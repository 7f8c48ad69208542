"""Device-resident patch bank (data/patch_bank.py): the device gather must
be bitwise-equal to host-side patch batch assembly, and training through the
bank must produce identical steps."""

import numpy as np
import jax

from mggan_tpu.data.batcher import PaddedBatcher
from mggan_tpu.data.patch_bank import DevicePatchBank, bank_nbytes, maybe_build_bank
from mggan_tpu.data.synthetic import make_synthetic_dataset


def test_bank_gather_equals_host_assembly():
    ds = make_synthetic_dataset(num_windows=10, max_peds=5, seed=3)
    bank = DevicePatchBank(ds, max_peds=5)
    host = PaddedBatcher(ds, batch_size=4, max_peds=5, shuffle=False)
    banked = PaddedBatcher(ds, batch_size=4, max_peds=5, shuffle=False,
                           patch_bank=bank)
    assert not banked.include_patches  # host assembly fully bypassed

    for bh, bb in zip(host, banked):
        np.testing.assert_array_equal(
            np.asarray(bb["big_patches"]), bh["big_patches"]
        )
        np.testing.assert_array_equal(bb["xy"], bh["xy"])
    # the final batch is padded: its pad scenes must be all-zero, not window 0
    assert bh["window_idx"][-1] == -1  # 10 windows, batch 4 -> 2 pad scenes
    assert not np.asarray(bb["big_patches"])[-1].any()


def test_maybe_build_bank_budget_and_gating():
    ds = make_synthetic_dataset(num_windows=6, max_peds=4, seed=0)
    assert maybe_build_bank(ds, 4, enabled=False) is None
    assert maybe_build_bank(ds, 4, max_bytes=10) is None  # over budget
    bank = maybe_build_bank(ds, 4)
    assert bank is not None and bank.arr.shape[0] == 6
    assert bank_nbytes(6, 4) == bank.arr.size


def test_train_step_identical_through_bank(tmp_path):
    """One full train step with patch_bank on vs off: bit-identical metrics
    (the bank only changes WHERE patch assembly happens, never the values)."""
    from mggan_tpu.config import Config
    from mggan_tpu.training.loop import Trainer
    from mggan_tpu.utils.logging import ExperimentWriter
    from mggan_tpu.data.loaders import get_dataloader

    results = {}
    for pb in (0, 1):
        cfg = Config(
            dataset="synthetic_memory", batch_size=4, num_gens=2, epochs=1,
            num_samples=4, h_dim=16, decoder_h_dim=16, top_k_test=3,
            gan_type="mgan", weighting_target="ml", log_dir=str(tmp_path),
            patch_bank=pb, augment=1,
        )
        writer = ExperimentWriter(tmp_path, cfg.experiment, cfg.name,
                                  version=40 + pb, config=cfg, tensorboard=False)
        tr = Trainer(cfg, writer)
        loader = get_dataloader(cfg.dataset, "train", batch_size=4,
                                shuffle=False, patch_bank=bool(pb))
        batch = next(iter(loader))
        assert ("big_patches" in batch)
        mb = tr._device_batch(batch, train=True)
        tr.state, metrics = tr.train_step(tr.state, mb)
        results[pb] = {k: float(v) for k, v in metrics.items()}

    assert results[0] == results[1]
