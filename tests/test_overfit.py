"""Integration: overfitting a few batches must drive min-scene L2 down
(SURVEY.md §4 level 3: 'overfit-10-batches ADE->0 check')."""

import jax
import numpy as np

from mggan_tpu.config import Config
from mggan_tpu.data.loaders import get_dataloader
from mggan_tpu.training.loop import Trainer
from mggan_tpu.utils.logging import ExperimentWriter


def test_overfit_reduces_l2(tmp_path):
    cfg = Config(
        dataset="synthetic_memory", batch_size=4, num_gens=2, epochs=1,
        num_samples=4, h_dim=16, decoder_h_dim=16, top_k_test=3,
        gan_type="gan", weighting_target="none", l2_loss_weight=100.0,
        g_lr=1e-2, augment=0, log_dir=str(tmp_path),
    )
    writer = ExperimentWriter(tmp_path, cfg.experiment, cfg.name, version=3,
                              config=cfg, tensorboard=False)
    tr = Trainer(cfg, writer)
    loader = get_dataloader(cfg.dataset, "train", batch_size=4, shuffle=False)
    batch = loader.make_batch(np.arange(4))
    mb = tr._device_batch(batch, train=False)

    losses = []
    for _ in range(80):
        tr.state, metrics = tr.train_step(tr.state, mb)
        losses.append(float(metrics["train/L2_loss"]))
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert last < 0.5 * first, (first, last)
