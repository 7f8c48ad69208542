"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 5):
DP sharding compiles/executes and matches the single-device step bitwise-ish.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mggan_tpu.config import Config
from mggan_tpu.data.loaders import get_dataloader
from mggan_tpu.models import factory
from mggan_tpu.parallel import dp, mesh as mesh_lib
from mggan_tpu.training.state import init_train_state
from mggan_tpu.training.steps import build_train_step


def setup(num_gens=2, gp=1):
    cfg = Config(
        dataset="synthetic_memory", batch_size=8, num_gens=num_gens,
        num_samples=4, h_dim=16, decoder_h_dim=16,
        gan_type="mgan", weighting_target="ml",
    )
    key = jax.random.PRNGKey(0)
    g_pack, d_pack = factory.construct_model(cfg, key)
    state = init_train_state(cfg, g_pack, d_pack, jax.random.PRNGKey(1))
    loader = get_dataloader(cfg.dataset, "train", batch_size=8, shuffle=False)
    batch = next(iter(loader))
    # patches must be non-degenerate: all-identical patches give BatchNorm
    # zero batch variance, where gradients are numerically knife-edged and
    # legitimately differ across reduction orders/shardings
    patches = jax.random.uniform(
        jax.random.PRNGKey(5), batch["xy"].shape[:2] + (33, 33, 4),
        minval=-1.0, maxval=1.0,
    )
    model_batch = {
        "xy": jnp.asarray(batch["xy"]),
        "ped_mask": jnp.asarray(batch["ped_mask"]),
        "patches": patches,
    }
    return cfg, g_pack, d_pack, state, model_batch


def test_dp_matches_single_device():
    cfg, g_pack, d_pack, state, batch = setup()
    single_step = build_train_step(cfg, g_pack[2], d_pack[2])
    s1, m1 = single_step(jax.tree.map(jnp.copy, state), batch)

    mesh = mesh_lib.make_mesh(dp=4, gp=1)
    pstep, pstate = dp.make_parallel_train_step(
        cfg, g_pack[2], d_pack[2], mesh, state, batch
    )
    s2, m2 = pstep(pstate, dp.shard_batch(mesh, batch))

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=1e-2, atol=1e-4, err_msg=k
        )
    # parameters agree after one step
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s1.g_params, jax.device_get(s2.g_params),
    )
    assert max(jax.tree.leaves(diffs)) < 5e-3


def test_generator_parallel_executes():
    cfg, g_pack, d_pack, state, batch = setup(num_gens=4)
    mesh = mesh_lib.make_mesh(dp=2, gp=2)
    pstep, pstate = dp.make_parallel_train_step(
        cfg, g_pack[2], d_pack[2], mesh, state, batch
    )
    s2, m2 = pstep(pstate, dp.shard_batch(mesh, batch))
    for k, v in m2.items():
        assert np.isfinite(float(v)), k


def test_trainer_dp_cli_path(tmp_path):
    """Trainer with --dp builds the sharded step lazily and trains/validates."""
    from mggan_tpu.training.loop import Trainer
    from mggan_tpu.utils.logging import ExperimentWriter

    cfg = Config(
        dataset="synthetic_memory", batch_size=4, num_gens=2, epochs=1,
        num_samples=4, h_dim=16, decoder_h_dim=16, top_k_test=3,
        gan_type="mgan", weighting_target="ml", dp=4, log_dir=str(tmp_path),
    )
    writer = ExperimentWriter(tmp_path, cfg.experiment, cfg.name, version=21,
                              config=cfg, tensorboard=False)
    tr = Trainer(cfg, writer).train()
    assert int(tr.state.step) > 0
