"""Split (3-phase, parallel-compile) train step == fused step semantics."""

import jax
import numpy as np

from mggan_tpu.config import Config
from mggan_tpu.data.loaders import get_dataloader
from mggan_tpu.models import factory
from mggan_tpu.training.state import init_train_state
from mggan_tpu.training.steps import build_split_train_step, build_train_step


def test_split_step_trains_and_precompiles():
    cfg = Config(
        dataset="synthetic_memory", batch_size=4, num_gens=2, num_samples=4,
        h_dim=16, decoder_h_dim=16, gan_type="mgan", weighting_target="ml",
    )
    g_pack, d_pack = factory.construct_model(cfg, jax.random.PRNGKey(0))
    loader = get_dataloader(cfg.dataset, "train", batch_size=4)
    batch = loader.make_batch(np.arange(4))
    import jax.numpy as jnp

    mb = {
        "xy": jnp.asarray(batch["xy"]),
        "ped_mask": jnp.asarray(batch["ped_mask"]),
        "patches": jax.random.uniform(jax.random.PRNGKey(5), batch["xy"].shape[:2] + (33, 33, 4), minval=-1.0, maxval=1.0),
    }

    state = init_train_state(cfg, g_pack, d_pack, jax.random.PRNGKey(1))
    # fresh copy: the split phases donate their input buffers
    state2 = jax.tree.map(jnp.copy, state)
    split = build_split_train_step(cfg, g_pack[2], d_pack[2])
    split.precompile(state, mb)
    s1, m1 = split(state, mb)
    assert int(s1.step) == 1
    for k, v in m1.items():
        assert np.isfinite(float(v)), k

    # fused step on the same init produces losses in the same ballpark
    fused = build_train_step(cfg, g_pack[2], d_pack[2])
    s2, m2 = fused(state2, mb)
    for k in ("train/discr_loss", "train/L2_loss"):
        assert abs(float(m1[k]) - float(m2[k])) / (abs(float(m2[k])) + 1e-6) < 0.3, k

    # a second step keeps running from compiled executables
    s1, m1b = split(s1, mb)
    assert int(s1.step) == 2
