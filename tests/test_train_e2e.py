"""End-to-end: one full train step per config family on synthetic data
(SURVEY.md §4 level 3)."""

import numpy as np
import pytest
import jax

from mggan_tpu.config import Config
from mggan_tpu.training.loop import Trainer
from mggan_tpu.utils.logging import ExperimentWriter


def tiny_config(tmp_path, **kw):
    base = dict(
        dataset="synthetic_memory",
        batch_size=4,
        num_gens=2,
        epochs=2,
        num_samples=4,
        num_expectation_samples=2,
        h_dim=16,
        decoder_h_dim=16,
        noise_dim=8,
        top_k_test=3,
        val_every=1,
        save_every=10,
        log_dir=str(tmp_path),
        augment=1,
    )
    base.update(kw)
    return Config(**base)


def run_steps(cfg, tmp_path, n=2):
    writer = ExperimentWriter(
        tmp_path, cfg.experiment, cfg.name, version=1, config=cfg, tensorboard=False
    )
    tr = Trainer(cfg, writer)
    from mggan_tpu.data.loaders import get_dataloader

    loader = get_dataloader(cfg.dataset, "train", augment=True,
                            batch_size=cfg.batch_size, shuffle=True)
    it = iter(loader)
    for _ in range(n):
        batch = next(it)
        mb = tr._device_batch(batch, train=True)
        tr.state, metrics = tr.train_step(tr.state, mb)
    metrics = {k: float(v) for k, v in metrics.items()}
    for k, v in metrics.items():
        if cfg.num_gen_steps > 1 and np.isnan(v):
            continue  # NaN sentinel from a skipped D-step (by design)
        assert np.isfinite(v), f"{k} not finite: {v}"
    return tr, metrics


@pytest.mark.parametrize(
    "kw",
    [
        dict(gan_type="mgan", gan_obj="NS", weighting_target="ml"),
        dict(gan_type="gan", gan_obj="LS", weighting_target="l2"),
        dict(gan_type="infogan", gan_obj="MM", weighting_target="none", num_gens=1),
        dict(gan_type="gan", gan_obj="W", weighting_target="endpoint"),
        dict(gan_type="mgan", gan_obj="NS", weighting_target="mgan",
             experiment="discrete"),
        # Bayes-target PM objective (PARITY deviation 7; non-default since
        # r5 flipped --wt_mgan_compat to the reference-literal objective)
        dict(gan_type="mgan", gan_obj="NS", weighting_target="mgan",
             wt_mgan_compat=0),
        dict(gan_type="gan", gan_obj="NS", weighting_target="none",
             num_unrolling_steps=1),
        dict(gan_type="gan", gan_obj="NS", weighting_target="none",
             num_gen_steps=2, keep_gen_steps=100),
        dict(gan_type="gan", gan_obj="NS", weighting_target="none",
             num_unrolling_steps=1, num_gen_steps=2, keep_gen_steps=100),
        dict(gan_type="mgan", gan_obj="NS", weighting_target="l2",
             pool_type="sgan"),
        dict(gan_type="probgan", gan_obj="NS", weighting_target="ml"),
    ],
)
def test_train_step_families(tmp_path, kw):
    cfg = tiny_config(tmp_path, **kw)
    tr, metrics = run_steps(cfg, tmp_path, n=2)
    assert "train/gen_loss" in metrics


def test_probgan_sghmc_noise_wired(tmp_path):
    """probgan adds the SGHMC noise terms lambda*<theta, n> to both losses
    (reference utils.py:10-15 helpers + config.py:100-117 flags, unwired
    there); zero lambda must recover noise-free training exactly."""
    import jax.numpy as jnp

    cfg = tiny_config(tmp_path, gan_type="probgan", weighting_target="ml",
                      sghmc_alpha=0.05)
    tr, metrics = run_steps(cfg, tmp_path, n=2)
    assert "train/g_noise_loss" in metrics
    assert "train/d_noise_loss" in metrics

    cfg0 = tiny_config(tmp_path, gan_type="probgan", weighting_target="ml",
                       g_noise_loss_lambda=0.0, d_noise_loss_lambda=0.0,
                       name="nl0")
    tr0, _ = run_steps(cfg0, tmp_path, n=2)
    # same seed, same data order: the only divergence source is the noise
    # term, so lambda=0 vs default 3e-2 must differ...
    leaves = jax.tree.leaves(tr.state.g_params)
    leaves0 = jax.tree.leaves(tr0.state.g_params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves, leaves0)
    )


def test_sghmc_noise_loss_gradient_is_noise():
    """grad of <theta, n> w.r.t. theta reproduces n (std = alpha)."""
    import jax.numpy as jnp

    from mggan_tpu.utils import trajectory_tools

    params = {"a": jnp.ones((64, 64)), "b": jnp.zeros((128,))}
    key = jax.random.PRNGKey(3)
    g = jax.grad(trajectory_tools.noise_loss)(params, key, 0.01)
    # the gradient IS the sampled noise: mean ~ 0, std ~ alpha
    flat = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g)])
    assert abs(flat.mean()) < 5e-4
    assert abs(flat.std() - 0.01) < 2e-3
    # independent of params' values, deterministic in the key
    g2 = jax.grad(trajectory_tools.noise_loss)(
        {"a": jnp.full((64, 64), 7.0), "b": jnp.ones((128,))}, key, 0.01
    )
    for x, y in zip(jax.tree.leaves(g), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_unroll_respects_d_gating(tmp_path):
    """num_unrolling_steps > 0 combined with num_gen_steps > 1: the unroll
    runs NESTED inside the D-step gate (abstract_train.py:136-150) — on
    gated-out iterations D's params must stay bitwise unchanged (no D-step,
    restore is a no-op) while G still trains."""
    cfg = tiny_config(
        tmp_path, gan_type="gan", gan_obj="NS", weighting_target="none",
        num_unrolling_steps=1, num_gen_steps=2, keep_gen_steps=100,
    )
    writer = ExperimentWriter(
        tmp_path, cfg.experiment, cfg.name, version=7, config=cfg,
        tensorboard=False,
    )
    tr = Trainer(cfg, writer)
    from mggan_tpu.data.loaders import get_dataloader

    loader = get_dataloader(cfg.dataset, "train", batch_size=4, shuffle=False)
    batch = next(iter(loader))
    mb = tr._device_batch(batch, train=True)

    d0 = jax.device_get(tr.state.d_params)
    tr.state, m0 = tr.train_step(tr.state, mb)  # step 0: gate true, D runs
    d1 = jax.device_get(tr.state.d_params)
    assert np.isfinite(float(m0["train/discr_loss"]))
    changed = max(
        jax.tree.leaves(jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            d0, d1,
        ))
    )
    assert changed > 0  # D took its (first) update before rollback

    g1 = jax.device_get(tr.state.g_params)
    tr.state, m1 = tr.train_step(tr.state, mb)  # step 1: gated out
    d2 = jax.device_get(tr.state.d_params)
    assert np.isnan(float(m1["train/discr_loss"]))  # skipped-step sentinel
    for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(d2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    g2 = jax.device_get(tr.state.g_params)
    g_changed = max(
        jax.tree.leaves(jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            g1, g2,
        ))
    )
    assert g_changed > 0  # G still trained on the gated-out iteration


def test_params_update_and_validation(tmp_path):
    cfg = tiny_config(tmp_path)
    writer = ExperimentWriter(
        tmp_path, cfg.experiment, cfg.name, version=2, config=cfg, tensorboard=False
    )
    tr = Trainer(cfg, writer)
    import jax.numpy as jnp

    before = jax.tree.map(lambda x: np.asarray(x).copy(), tr.state.g_params)
    from mggan_tpu.data.loaders import get_dataloader

    loader = get_dataloader(cfg.dataset, "train", batch_size=4, shuffle=False)
    batch = next(iter(loader))
    tr.state, _ = tr.train_step(tr.state, tr._device_batch(batch, train=True))
    after = tr.state.g_params
    changed = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), after, before
    )
    assert max(jax.tree.leaves(changed)) > 0

    val_loader = get_dataloader(cfg.dataset, "val", batch_size=4)
    m = tr.check_accuracy(val_loader, num_k=3)
    assert np.isfinite(m["ADE k=3"]) and m["ADE k=3"] > 0
    assert np.isfinite(m["FDE k=3"])
    assert 0 <= m["Mode k=3"] <= 1


def test_cosine_lr_schedule_inside_step(tmp_path):
    """LR is a pure function of state.epoch computed inside the jitted step
    (abstract_train.py:52-57,198-200: CosineAnnealingLR stepped per epoch).
    During 1-based epoch e the LR must be base*0.5*(1+cos(pi*(e-1)/E))."""
    import jax.numpy as jnp

    cfg = tiny_config(tmp_path, epochs=10)
    writer = ExperimentWriter(
        tmp_path, cfg.experiment, cfg.name, version=3, config=cfg, tensorboard=False
    )
    tr = Trainer(cfg, writer)
    from mggan_tpu.data.loaders import get_dataloader

    loader = get_dataloader(cfg.dataset, "train", batch_size=4, shuffle=False)
    batch = next(iter(loader))
    mb = tr._device_batch(batch, train=True)

    seen = {}
    for epoch in (1, 5, 10):
        tr.state = tr.state.replace(epoch=jnp.asarray(epoch, jnp.int32))
        tr.state, metrics = tr.train_step(tr.state, mb)
        expected = cfg.g_lr * 0.5 * (1.0 + np.cos(np.pi * (epoch - 1) / cfg.epochs))
        np.testing.assert_allclose(float(metrics["train/lr_G"]), expected, rtol=1e-5)
        expected_d = cfg.d_lr * 0.5 * (1.0 + np.cos(np.pi * (epoch - 1) / cfg.epochs))
        np.testing.assert_allclose(float(metrics["train/lr_D"]), expected_d, rtol=1e-5)
        seen[epoch] = float(metrics["train/lr_G"])
    assert seen[1] > seen[5] > seen[10] > 0  # visibly decays


def test_nan_futures_gofp_style(tmp_path):
    """GOFP-style NaN futures: training and eval must mask inactive agents
    (trajectories_scene.py:171-175, abstract_train.py:130)."""
    from mggan_tpu.data.synthetic import make_synthetic_dataset
    from mggan_tpu.data.batcher import PaddedBatcher

    ds = make_synthetic_dataset(num_windows=8, max_peds=4, seed=9,
                                nan_future_frac=0.5)
    loader = PaddedBatcher(ds, batch_size=4)
    cfg = tiny_config(tmp_path, gan_type="mgan", weighting_target="ml")
    writer = ExperimentWriter(tmp_path, cfg.experiment, cfg.name, version=9,
                              config=cfg, tensorboard=False)
    tr = Trainer(cfg, writer)

    n_nan = sum(np.isnan(t[:, 8:]).any() for t in ds.trajectories)
    assert n_nan > 0  # the fixture actually exercises the mask

    for batch in loader:
        mb = tr._device_batch(batch, train=True)
        tr.state, metrics = tr.train_step(tr.state, mb)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))

    m = tr.check_accuracy(loader, num_k=3)
    assert np.isfinite(m["ADE k=3"])


def test_grad_norm_histograms_written(tmp_path):
    """Per-module gradient-norm histograms reach the TB backend each epoch
    (reference GradNormLogger usage, utils.py:168-199 + abstract_train)."""

    class FakeTB:
        def __init__(self):
            self.hists = []

        def add_histogram(self, name, vals, step):
            self.hists.append((name, len(np.asarray(vals)), step))

        def add_scalar(self, *a):
            pass

    cfg = tiny_config(tmp_path, epochs=1)
    writer = ExperimentWriter(
        tmp_path, cfg.experiment, cfg.name, version=31, config=cfg,
        tensorboard=False,
    )
    writer._tb = FakeTB()
    Trainer(cfg, writer).train()
    names = {h[0] for h in writer._tb.hists}
    assert any(n.startswith("gradient_histograms/G/") for n in names), names
    assert any(n.startswith("gradient_histograms/D/") for n in names), names
    # every histogram got one value per step of the epoch
    assert all(h[1] >= 1 for h in writer._tb.hists)
