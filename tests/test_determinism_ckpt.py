"""Determinism + checkpoint round-trip (SURVEY.md §5: explicit PRNG
plumbing gives real determinism; orbax resume must be exact)."""

import jax
import jax.numpy as jnp
import numpy as np

from mggan_tpu.config import Config
from mggan_tpu.data.loaders import get_dataloader
from mggan_tpu.eval.predict import Predictor
from mggan_tpu.parallel import mesh as mesh_lib
from mggan_tpu.training import checkpoints as ckpt
from mggan_tpu.training.loop import Trainer
from mggan_tpu.utils.logging import ExperimentWriter


def make_trainer(tmp_path, version=11, **kw):
    cfg = Config(
        dataset="synthetic_memory", batch_size=4, num_gens=2, epochs=2,
        num_samples=4, h_dim=16, decoder_h_dim=16, top_k_test=3,
        log_dir=str(tmp_path), **kw,
    )
    writer = ExperimentWriter(tmp_path, cfg.experiment, cfg.name,
                              version=version, config=cfg, tensorboard=False)
    return Trainer(cfg, writer), cfg


def test_same_seed_same_step(tmp_path):
    batch = get_dataloader("synthetic_memory", "train", batch_size=4).make_batch(
        np.arange(4)
    )
    results = []
    for _ in range(2):
        tr, _ = make_trainer(tmp_path)
        mb = tr._device_batch(batch, train=False)
        tr.state, m = tr.train_step(tr.state, mb)
        results.append({k: float(v) for k, v in m.items()})
    assert results[0] == results[1]


def test_checkpoint_roundtrip_exact(tmp_path):
    tr, cfg = make_trainer(tmp_path, version=12)
    batch = get_dataloader("synthetic_memory", "train", batch_size=4).make_batch(
        np.arange(4)
    )
    mb = tr._device_batch(batch, train=False)
    tr.state, _ = tr.train_step(tr.state, mb)
    tr.state = tr.state.replace(epoch=jnp.asarray(1, jnp.int32))
    tr.save("checkpoint_1")

    tr2, _ = make_trainer(tmp_path, version=12)
    restored = ckpt.restore_checkpoint(
        tr.writer.checkpoint_dir, jax.device_get(tr2.state), "checkpoint_1"
    )
    for a, b in zip(jax.tree.leaves(tr.state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continuing from the restore produces identical next-step metrics
    tr.state, m1 = tr.train_step(tr.state, mb)
    tr2.state, m2 = tr2.train_step(restored, mb)
    for k in m1:
        assert float(m1[k]) == float(m2[k]), k


def test_preemption_resume_replays_uninterrupted_run(tmp_path):
    """Preemption drill: train(until_epoch=1) + load_from_path + train()
    must produce bit-identical final state to one uninterrupted train().

    This requires (a) batch order a pure function of (seed, epoch)
    (PaddedBatcher.set_epoch) and (b) stateless per-(epoch, batch)
    augmentation keys — the reference's torch DataLoader + global RNG
    cannot replay either after a restart (abstract_train.py:13-22 only
    seeds process start)."""
    kw = dict(val_every=5, save_every=5, augment=1)

    tr_a, _ = make_trainer(tmp_path, version=14, **kw)
    tr_a.train()

    tr_b, cfg = make_trainer(tmp_path, version=15, **kw)
    tr_b.train(until_epoch=1)
    assert int(tr_b.state.epoch) == 1

    tr_c, _ = Trainer.load_from_path(tr_b.writer.dir, checkpoint="latest")
    assert int(tr_c.state.epoch) == 1
    tr_c.train()

    leaves_a = jax.tree.leaves(jax.device_get(tr_a.state))
    leaves_c = jax.tree.leaves(jax.device_get(tr_c.state))
    assert len(leaves_a) == len(leaves_c)
    for a, c in zip(leaves_a, leaves_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_sharded_prediction_matches_single(tmp_path):
    tr, cfg = make_trainer(tmp_path, version=13)
    loader = get_dataloader("synthetic_memory", "val", batch_size=4)
    batch = loader.make_batch(np.arange(4))
    mb = tr._device_batch(batch, train=False)

    p1 = Predictor(cfg, tr.g_spec, tr.state.g_params, tr.state.g_state)
    a1, _, probs1, _ = p1.predict(mb, jax.random.PRNGKey(0), num=4)

    mesh = mesh_lib.make_mesh(dp=4, gp=1)
    p2 = Predictor(cfg, tr.g_spec, tr.state.g_params, tr.state.g_state).shard_to(mesh)
    a2, _, probs2, _ = p2.predict(mb, jax.random.PRNGKey(0), num=4)
    np.testing.assert_allclose(np.asarray(probs1), np.asarray(probs2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-4)


def test_restore_legacy_checkpoint_without_best_val(tmp_path):
    """Checkpoints saved before best_val joined TrainState (ADVICE r3
    medium) must still restore: the structure-mismatch fallback strips
    the field from the abstract tree and defaults it to +inf."""
    import dataclasses
    from typing import Any

    import flax.struct

    @flax.struct.dataclass
    class LegacyTrainState:  # pre-best_val on-disk layout, field order kept
        g_params: Any
        g_state: Any
        d_params: Any
        d_state: Any
        g_opt: Any
        d_opt: Any
        step: Any
        epoch: Any
        l2_weight: Any
        rng: Any

    tr, _ = make_trainer(tmp_path, version=17)
    batch = get_dataloader("synthetic_memory", "train", batch_size=4).make_batch(
        np.arange(4)
    )
    mb = tr._device_batch(batch, train=False)
    tr.state, _ = tr.train_step(tr.state, mb)

    legacy_fields = [f.name for f in dataclasses.fields(LegacyTrainState)]
    legacy = LegacyTrainState(
        **{f: getattr(tr.state, f) for f in legacy_fields}
    )
    ckpt.save_checkpoint(tr.writer.checkpoint_dir, legacy, "checkpoint_1")

    restored = ckpt.restore_checkpoint(
        tr.writer.checkpoint_dir, jax.device_get(tr.state), "checkpoint_1"
    )
    assert not np.isfinite(float(restored.best_val))  # defaulted to +inf
    for f in legacy_fields:
        for a, b in zip(
            jax.tree.leaves(getattr(tr.state, f)),
            jax.tree.leaves(getattr(restored, f)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the restored state is usable: one more step runs and matches the
    # original state's next step (best_val does not feed the jitted step)
    tr.state, m1 = tr.train_step(tr.state, mb)
    _, m2 = tr.train_step(restored, mb)
    for k in m1:
        assert float(m1[k]) == float(m2[k]), k


def test_resume_preserves_best_checkpoint(tmp_path, monkeypatch):
    """checkpoint_best must survive a resume whose first validation is
    worse: the best-so-far metric rides in the checkpointed TrainState
    (regression: it used to reset to +inf, so the first post-resume
    validation always overwrote checkpoint_best)."""
    tr, cfg = make_trainer(tmp_path, version=16, val_every=1)
    tr.train(until_epoch=1)
    best_after_1 = float(tr.state.best_val)
    assert np.isfinite(best_after_1)  # validation ran and recorded it

    tr2, _ = Trainer.load_from_path(tr.writer.dir, checkpoint="latest")
    assert float(tr2.state.best_val) == best_after_1

    # resume with a deliberately worse validation metric: checkpoint_best
    # must NOT be overwritten
    worse = {f"ADE k={cfg.top_k_test}": best_after_1 + 100.0,
             f"FDE k={cfg.top_k_test}": 0.0}
    monkeypatch.setattr(
        tr2, "check_accuracy", lambda loader, num_k: dict(worse)
    )
    tr2.train()
    assert float(tr2.state.best_val) == best_after_1
    restored = ckpt.restore_checkpoint(
        tr2.writer.checkpoint_dir, jax.device_get(tr2.state),
        "checkpoint_best",
    )
    assert int(restored.epoch) == 1  # still the epoch-1 save
