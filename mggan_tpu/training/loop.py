"""Training driver: epoch loop, validation, checkpoint-best, schedules.

Reference: ``MultiGeneratorGAN.train`` (abstract_train.py:87-201) +
``PiNetMultiGeneratorGAN`` step methods (train.py:18-662).  The per-batch
work is one jitted ``train_step``; this module is thin host orchestration.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mggan_tpu.config import Config
from mggan_tpu.data import augment as aug
from mggan_tpu.data.loaders import get_dataloader
from mggan_tpu.eval.metrics import (
    MetricAccumulator,
    allreduce_sums,
    batch_metric_sums,
)
from mggan_tpu.eval.predict import Predictor
from mggan_tpu.models import factory
from mggan_tpu.training import checkpoints as ckpt
from mggan_tpu.training.state import TrainState, init_train_state
from mggan_tpu.training.steps import (
    batch_views,
    build_split_train_step,
    build_train_step,
)
from mggan_tpu.utils.logging import ExperimentWriter, load_meta_tags


class Trainer:
    """PiNet multi-generator GAN trainer.

    The reference asserts probgan out of this path (train.py:21:
    mgan/gan/infogan) because its SGHMC machinery was never wired; here the
    probgan chain is complete (5-head ensemble, Polyak history EMA, SGHMC
    noise losses in steps.py), so the assert admits it — documented as
    PARITY.md deviation 10.
    """

    def __init__(self, config: Config, writer: ExperimentWriter, init_key=None):
        assert config.gan_type in ("mgan", "gan", "infogan", "probgan"), config.gan_type
        if getattr(config, "compilation_cache_dir", ""):
            from mggan_tpu.utils.profiling import enable_compilation_cache

            enable_compilation_cache(config.compilation_cache_dir)
        self.config = config
        self.writer = writer
        key = init_key if init_key is not None else jax.random.PRNGKey(config.seed)
        k_model, k_state = jax.random.split(key)
        self.g_pack, self.d_pack = factory.construct_model(config, k_model)
        self.g_spec, self.d_spec = self.g_pack[2], self.d_pack[2]
        self.state = init_train_state(config, self.g_pack, self.d_pack, k_state)
        self._mesh = None
        slices = getattr(config, "slices", 1)
        if config.dp * config.gp * slices > 1:
            assert not getattr(config, "split_step", 0), (
                "--split_step and --dp/--gp are mutually exclusive for now"
            )
            from mggan_tpu.parallel.mesh import make_mesh

            self._mesh = make_mesh(dp=config.dp, gp=config.gp, slices=slices)
            self.train_step = None  # built on the first batch (needs shapes)
        elif getattr(config, "split_step", 0):
            self.train_step = build_split_train_step(
                config, self.g_spec, self.d_spec
            )
        else:
            self.train_step = build_train_step(config, self.g_spec, self.d_spec)
        self._precompiled = False
        self._predictor = None
        # Augmentation keys are derived per (epoch, batch) in train() —
        # stateless, so resuming from a checkpoint replays the exact key
        # stream of an uninterrupted run (tests/test_determinism_ckpt.py).
        self._aug_base = jax.random.PRNGKey(config.seed + 1)
        from mggan_tpu.utils.trajectory_tools import GradNormLogger

        self._grad_logger = GradNormLogger()

        @functools.partial(jax.jit, static_argnames=("train",))
        def _augment(rng, batch, train):
            return aug.augment_batch(rng, batch, train,
                                     interp=config.patch_interp)

        self._augment = _augment

        @functools.partial(jax.jit, static_argnames=("ks",))
        def _metric_sums(pred_abs, batch, ks):
            bv = batch_views(batch)
            return batch_metric_sums(
                pred_abs, bv.gt_xy, bv.loss_mask, batch["scale"], list(ks)
            )

        self._metric_sums = _metric_sums

    # ------------------------------------------------------------------ api
    def predictor(self) -> Predictor:
        if self._predictor is None:
            self._predictor = Predictor(
                self.config, self.g_spec, self.state.g_params, self.state.g_state
            )
            if self._mesh is not None:
                self._predictor.shard_to(self._mesh)
        self._predictor.g_params = self.state.g_params
        self._predictor.g_state = self.state.g_state
        return self._predictor

    def _device_batch(self, batch, train: bool, aug_key=None):
        rng = self._aug_base if aug_key is None else aug_key
        full = self._augment(rng, {k: v for k, v in batch.items()
                                   if k not in ("scale", "window_idx")}, train)
        model_batch = {
            "xy": full["xy"],
            "ped_mask": full["ped_mask"],
            "patches": full.get("patches"),
        }
        return model_batch

    def train(self, until_epoch: int | None = None):
        """Run the epoch loop to ``config.epochs``.

        until_epoch: stop (and checkpoint) after this epoch — a preemption
            drill: ``train(until_epoch=k)`` + ``load_from_path`` +
            ``train()`` replays the identical batch/augment/weight stream
            as one uninterrupted ``train()`` (test_determinism_ckpt.py).
        """
        cfg = self.config
        mp = cfg.max_peds or None
        # On a mesh the bank is replicated across devices so batch gathers
        # run device-side there too (shard_batch then does a local slice).
        bank = bool(cfg.patch_bank)
        # On a multi-host pod each process loads only its disjoint window
        # shard with an SPMD-lockstep batch count (data/elastic.py);
        # single-process runs are untouched.
        shard_proc = jax.process_count() > 1
        train_loader = get_dataloader(
            cfg.dataset, "train", augment=bool(cfg.augment),
            batch_size=cfg.batch_size, shuffle=True, max_peds=mp,
            data_root=cfg.data_root, seed=cfg.seed, patch_bank=bank,
            bank_mesh=self._mesh, shard_by_process=shard_proc,
        )
        val_loader = get_dataloader(
            cfg.dataset, "val", augment=False, batch_size=cfg.batch_size,
            shuffle=False, max_peds=mp, data_root=cfg.data_root,
            patch_bank=bank, bank_mesh=self._mesh,
            shard_by_process=shard_proc,
        )
        track_metric = f"val/ADE k={cfg.top_k_test}"
        # Resume-safe: the best-so-far val metric rides in the checkpointed
        # TrainState, so a resumed run can't regress checkpoint_best.
        best = float(self.state.best_val)
        start_epoch = int(self.state.epoch)

        for epoch in range(start_epoch, cfg.epochs):
            self.state = self.state.replace(
                epoch=jnp.asarray(epoch + 1, jnp.int32)
            )
            metrics = defaultdict(list)
            from mggan_tpu.data.prefetch import Prefetcher
            import time as _time

            epoch_t0 = _time.perf_counter()
            n_steps = 0
            n_real_agents = 0
            train_loader.set_epoch(epoch)
            epoch_key = jax.random.fold_in(self._aug_base, epoch)
            for i, batch in enumerate(Prefetcher(train_loader)):
                n_real_agents += int(np.asarray(batch["ped_mask"]).sum())
                model_batch = self._device_batch(
                    batch, train=bool(cfg.augment),
                    aug_key=jax.random.fold_in(epoch_key, i),
                )
                if self._mesh is not None:
                    from mggan_tpu.parallel import dp as dp_mod

                    if self.train_step is None:
                        self.train_step, self.state = dp_mod.make_parallel_train_step(
                            cfg, self.g_spec, self.d_spec, self._mesh,
                            self.state, model_batch,
                        )
                    model_batch = dp_mod.shard_batch(self._mesh, model_batch)
                if not self._precompiled:
                    if hasattr(self.train_step, "precompile"):
                        self.train_step.precompile(self.state, model_batch)
                    self._precompiled = True
                profiling = (
                    cfg.profile_dir and epoch == start_epoch
                    and len(metrics.get("train/gen_loss", [])) == 1
                )
                if profiling:
                    jax.profiler.start_trace(cfg.profile_dir)
                self.state, step_metrics = self.train_step(self.state, model_batch)
                if profiling:
                    jax.block_until_ready(step_metrics)
                    jax.profiler.stop_trace()
                for k, v in step_metrics.items():
                    metrics[k].append(v)
                n_steps += 1
            if step_metrics:
                # fetch a VALUE: through remote-TPU tunnels
                # block_until_ready alone does not fence execution
                float(next(iter(step_metrics.values())))
            epoch_dt = _time.perf_counter() - epoch_t0
            metrics["perf/steps_per_sec"].append(n_steps / max(epoch_dt, 1e-9))
            # Real (mask-counted) agents; the padded rate counts every
            # (scene, ped) slot the compiled step processes.
            metrics["perf/agents_per_sec"].append(
                n_real_agents / max(epoch_dt, 1e-9)
            )
            metrics["perf/padded_agents_per_sec"].append(
                n_steps * cfg.batch_size * train_loader.max_peds / max(epoch_dt, 1e-9)
            )

            if (epoch + 1) % cfg.val_every == 0:
                val_metrics = self.check_accuracy(val_loader, num_k=cfg.top_k_test)
                for k, v in val_metrics.items():
                    metrics[f"val/{k}"].append(v)
                # check_accuracy reduces (sum, count) across processes, so
                # `cur` is the exact global metric and identical on every
                # host — the best-checkpoint branch below cannot diverge
                # between pod processes (orbax saves are collective).
                cur = float(np.mean(metrics[track_metric]))
                if cur < best:
                    print(f"Saving best model... {track_metric}: {best} -> {cur}")
                    best = cur
                    self.state = self.state.replace(
                        best_val=jnp.asarray(cur, jnp.float32)
                    )
                    self.save("checkpoint_best")

            epoch_metrics = {}
            for k, vs in metrics.items():
                vals = np.asarray([np.asarray(v) for v in vs], dtype=np.float64)
                if k.startswith("gradnorm/"):
                    # per-module gradient norms -> TB histograms per epoch
                    # (reference GradNormLogger, utils.py:168-199,195-199)
                    self._grad_logger.update_scalars(
                        k[len("gradnorm/"):], vals
                    )
                    continue
                if np.isnan(vals).all():
                    continue  # e.g. D-step skipped all epoch
                epoch_metrics[k] = float(np.nanmean(vals))
            self._grad_logger.write(self.writer, epoch + 1)
            self.writer.log(epoch_metrics, epoch + 1)
            if (epoch + 1) % cfg.save_every == 0:
                self.save()

            # schedules (abstract_train.py:198-200). The cosine LR is
            # computed INSIDE the jitted step from state.epoch
            # (state.py::scheduled_lr) — no host-side optimizer mutation.
            self.state = self.state.replace(
                l2_weight=self.state.l2_weight * cfg.l2_decay_rate
            )
            if until_epoch is not None and epoch + 1 >= until_epoch:
                self.save()
                break
        return self

    def check_accuracy(self, loader, num_k=20, predict_strategy="sampling"):
        """Validation metrics (train.py:245-257)."""
        pred_func = self.predictor().get_predict_func(predict_strategy)
        acc = MetricAccumulator()
        rng = jax.random.PRNGKey(0)
        for i, batch in enumerate(loader):
            model_batch = self._device_batch(batch, train=False)
            pred_abs, _, _, _ = pred_func(
                model_batch, jax.random.fold_in(rng, i), num=num_k
            )
            sums = self._metric_sums(
                pred_abs,
                {**model_batch, "scale": jnp.asarray(batch["scale"])},
                (num_k,),
            )
            acc.update(jax.device_get(sums))
        # Pod runs iterate disjoint per-host shards in SPMD lockstep
        # (data/elastic.py), so every process reaches this collective and
        # receives the exact global metric — downstream control flow
        # (best-checkpoint saves are collective orbax ops) cannot diverge.
        acc.sums = allreduce_sums(acc.sums)
        return acc.result()

    def test(self, num_k=20, batch_size=8, **kwargs):
        loader = get_dataloader(
            self.config.dataset, "test", augment=False, batch_size=batch_size,
            data_root=self.config.data_root,
            patch_bank=bool(self.config.patch_bank), bank_mesh=self._mesh,
        )
        return self.check_accuracy(loader, num_k=num_k, **kwargs)

    # ---------------------------------------------------------- checkpoints
    def save(self, name=None):
        if name is None:
            name = f"checkpoint_{int(self.state.epoch)}"
        ckpt.save_checkpoint(self.writer.checkpoint_dir, self.state, name)

    @classmethod
    def load(cls, log_path, exp_name, version, checkpoint="best"):
        """Reference-signature loader (abstract_train.py:250-285)."""
        version_dir = Path(log_path) / exp_name / f"version_{version}"
        return cls.load_from_path(version_dir, checkpoint)

    @classmethod
    def load_from_path(cls, version_path, checkpoint="best"):
        """Rebuild a trainer from a version dir (abstract_train.py:250-296)."""
        version_path = Path(version_path)
        assert "version" in version_path.stem, (
            "Input path should point to a model version directory."
        )
        tags = load_meta_tags(version_path / "meta_tags.csv")
        config = Config.from_dict(tags)
        writer = ExperimentWriter(
            version_path.parent.parent.parent,
            version_path.parent.parent.name,
            version_path.parent.name,
            version=int(version_path.stem.split("_")[1]),
            config=config,
        )
        trainer = cls(config, writer)
        name = ckpt.resolve_checkpoint_name(version_path / "checkpoints", checkpoint)
        trainer.state = ckpt.restore_checkpoint(
            version_path / "checkpoints", jax.device_get(trainer.state), name
        )
        return trainer, config
