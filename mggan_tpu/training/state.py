"""Train state: parameters, BN/probgan state, two optimizer chains, schedule.

Replaces the reference's mutable trainer object (abstract_train.py:25-85)
with an immutable pytree threaded through one jitted step function.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax

from mggan_tpu.config import Config


@flax.struct.dataclass
class TrainState:
    g_params: Any
    g_state: Any
    d_params: Any
    d_state: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray  # int32 total iterations
    epoch: jnp.ndarray  # int32, 1-based during training (abstract_train.py:110)
    l2_weight: jnp.ndarray  # decayed per epoch (abstract_train.py:198)
    rng: jnp.ndarray
    # Best val/ADE seen so far (+inf before the first validation). Persisted
    # so a resumed run can't overwrite checkpoint_best with a worse model
    # (the reference re-tracks from scratch, abstract_train.py:106).
    best_val: jnp.ndarray


def make_optimizer(lr: float, beta1: float, clip: float):
    """AdamW(lr, (beta1, 0.999), wd=0.01 torch default) with global-norm clip
    (abstract_train.py:45-50; train.py:131-134 clipping)."""

    def build(learning_rate):
        chain = []
        if clip and clip > 0:
            chain.append(optax.clip_by_global_norm(clip))
        chain.append(
            optax.adamw(learning_rate, b1=beta1, b2=0.999, eps=1e-8, weight_decay=0.01)
        )
        return optax.chain(*chain)

    return optax.inject_hyperparams(build)(learning_rate=lr)


def scheduled_lr(base_lr: float, epoch, total_epochs: int):
    """CosineAnnealingLR stepped at each epoch end, eta_min=0
    (abstract_train.py:52-57, 198-200). ``epoch`` is the 1-based current
    epoch carried in ``TrainState``; during epoch e the torch scheduler has
    been stepped e-1 times, so LR = cosine(e-1). Traceable (jnp)."""
    e = jnp.maximum(jnp.asarray(epoch, jnp.float32) - 1.0, 0.0)
    return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * e / total_epochs))


def with_lr(opt_state, lr):
    """Return ``opt_state`` with the injected learning-rate hyperparameter
    functionally replaced (no in-place mutation: the state pytree is donated
    each step and may carry explicit shardings)."""
    return opt_state._replace(
        hyperparams={
            **opt_state.hyperparams,
            "learning_rate": jnp.asarray(lr, jnp.float32),
        }
    )


def init_train_state(config: Config, g_pack, d_pack, rng) -> TrainState:
    g_params, g_state, _ = g_pack
    d_params, d_state, _ = d_pack
    tx_g = make_optimizer(config.g_lr, config.beta1, config.clipping_threshold_g)
    tx_d = make_optimizer(config.d_lr, config.beta1, config.clipping_threshold_d)
    return TrainState(
        g_params=g_params,
        g_state=g_state,
        d_params=d_params,
        d_state=d_state,
        g_opt=tx_g.init(g_params),
        d_opt=tx_d.init(d_params),
        step=jnp.asarray(0, jnp.int32),
        epoch=jnp.asarray(0, jnp.int32),
        l2_weight=jnp.asarray(config.l2_loss_weight, jnp.float32),
        rng=rng,
        best_val=jnp.asarray(jnp.inf, jnp.float32),
    )


def optimizers(config: Config):
    tx_g = make_optimizer(config.g_lr, config.beta1, config.clipping_threshold_g)
    tx_d = make_optimizer(config.d_lr, config.beta1, config.clipping_threshold_d)
    return tx_g, tx_d
