"""Fused GAN / L2 / PM losses over masked padded batches.

Replaces the reference's per-scene Python loss loops (train.py:57-125,
metrics.py:6-22) with segment math over the padded ``(S, P)`` layout.
All means over "the batch" are masked means over valid agents.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS_D = 1e-7  # discriminator output squash (discriminators.py:110,204)


def bce(pred, label):
    """Elementwise binary cross entropy on probabilities (torch BCELoss)."""
    return -(label * jnp.log(pred) + (1.0 - label) * jnp.log(1.0 - pred))


def gan_labels(key, smoothness=0.1):
    """Smoothed scalar labels (utils.py:18-25): real ~ U(1-s, 1), fake ~ U(0, s)."""
    kr, kf = jax.random.split(key)
    real = jax.random.uniform(kr, (), minval=1.0 - smoothness, maxval=1.0)
    fake = jax.random.uniform(kf, (), minval=0.0, maxval=smoothness)
    return real, fake


def phi_losses(gan_obj: str):
    """The (phi_1, phi_2, phi_3) objective triple (abstract_train.py:61-85).

    phi_1: D loss on real; phi_2: D loss on fake; phi_3: G adversarial loss.
    Each maps (scores, label_real, label_fake) -> elementwise loss.
    """
    if gan_obj == "NS":
        return (
            lambda d, lr, lf: bce(d, lr),
            lambda d, lr, lf: bce(d, lf),
            lambda d, lr, lf: bce(d, lr),
        )
    if gan_obj == "MM":
        return (
            lambda d, lr, lf: bce(d, lr),
            lambda d, lr, lf: bce(d, lf),
            lambda d, lr, lf: -bce(d, lf),
        )
    if gan_obj == "LS":
        return (
            lambda d, lr, lf: (d - lr) ** 2,
            lambda d, lr, lf: (d - lf) ** 2,
            lambda d, lr, lf: (d - lr) ** 2,
        )
    if gan_obj == "W":
        return (
            lambda d, lr, lf: -d,
            lambda d, lr, lf: d,
            lambda d, lr, lf: -d,
        )
    raise ValueError(f"Objective not supported: {gan_obj}")


def masked_mean(x, mask):
    """Mean of x over elements where mask is True (mask broadcastable to x)."""
    m = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def min_scene_l2(pred_abs, gt_xy, loss_mask, ped_mask, loss_type: str):
    """Joint minimum-over-samples scene L2 loss (train.py:57-75).

    Args:
        pred_abs: (K, S, P, T, 2) sampled absolute predictions.
        gt_xy:    (S, P, T, 2) ground truth (NaNs already zeroed).
        loss_mask: (S, P) valid-agents-with-future mask.
        ped_mask:  (S, P) real (non-padding) agents; the reference divides the
            summed scene minima by the full batch size b (train.py:73), i.e.
            by the number of real agents including NaN-future ones.
        loss_type: "mse" squares the per-step distances; anything else uses
            the plain L2 norm (train.py:61-62).

    Returns:
        scalar loss.
    """
    d = jnp.linalg.norm(pred_abs - gt_xy[None], axis=-1)  # (K, S, P, T)
    if loss_type == "mse":
        d = d**2
    per_agent = d.sum(-1)  # (K, S, P) summed over time
    per_agent = per_agent * loss_mask[None]
    per_scene = per_agent.sum(-1)  # (K, S)
    # Scenes with no valid agents contribute 0 either way.
    min_per_scene = per_scene.min(0)  # (S,)
    b = jnp.maximum(ped_mask.sum(), 1.0)
    return min_per_scene.sum() / b


def count_reweighted_mean(loss, gen_idxs, num_gens, valid):
    """Divide each element by its generator's global sample count, then take a
    masked mean (train.py:92-99: ``adv_loss[gen_idxs == g] /= count_g``).

    Args:
        loss:     (..., ) elementwise losses, same shape as gen_idxs.
        gen_idxs: int array, sampled generator per element.
        valid:    bool mask broadcastable to loss (invalid elements are
                  excluded from both the counts and the mean).
    """
    v = jnp.broadcast_to(valid, gen_idxs.shape)
    onehot = jax.nn.one_hot(gen_idxs, num_gens) * v[..., None]
    counts = onehot.reshape(-1, num_gens).sum(0)  # (G,)
    w = 1.0 / jnp.maximum(counts, 1.0)
    elem_w = w[gen_idxs] * v
    return (loss * elem_w).sum() / jnp.maximum(v.sum(), 1.0)


def softmax_cross_entropy(logits, labels_int):
    """CE matching torch F.cross_entropy(reduction='none')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels_int[..., None], axis=-1)[..., 0]


def normal_log_prob(x, sigma):
    """log N(x; 0, sigma) elementwise (train.py:626-635)."""
    return -0.5 * (x / sigma) ** 2 - jnp.log(sigma) - 0.5 * jnp.log(2.0 * jnp.pi)
