"""Noise and categorical-selection ops.

TPU notes: per-scene shared noise (the reference's ``get_global_noise``
Python loop, utils.py:160-165) is a single draw over the scene axis
broadcast over peds; categorical draws use Gumbel argmax which vectorises
over (agent, sample) without host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def global_noise(key, num_samples: int, s: int, p: int, dim: int, noise_type="gaussian"):
    """Per-scene noise shared by all peds of a scene (utils.py:160-165).

    Returns (num_samples, S, P, dim); identical across the P axis.
    """
    if noise_type == "gaussian":
        z = jax.random.normal(key, (num_samples, s, 1, dim))
    elif noise_type == "uniform":
        z = jax.random.uniform(key, (num_samples, s, 1, dim), minval=-1.0, maxval=1.0)
    else:
        raise ValueError(f'Unrecognized noise type "{noise_type}"')
    return jnp.broadcast_to(z, (num_samples, s, p, dim))


def categorical(key, logits, num_samples: int):
    """Sample generator indices per (agent, sample) (standard.py:217-225).

    Args:
        logits: (..., G).
    Returns:
        int32 (..., num_samples).
    """
    g = logits.shape[-1]
    u = jax.random.uniform(
        key, (num_samples,) + logits.shape, minval=1e-20, maxval=1.0
    )
    gumbel = -jnp.log(-jnp.log(u))
    idx = jnp.argmax(logits[None] + gumbel, axis=-1)  # (num_samples, ...)
    return jnp.moveaxis(idx, 0, -1).astype(jnp.int32)


def selection_indices(sampled_idxs):
    """Occurrence counters: out[..., k] = #times sampled_idxs[..., k] appeared
    earlier in the same row (utils.py:234-248, vectorised).

    e.g. [1, 2, 3, 1] -> [0, 0, 0, 1].
    """
    k = sampled_idxs.shape[-1]
    same = sampled_idxs[..., :, None] == sampled_idxs[..., None, :]  # (..., k, k)
    earlier = jnp.tril(jnp.ones((k, k), dtype=bool), k=-1)
    return (same & earlier).sum(-1).astype(jnp.int32)


def gather_samples(decoded, gen_idxs):
    """Pick the sampled generator's rollout per (agent, sample).

    Replaces the reference's occurrence-offset fancy-indexing
    (standard.py:186-214): we decode all generators for every sample (cheap
    on TPU — one extra vmap axis on the MXU) and gather with a one-hot
    contraction, which XLA fuses and which keeps gradients flowing only to
    the selected generator.

    Args:
        decoded: (K, G, S, P, ...) all-generator rollouts.
        gen_idxs: (S, P, K) int sampled generator per agent and sample.

    Returns:
        (K, S, P, ...) selected rollouts.
    """
    k, g = decoded.shape[0], decoded.shape[1]
    onehot = jax.nn.one_hot(gen_idxs, g, dtype=decoded.dtype)  # (S, P, K, G)
    onehot = jnp.moveaxis(onehot, (0, 1, 2, 3), (2, 3, 0, 1))  # (K, G, S, P)
    extra = decoded.ndim - onehot.ndim
    sel = (decoded * onehot.reshape(onehot.shape + (1,) * extra)).sum(1)
    return sel
