"""Linear / MLP primitives as explicit param pytrees.

Parameters are plain nested dicts of ``jnp`` arrays so that whole submodules
can be stacked along a leading generator axis and decoded under ``vmap``
(the TPU replacement for the reference's N separate ``RelativeDecoder``
modules, ``standard.py:73-87``).

Initialisation follows PyTorch defaults (both weight and bias
~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))) so training dynamics are comparable
to the reference and released torch checkpoints can be imported 1:1.
Weights are stored as ``(in_features, out_features)`` — the transpose of
torch's layout — so forward is a plain ``x @ w`` feeding the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def linear_init(key, in_features: int, out_features: int, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(in_features)
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(
            wk, (in_features, out_features), dtype, minval=-bound, maxval=bound
        ),
        "b": jax.random.uniform(
            bk, (out_features,), dtype, minval=-bound, maxval=bound
        ),
    }


def linear_apply(params, x):
    return x @ params["w"] + params["b"]


def _activation(name):
    if name == "relu":
        return jax.nn.relu
    if name in ("leaky_relu", "leakyrelu"):
        # torch nn.LeakyReLU default negative_slope=0.01
        return lambda x: jax.nn.leaky_relu(x, 0.01)
    if name == "leaky_relu_02":
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name is None or name == "none":
        return lambda x: x
    raise ValueError(f"unknown activation {name}")


def mlp_init(key, dims: Sequence[int], dtype=jnp.float32):
    """MLP parameters for ``len(dims)-1`` linear layers."""
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"lin{i}": linear_init(k, dims[i], dims[i + 1], dtype)
        for i, k in enumerate(keys)
    }


def mlp_apply(params, x, activation="relu", final_activation=None):
    """Apply an MLP built by :func:`mlp_init`.

    Matches the reference's ``make_mlp`` (utils.py:134-149): the activation
    is applied after every layer except the last.
    """
    n = len(params)
    act = _activation(activation)
    final_act = _activation(final_activation)
    for i in range(n):
        x = linear_apply(params[f"lin{i}"], x)
        if i < n - 1:
            x = act(x)
    return final_act(x)


def mlp_apply_per_layer(params, x, activations: Sequence[str]):
    """Apply an MLP with an explicit activation per layer.

    Mirrors the scene-CNN ``make_mlp`` variant (cnn.py:6-25) where each
    layer carries its own activation (possibly ``None``).
    """
    assert len(activations) == len(params)
    for i, a in enumerate(activations):
        x = linear_apply(params[f"lin{i}"], x)
        x = _activation(a)(x)
    return x
