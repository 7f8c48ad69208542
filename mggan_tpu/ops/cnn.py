"""Scene-patch CNN + channel attention (reference cnn.py:101-282).

Layout is NHWC (TPU-native); the data layer delivers patches as
(B, 33, 33, 4) float32 [RGB normalised to [-1, 1] + one-hot centre channel].
Convolutions are 3x3/stride 1/pad 1 blocks with BatchNorm + ReLU + 2x2 max
pool, exactly two blocks for the in-model attention encoder
(``AttentionGlobal(num_layers=2)``, standard.py:58-60).

BatchNorm carries running statistics in a separate ``state`` pytree;
``train=True`` uses batch statistics and returns updated running stats
(torch semantics: momentum 0.1, eps 1e-5, unbiased running var).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mggan_tpu.ops.linear import mlp_init, mlp_apply_per_layer


def conv_init(key, in_ch, out_ch, ksize=3, dtype=jnp.float32):
    """Kaiming-normal fan-in init for ReLU (cnn.py:257-261), bias 0.01."""
    fan_in = in_ch * ksize * ksize
    std = np.sqrt(2.0 / fan_in)
    w = jax.random.normal(key, (ksize, ksize, in_ch, out_ch), dtype) * std
    return {"w": w, "b": jnp.full((out_ch,), 0.01, dtype)}


def conv_apply(params, x, compute_dtype=None):
    """3x3/s1/p1 conv. ``compute_dtype`` (e.g. bf16) casts BOTH the operands
    and the conv OUTPUT — the stage is HBM-bound on its (B,33,33,C)
    intermediates at production batch sizes, so halving the activation
    bytes matters more than the MXU rate."""
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x, w, b = (
            x.astype(compute_dtype),
            w.astype(compute_dtype),
            b.astype(compute_dtype),
        )
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
    )
    return y + b


def bn_init(ch, dtype=jnp.float32):
    params = {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}
    state = {"mean": jnp.zeros((ch,), dtype), "var": jnp.ones((ch,), dtype)}
    return params, state


def bn_apply(params, state, x, train: bool, momentum=0.1, eps=1e-5, mask=None):
    """``mask`` (leading-axis bool, optional): rows excluded from the batch
    statistics. The padded (S,P) layout feeds placeholder patches for absent
    peds; the reference's dense N-ped batch never sees them (its BN
    normalizes over exactly the real peds), so masked rows must not drag
    the train-time mean/var."""
    if train:
        axes = tuple(range(x.ndim - 1))
        if mask is None:
            mean = x.mean(axes)
            var = x.var(axes)
            n = np.prod([x.shape[a] for a in axes])
            unbiased = var * n / max(n - 1, 1)
        else:
            w = mask.astype(x.dtype).reshape(
                (mask.shape[0],) + (1,) * (x.ndim - 1)
            )
            per_row = float(np.prod(x.shape[1:-1]))
            n = jnp.maximum(mask.sum().astype(x.dtype) * per_row, 1.0)
            mean = (x * w).sum(axes) / n
            var = (w * (x - mean) ** 2).sum(axes) / n
            unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_state


def max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def scene_cnn_init(key, channels_cnn: int, in_channels: int = 4, num_layers: int = 2):
    """Two conv blocks + channel-attention MLP (``AttentionGlobal``)."""
    assert num_layers == 2, "reference instantiates num_layers=2 (standard.py:58)"
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "conv1": conv_init(k1, in_channels, channels_cnn),
        "conv2": conv_init(k2, channels_cnn, channels_cnn),
        # attention dims [C, mlp_dim=32, C], activations [leakyrelu, none]
        # (cnn.py:81-90)
        "attn": mlp_init(k3, [channels_cnn, 32, channels_cnn]),
    }
    bn1_p, bn1_s = bn_init(channels_cnn)
    bn2_p, bn2_s = bn_init(channels_cnn)
    params["bn1"], params["bn2"] = bn1_p, bn2_p
    state = {"bn1": bn1_s, "bn2": bn2_s}
    return params, state


def attention_head(params, x):
    """Channel attention over the conv-stack output (cnn.py:109-116):
    (B, 8, 8, C) -> (B, 64)."""
    b, hh, ww, c = x.shape
    feats = x.reshape(b, hh * ww, c)
    scores = mlp_apply_per_layer(params["attn"], feats, ["leakyrelu", "none"])
    att = jax.nn.softmax(scores, axis=2)
    return (att * feats).sum(-1)  # (B, H*W) = (B, 64)


def scene_cnn_apply(params, state, patches, train: bool, mask=None,
                    compute_dtype=None):
    """(B, 33, 33, 4) -> (B, 64) scene encoding (cnn.py:109-116).

    The conv stack yields (B, 8, 8, C); attention scores are softmaxed over
    the channel axis and channel-summed, giving one scalar per spatial cell.
    ``mask`` (B,) excludes padded peds from BN batch statistics.

    ``compute_dtype`` (e.g. bf16, eval-only — ignored when ``train`` so
    batch statistics and the G-step's gradients stay f32): runs the conv
    stack with ``compute_dtype`` activations end-to-end. The stage is
    HBM-bound — at 65k patches the f32 intermediates ((B,33,33,C) conv1
    output alone is ~9 GB of traffic) dwarf the ~0.5 TFLOP of conv math —
    so halving activation bytes is the first-order win. Eval-mode BN is a
    per-channel affine, FOLDED into the conv weights/bias here (zero extra
    passes); the tiny attention head stays f32.

    Perf note: a fused Pallas "transposed row-strip Toeplitz" kernel for
    this stack was built and measured in round 3 — 24.4 ms vs XLA's
    27.1 ms standalone at 65k patches, but SLOWER end-to-end inside the
    sampling jit (102 vs 98 ms; the input transpose does not fuse and XLA
    overlaps its own conv better) — so the XLA conv stack stays
    (BASELINE.md round-3 breakdown).
    """
    if compute_dtype is not None and not train:
        eps = 1e-5
        folded = {}
        for conv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
            g = params[bn]["scale"] * jax.lax.rsqrt(state[bn]["var"] + eps)
            folded[conv] = {
                "w": params[conv]["w"] * g,  # (3,3,I,O) * (O,)
                "b": (params[conv]["b"] - state[bn]["mean"]) * g
                     + params[bn]["bias"],
            }
        x = conv_apply(folded["conv1"], patches, compute_dtype)
        x = jax.nn.relu(x)
        x = max_pool_2x2(x)
        x = conv_apply(folded["conv2"], x, compute_dtype)
        x = jax.nn.relu(x)
        x = max_pool_2x2(x)  # (B, 8, 8, C)
        return attention_head(params, x.astype(jnp.float32)), state

    x = conv_apply(params["conv1"], patches)
    x, bn1 = bn_apply(params["bn1"], state["bn1"], x, train, mask=mask)
    x = jax.nn.relu(x)
    x = max_pool_2x2(x)
    x = conv_apply(params["conv2"], x)
    x, bn2 = bn_apply(params["bn2"], state["bn2"], x, train, mask=mask)
    x = jax.nn.relu(x)
    x = max_pool_2x2(x)  # (B, 8, 8, C)

    return attention_head(params, x), {"bn1": bn1, "bn2": bn2}
