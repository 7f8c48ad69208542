"""Shared model components: trajectory encoder + relative decoder.

TPU design notes
----------------
* The encoder LSTM is a ``lax.scan`` over time with (scenes*peds) as the
  batch row axis (reference: ``TrajectoryEncoder``, common_modules.py:24-66).
* The autoregressive decoder is a 12-step ``lax.scan`` whose carry holds
  ``(h, c, last_xy, last_dxdy)`` (reference: ``RelativeDecoder`` Python loop,
  common_modules.py:97-131).
* All N generator decoders are ONE pytree with a leading ``G`` axis, decoded
  under ``vmap`` — every generator always decodes and sampled outputs are
  gathered afterwards (replacing standard.py:186-214's dynamic indexing,
  which would force dynamic shapes on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mggan_tpu.ops.linear import linear_init, linear_apply, mlp_init
from mggan_tpu.ops.lstm import lstm_init, lstm_scan


class GeneratorOutput(NamedTuple):
    """(rel, abs) prediction pair (common_modules.py:9)."""

    rel: jnp.ndarray
    abs: jnp.ndarray


def input_size(inp_format: str) -> int:
    return 4 if inp_format == "abs_rel" else 2


def get_input(in_xy, in_dxdy, inp_format: str):
    """Select encoder input per format (common_modules.py:12-21).

    in_xy: (S, P, 8, 2); in_dxdy: (S, P, 7, 2).
    For ``abs_rel`` the first offset is repeated so both spans are 8 steps.
    """
    if inp_format == "rel":
        return in_dxdy
    if inp_format == "abs":
        return in_xy
    dxdy = jnp.concatenate([in_dxdy[..., :1, :], in_dxdy], axis=-2)
    return jnp.concatenate([in_xy, dxdy], axis=-1)


# ---------------------------------------------------------------------------
# Trajectory encoder
# ---------------------------------------------------------------------------


def trajectory_encoder_init(key, inp_size, hidden_size, embedding_dim):
    k1, k2 = jax.random.split(key)
    params = {"lstm": lstm_init(k2, embedding_dim or inp_size, hidden_size)}
    if embedding_dim is not None:
        params["embed"] = linear_init(k1, inp_size, embedding_dim)
    return params


def trajectory_encoder_apply(params, inp, return_hc=False):
    """Encode (S, P, T, D) trajectories -> (S, P, H) final hidden state."""
    s, p, t, d = inp.shape
    x = inp.reshape(s * p, t, d)
    if "embed" in params:
        x = linear_apply(params["embed"], x)
    x = jnp.swapaxes(x, 0, 1)  # (T, N, D) time-major for the scan
    _, (h_t, c_t) = lstm_scan(params["lstm"], x)
    h = h_t.reshape(s, p, -1)
    if return_hc:
        return h, c_t.reshape(s, p, -1)
    return h


# ---------------------------------------------------------------------------
# Relative decoder (single generator)
# ---------------------------------------------------------------------------


def relative_decoder_init(
    key, embedding_dim, h_dim, inp_format, social_feat_size
):
    in_dim = input_size(inp_format)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "spatial_embedding": linear_init(k1, in_dim, embedding_dim),
        "lstm": lstm_init(k2, embedding_dim, h_dim),
        # [h + social, h//2, 2] with leaky_relu (common_modules.py:93-95)
        "hidden2pos": mlp_init(k3, [h_dim + social_feat_size, h_dim // 2, 2]),
    }


def relative_decoder_apply(
    params, last_xy, last_dxdy, social_feats, h0, pred_len: int,
    inp_format: str, compute_dtype=None,
):
    """12-step autoregressive rollout as one ``lax.scan``.

    Args:
        last_xy/last_dxdy: (N, 2) last observed position / offset.
        social_feats: (N, F) (F may be 0).
        h0: (N, H) initial hidden state (c0 = 0; standard.py:252).

    Returns:
        (abs, rel): each (N, pred_len, 2).

    TPU optimisation: the reference applies ``spatial_embedding`` then feeds
    the LSTM (common_modules.py:118-119) with no nonlinearity in between, so
    the embedding folds algebraically into the gate matmul:
    ``gates = [to_embed, h] @ [[We @ W_ih], [W_hh]] + (be @ W_ih + b)`` —
    ONE fused MXU matmul per step instead of three. Likewise the social
    features are constant across steps, so their hidden2pos contribution
    ``social @ W1_soc`` is hoisted out of the scan.

    ``compute_dtype=jnp.bfloat16`` runs the recurrent matmuls in bf16
    (serving fast path); the position integration stays fp32.
    """
    c0 = jnp.zeros_like(h0)
    emb, lstm, h2p = params["spatial_embedding"], params["lstm"], params["hidden2pos"]
    w_comb = jnp.concatenate([emb["w"] @ lstm["w_ih"], lstm["w_hh"]], axis=0)
    b_comb = emb["b"] @ lstm["w_ih"] + lstm["b_ih"] + lstm["b_hh"]

    h_dim = lstm["w_hh"].shape[0]
    w1 = h2p["lin0"]["w"]  # (h + F, h//2)
    w1_h, w1_soc = w1[:h_dim], w1[h_dim:]
    soc_contrib = social_feats @ w1_soc + h2p["lin0"]["b"]  # hoisted

    cd = compute_dtype
    if cd is not None:
        w_comb, w1_h, soc_contrib = (
            w_comb.astype(cd), w1_h.astype(cd), soc_contrib.astype(cd)
        )
        h0, c0 = h0.astype(cd), c0.astype(cd)
        w2c = {"w": h2p["lin1"]["w"].astype(cd), "b": h2p["lin1"]["b"].astype(cd)}
    else:
        w2c = h2p["lin1"]

    def step(carry, _):
        h, c, xy, dxdy = carry
        if inp_format == "rel":
            to_embed = dxdy
        elif inp_format == "abs":
            to_embed = xy
        else:
            to_embed = jnp.concatenate([xy, dxdy], axis=-1)
        if cd is not None:
            to_embed = to_embed.astype(cd)
        gates = (
            jnp.concatenate([to_embed, h], axis=-1) @ w_comb
        ).astype(jnp.float32) + b_comb
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = (jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)).astype(
            h.dtype
        )
        h = (jax.nn.sigmoid(o) * jnp.tanh(c.astype(jnp.float32))).astype(h.dtype)
        hid = jax.nn.leaky_relu(h @ w1_h + soc_contrib, 0.01)
        new_dxdy = linear_apply(w2c, hid).astype(jnp.float32)
        new_xy = xy + new_dxdy
        return (h, c, new_xy, new_dxdy), (new_xy, new_dxdy)

    (_, _, _, _), (abs_seq, rel_seq) = jax.lax.scan(
        step, (h0, c0, last_xy, last_dxdy), None, length=pred_len
    )
    return jnp.swapaxes(abs_seq, 0, 1), jnp.swapaxes(rel_seq, 0, 1)


def stacked_decoders_init(key, num_gens, embedding_dim, h_dim, inp_format, social_feat_size):
    """N decoders as one pytree with leading axis G (standard.py:73-87)."""
    keys = jax.random.split(key, num_gens)
    return jax.vmap(
        lambda k: relative_decoder_init(
            k, embedding_dim, h_dim, inp_format, social_feat_size
        )
    )(keys)


def stacked_decoders_apply(
    stacked, last_xy, last_dxdy, social_feats, h0, pred_len: int,
    inp_format: str, compute_dtype=None,
):
    """vmap the rollout over the generator axis with shared inputs.

    Returns (abs, rel): each (G, N, pred_len, 2).
    """
    return jax.vmap(
        lambda p: relative_decoder_apply(
            p, last_xy, last_dxdy, social_feats, h0, pred_len, inp_format,
            compute_dtype,
        )
    )(stacked)
