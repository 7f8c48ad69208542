"""Masked social-interaction ops over padded scene tensors.

The reference computes social context with per-scene / per-ped Python loops
(``social.py:7-30``, ``social_gan.py:201-229``).  Here every scene in the
batch is a row of a dense padded ``(S, P, P)`` pairwise tensor and the whole
batch is one fused masked softmax-matmul — no host loops, fully vectorised
over scenes, peds, and (via vmap at the caller) noise samples.

Conventions:
    S = scenes per batch, P = max peds per scene (padded), mask (S, P) bool.
Pairwise tensors are indexed ``[s, i, j]`` with ``i`` the attending ped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mggan_tpu.ops.linear import linear_apply, mlp_apply

NEG_INF = -1e9


def social_features(last_xy, last_dxdy, mask):
    """Handcrafted pairwise features (dist, bearing, DCA).

    Vectorises ``SocialFeatures``/``BearingMTX``/``DCA_MTX``
    (reference social.py:51-104) over all scenes at once.

    Args:
        last_xy:   (S, P, 2) last observed positions.
        last_dxdy: (S, P, 2) last observed offsets (velocity proxy).
        mask:      (S, P) bool validity.

    Returns:
        (S, P, P, 3) float features; entries involving padded peds are 0.
    """
    # Dp[s, i, j] = x_i - x_j ; Dv likewise (social.py:95-97).
    dp = last_xy[:, :, None, :] - last_xy[:, None, :, :]
    dv = last_dxdy[:, :, None, :] - last_dxdy[:, None, :, :]

    l2 = jnp.linalg.norm(dp, axis=-1)

    # Bearing: cos angle between Dp and v_i (social.py:84-89).
    v_i = last_dxdy[:, :, None, :]
    dot_dp_v = (dp * v_i).sum(-1)
    bearing = dot_dp_v / (
        jnp.linalg.norm(dp, axis=-1) * jnp.linalg.norm(v_i, axis=-1) + 1e-6
    )

    # Distance at closest approach (social.py:67-81).
    dot_dp_dv = (dp * dv).sum(-1)
    dv_sq = (dv * dv).sum(-1) + 1e-6
    ttca = -dot_dp_dv / dv_sq
    dca = jnp.linalg.norm(dp + ttca[..., None] * dv, axis=-1)

    feats = jnp.stack([l2, bearing, dca], axis=-1)
    pair_mask = (mask[:, :, None] & mask[:, None, :])[..., None]
    return jnp.where(pair_mask, feats, 0.0)


def attention_pool(w_params, femb, enc_h, mask):
    """Masked dot-product social attention (``AttentionPooling``, social.py:7-30).

    sigma[s,i,j] = femb[s,i,j] . (W enc_h[s,j]); self and padded peers are
    masked out; peds in single-ped scenes get a zero vector (the reference
    skips N==1 scenes, social.py:19-20).

    Args:
        w_params: linear params (h_dim -> f_dim).
        femb:   (S, P, P, F) embedded pairwise features.
        enc_h:  (S, P, H) per-ped hidden states.
        mask:   (S, P) bool.

    Returns:
        (S, P, H) pooled social context.
    """
    s, p, h = enc_h.shape
    wh = linear_apply(w_params, enc_h)  # (S, P, F)
    sigma = jnp.einsum("sijf,sjf->sij", femb, wh)

    eye = jnp.eye(p, dtype=bool)[None]
    valid_j = mask[:, None, :] & ~eye
    sigma = jnp.where(valid_j, sigma, NEG_INF)

    att = jax.nn.softmax(sigma, axis=-1)
    # Kill rows whose scene has <= 1 valid ped or whose own slot is padding.
    n_valid = mask.sum(-1)  # (S,)
    row_ok = (n_valid[:, None] > 1) & mask
    pooled = jnp.einsum("sij,sjh->sih", att, enc_h)
    return jnp.where(row_ok[..., None], pooled, 0.0)


def social_attention_apply(params, last_xy, last_dxdy, enc_h, mask):
    """Full sways social module (``SocialAttention``, social.py:107-123).

    params = {"embed": mlp [3,32,64,F], "w": linear (H->F)}.
    enc_h may carry extra leading axes (e.g. a samples axis); the pairwise
    geometry is computed once and broadcast.
    """
    femb = mlp_apply(params["embed"], social_features(last_xy, last_dxdy, mask))
    if enc_h.ndim == 3:
        return attention_pool(params["w"], femb, enc_h, mask)
    # Leading sample axes: vmap attention over them, sharing femb.
    lead = enc_h.shape[:-3]
    flat = enc_h.reshape((-1,) + enc_h.shape[-3:])
    out = jax.vmap(lambda e: attention_pool(params["w"], femb, e, mask))(flat)
    return out.reshape(lead + out.shape[1:])


def social_pooling_apply(params, last_xy, enc_h, mask,
                         neighborhood_size=2.0, grid_size=8):
    """Masked grid-based Social-LSTM pooling (``SocialPooling``,
    social_gan.py:232-358).

    Each ped i owns a grid_size x grid_size grid spanning
    ``neighborhood_size`` centred on it; every in-bounds peer j scatter-adds
    its hidden state into cell(i, j).  The reference's scatter_add over an
    offset trick becomes a one-hot einsum over the dense pair tensor.

    params = {"pool": mlp [grid^2 * H, H]}.
    Returns (S, P, H).
    """
    s, p, h = enc_h.shape
    g2 = grid_size * grid_size
    rel = last_xy[:, None, :, :] - last_xy[:, :, None, :]  # pos_j - pos_i
    half = neighborhood_size / 2.0
    # cell coordinates relative to ped i's top-left corner
    cell_x = jnp.floor((rel[..., 0] + half) / neighborhood_size * grid_size)
    # reference measures y downward from the top bound (social_gan.py:273-276)
    cell_y = jnp.floor((half - rel[..., 1]) / neighborhood_size * grid_size)
    in_bounds = (
        (cell_x >= 0) & (cell_x < grid_size) & (cell_y >= 0) & (cell_y < grid_size)
    )
    eye = jnp.eye(p, dtype=bool)[None]
    valid = in_bounds & mask[:, None, :] & mask[:, :, None] & ~eye
    cell = (cell_x + cell_y * grid_size).astype(jnp.int32)
    cell = jnp.clip(cell, 0, g2 - 1)
    onehot = jax.nn.one_hot(cell, g2) * valid[..., None]
    pooled = jnp.einsum("sijg,sjh->sigh", onehot, enc_h)  # (S,P,G2,H)
    pooled = pooled.reshape(s, p, g2 * h)
    out = mlp_apply(params["pool"], pooled, activation="relu")
    return jnp.where(mask[..., None], out, 0.0)


def pool_hidden_net_apply(params, last_xy, enc_h, mask, activation="relu"):
    """Masked SGAN pooling (``PoolHiddenNet.forward``, social_gan.py:201-229).

    rel[s,i,j] = pos_j - pos_i is embedded, concatenated with h_j, passed
    through the pre-pool MLP, and max-pooled over valid peers j (self
    included, as in the reference).

    params = {"spatial": linear (2->emb), "pre_pool": mlp [emb+H, H, bottleneck]}.
    """
    rel = last_xy[:, None, :, :] - last_xy[:, :, None, :]  # (S, P_i, P_j, 2)
    rel_emb = linear_apply(params["spatial"], rel)
    hj = jnp.broadcast_to(
        enc_h[:, None, :, :], rel_emb.shape[:3] + (enc_h.shape[-1],)
    )
    inp = jnp.concatenate([rel_emb, hj], axis=-1)
    pooled = mlp_apply(params["pre_pool"], inp, activation=activation)
    valid_j = (mask[:, None, :] & mask[:, :, None])[..., None]
    pooled = jnp.where(valid_j, pooled, NEG_INF)
    out = pooled.max(axis=2)
    return jnp.where(mask[..., None], out, 0.0)
