"""Legacy Social-GAN generator/discriminator family.

The reference vendors the original Social-GAN ``TrajectoryGenerator`` /
``TrajectoryDiscriminator`` (social_gan.py:361-757); they are not used by
the main MG-GAN entry point but are part of the component surface.  This is
a functional JAX re-implementation over the padded (S, P) layout:

* encoder LSTM over observed offsets;
* optional pooling of final hidden states (``pool_net`` = PoolHiddenNet,
  ``spool`` = grid SocialPooling);
* an MLP maps [enc_h, pool] -> decoder_h_dim - noise_dim, then global
  (per-scene) or per-ped noise is appended (``add_noise``,
  social_gan.py:476-520);
* decoder LSTM rolls out pred_len steps (optionally re-pooling each step);
* the discriminator encodes the full 20-step trajectory and classifies
  real/fake, with ``local`` (per-ped) or ``global`` (pooled) context.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mggan_tpu.ops import social as social_ops
from mggan_tpu.ops.linear import linear_init, linear_apply, mlp_init, mlp_apply
from mggan_tpu.ops.lstm import lstm_init, lstm_cell, lstm_scan


@dataclass(frozen=True)
class SGANSpec:
    obs_len: int = 8
    pred_len: int = 12
    embedding_dim: int = 16
    encoder_h_dim: int = 32
    decoder_h_dim: int = 32
    mlp_dim: int = 64
    noise_dim: int = 8
    noise_type: str = "gaussian"
    noise_mix_type: str = "global"  # "global" | "ped"
    pooling_type: str = "pool_net"  # "pool_net" | "spool" | "none"
    pool_every_timestep: bool = False
    bottleneck_dim: int = 8
    d_type: str = "local"  # "local" | "global"


def generator_init(key, spec: SGANSpec):
    ks = jax.random.split(key, 6)
    params = {
        "enc_embed": linear_init(ks[0], 2, spec.embedding_dim),
        "encoder": lstm_init(ks[1], spec.embedding_dim, spec.encoder_h_dim),
        "dec_embed": linear_init(ks[2], 2, spec.embedding_dim),
        "decoder": lstm_init(ks[3], spec.embedding_dim, spec.decoder_h_dim),
        "hidden2pos": linear_init(ks[4], spec.decoder_h_dim, 2),
    }
    pool_out = 0
    if spec.pooling_type == "pool_net":
        k1, k2 = jax.random.split(ks[5])
        params["pool"] = {
            "spatial": linear_init(k1, 2, spec.embedding_dim),
            "pre_pool": mlp_init(
                k2,
                [spec.embedding_dim + spec.encoder_h_dim, spec.mlp_dim,
                 spec.bottleneck_dim],
            ),
        }
        pool_out = spec.bottleneck_dim
    elif spec.pooling_type == "spool":
        params["pool"] = {
            "pool": mlp_init(ks[5], [64 * spec.encoder_h_dim, spec.bottleneck_dim])
        }
        pool_out = spec.bottleneck_dim
    ctx_in = spec.encoder_h_dim + pool_out
    ctx_out = spec.decoder_h_dim - spec.noise_dim
    if ctx_in != ctx_out or pool_out or spec.noise_dim:
        params["ctx"] = mlp_init(
            jax.random.fold_in(key, 7), [ctx_in, spec.mlp_dim, ctx_out]
        )
    return params


def _pool(params, spec, last_xy, h, mask):
    if spec.pooling_type == "pool_net":
        return social_ops.pool_hidden_net_apply(params["pool"], last_xy, h, mask)
    if spec.pooling_type == "spool":
        return social_ops.social_pooling_apply(params["pool"], last_xy, h, mask)
    return None


def generator_apply(params, spec: SGANSpec, in_xy, in_dxdy, ped_mask, rng,
                    user_noise=None):
    """(S,P,8,2)/(S,P,7,2) -> (abs, rel) each (S,P,pred_len,2)."""
    s, p = ped_mask.shape
    emb = linear_apply(params["enc_embed"], in_dxdy)
    xs = jnp.swapaxes(emb.reshape(s * p, -1, spec.embedding_dim), 0, 1)
    _, (h_t, _) = lstm_scan(params["encoder"], xs)
    enc_h = h_t.reshape(s, p, -1)

    last_xy = in_xy[:, :, -1]
    feats = enc_h
    pooled = _pool(params, spec, last_xy, enc_h, ped_mask)
    if pooled is not None:
        feats = jnp.concatenate([enc_h, pooled], -1)
    if "ctx" in params:
        feats = mlp_apply(params["ctx"], feats, activation="relu")

    if spec.noise_dim:
        if spec.noise_mix_type == "global":
            z = jax.random.normal(rng, (s, 1, spec.noise_dim))
            z = jnp.broadcast_to(z, (s, p, spec.noise_dim))
        else:
            z = jax.random.normal(rng, (s, p, spec.noise_dim))
        if user_noise is not None:
            z = user_noise
        feats = jnp.concatenate([feats, z], -1)

    h = feats.reshape(s * p, spec.decoder_h_dim)
    c = jnp.zeros_like(h)
    xy = last_xy.reshape(s * p, 2)
    dxdy = in_dxdy[:, :, -1].reshape(s * p, 2)

    outs = []
    for _ in range(spec.pred_len):
        x = linear_apply(params["dec_embed"], dxdy)
        h, c = lstm_cell(params["decoder"], x, h, c)
        hh = h
        if spec.pool_every_timestep and spec.pooling_type != "none":
            pooled = _pool(
                params, spec, xy.reshape(s, p, 2), h.reshape(s, p, -1), ped_mask
            )
            # legacy SGAN re-projects [h, pool] through the context MLP
            hp = jnp.concatenate([h.reshape(s, p, -1), pooled], -1)
            hh = mlp_apply(params["ctx"], hp, activation="relu").reshape(
                s * p, -1
            ) if "ctx" in params else h
        dxdy = linear_apply(params["hidden2pos"], hh[..., : spec.decoder_h_dim])
        xy = xy + dxdy
        outs.append(jnp.concatenate([xy, dxdy], -1))
    seq = jnp.stack(outs, 1).reshape(s, p, spec.pred_len, 4)
    return seq[..., :2], seq[..., 2:]


def discriminator_init(key, spec: SGANSpec):
    ks = jax.random.split(key, 5)
    params = {
        "embed": linear_init(ks[0], 2, spec.embedding_dim),
        "encoder": lstm_init(ks[1], spec.embedding_dim, spec.encoder_h_dim),
        "classifier": mlp_init(
            ks[2], [spec.encoder_h_dim, spec.mlp_dim, 1]
        ),
    }
    if spec.d_type == "global":
        k1, k2 = jax.random.split(ks[3])
        params["pool"] = {
            "spatial": linear_init(k1, 2, spec.embedding_dim),
            "pre_pool": mlp_init(
                k2,
                [spec.embedding_dim + spec.encoder_h_dim, spec.mlp_dim,
                 spec.encoder_h_dim],
            ),
        }
    return params


def discriminator_apply(params, spec: SGANSpec, traj_xy, traj_dxdy, ped_mask):
    """Full 20-step trajectory -> real/fake score (S, P)."""
    s, p = ped_mask.shape
    emb = linear_apply(params["embed"], traj_dxdy)
    xs = jnp.swapaxes(emb.reshape(s * p, -1, spec.embedding_dim), 0, 1)
    _, (h_t, _) = lstm_scan(params["encoder"], xs)
    h = h_t.reshape(s, p, -1)
    if spec.d_type == "global":
        h = social_ops.pool_hidden_net_apply(
            params["pool"], traj_xy[:, :, 0], h, ped_mask
        )
    return mlp_apply(params["classifier"], h, activation="relu")[..., 0]
