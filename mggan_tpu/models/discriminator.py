"""Trajectory discriminator ensemble (reference discriminators.py:12-263).

Dense/masked TPU version: the sample axis K is vmapped, the head ensemble is
a stacked pytree, and the probgan Polyak history lives in the state pytree
(replacing the frozen ``discs_hist`` module copy + ``update_hist`` loop,
discriminators.py:87-95,246-263).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mggan_tpu.ops.linear import (
    linear_init,
    mlp_init,
    mlp_apply,
    mlp_apply_per_layer,
)
from mggan_tpu.ops import social as social_ops
from mggan_tpu.ops.cnn import scene_cnn_init, scene_cnn_apply
from mggan_tpu.ops.losses import EPS_D
from mggan_tpu.models import common


@dataclass(frozen=True)
class DiscriminatorSpec:
    h_dim: int  # already doubled by the factory (= config.h_dim * 2)
    inp_format: str
    pred_len: int
    num_discs: int
    num_gens: int
    gan_type: str
    global_disc: bool
    scene_dim: int
    pool_type: str
    unbound_output: bool

    @property
    def classifier_dim(self) -> int:
        d = self.h_dim * (2 if self.global_disc else 1)
        return d + self.scene_dim


def init(key, spec: DiscriminatorSpec):
    h = spec.h_dim
    inp = common.input_size(spec.inp_format)
    ks = jax.random.split(key, 8)
    params = {
        "in_encoder": common.trajectory_encoder_init(ks[0], inp, h, h),
        # Linear(h, h/2) + LeakyReLU(0.2) + Linear(h/2, h/2)
        "in_fc": mlp_init(ks[1], [h, h // 2, h // 2]),
        # Linear(T*inp, h) + LeakyReLU(0.2) + Linear(h, h/2)
        "pred_encoder": mlp_init(ks[2], [spec.pred_len * inp, h, h // 2]),
    }
    state = {}
    if spec.global_disc:
        if spec.pool_type == "sways":
            params["social"] = {
                "embed": mlp_init(ks[3], [3, 32, 64, h]),
                "w": linear_init(ks[4], h, h),
            }
        else:
            # PoolHiddenNet(embedding_dim=16, ...) (discriminators.py:62-67)
            params["social"] = {
                "spatial": linear_init(ks[3], 2, 16),
                "pre_pool": mlp_init(ks[4], [16 + h, h, h]),
            }
    if spec.scene_dim > 0:
        params["scene"], state["scene"] = scene_cnn_init(ks[5], channels_cnn=8)

    cd = spec.classifier_dim
    head_keys = jax.random.split(ks[6], spec.num_discs)
    params["discs"] = jax.vmap(lambda k: mlp_init(k, [cd, cd // 2, 1]))(head_keys)
    if spec.gan_type == "mgan":
        params["branch"] = mlp_init(ks[7], [cd, cd // 2, spec.num_gens])
    elif spec.gan_type == "infogan":
        params["branch"] = mlp_init(ks[7], [cd, cd // 2, 3])
    if spec.gan_type == "probgan":
        state["hist"] = {
            "discs": jax.tree.map(jnp.copy, params["discs"]),
            "len": jnp.asarray(1.0),
        }
    return params, state


def _classifier_input(params, spec, in_xy, in_dxdy, pred_xy, pred_dxdy,
                      ped_mask, future_valid, patches, state, train):
    """Shared encoding path (discriminators.py:113-196) -> (K,S,P,CD)."""
    if spec.inp_format == "rel":
        in_inp, pred_inp = in_dxdy, pred_dxdy
    elif spec.inp_format == "abs":
        in_inp, pred_inp = in_xy, pred_xy
    else:
        in_inp = jnp.concatenate([in_xy, in_dxdy], axis=-1)
        pred_inp = jnp.concatenate([pred_xy, pred_dxdy], axis=-1)

    k, s, p = pred_xy.shape[:3]
    in_enc = common.trajectory_encoder_apply(params["in_encoder"], in_inp)
    in_enc = mlp_apply_per_layer(params["in_fc"], in_enc, ["leaky_relu_02", "none"])

    pred_flat = pred_inp.reshape(k, s, p, -1)
    pred_enc = mlp_apply_per_layer(
        params["pred_encoder"], pred_flat, ["leaky_relu_02", "none"]
    )
    # Zero the future encoding of agents without a valid future
    # (discriminators.py:135-138).
    pred_enc = pred_enc * future_valid[None, :, :, None]

    in_enc_b = jnp.broadcast_to(in_enc[None], (k,) + in_enc.shape)
    enc = jnp.concatenate([in_enc_b, pred_enc], axis=-1)  # (K,S,P,h)

    new_state = dict(state)
    if spec.global_disc:
        last_xy = in_xy[..., -1, :]
        last_dxdy = in_dxdy[..., -1, :]
        if spec.pool_type == "sways":
            soc = social_ops.social_attention_apply(
                params["social"], last_xy, last_dxdy, enc, ped_mask
            )
        else:
            soc = jax.vmap(
                lambda e: social_ops.pool_hidden_net_apply(
                    params["social"], last_xy, e, ped_mask
                )
            )(enc)
        cls = jnp.concatenate([soc, enc], axis=-1)
    else:
        cls = enc

    if spec.scene_dim > 0 and patches is not None:
        flat = patches.reshape((s * p,) + patches.shape[2:])
        scene_enc, scene_state = scene_cnn_apply(
            params["scene"], state["scene"], flat, train,
            mask=ped_mask.reshape(s * p),
        )
        scene_enc = scene_enc.reshape(s, p, -1)
        new_state["scene"] = scene_state
        cls = jnp.concatenate(
            [cls, jnp.broadcast_to(scene_enc[None], (k,) + scene_enc.shape)], axis=-1
        )
    return cls, new_state


def _head_scores(heads, spec, cls):
    """(K,S,P,CD) -> (K,S,P,D) per-head scores with eps squash."""
    out = jax.vmap(
        lambda hp: mlp_apply_per_layer(hp, cls, ["leaky_relu_02", "none"])
    )(heads)  # (D, K, S, P, 1)
    out = jnp.moveaxis(out[..., 0], 0, -1)  # (K, S, P, D)
    if not spec.unbound_output:
        out = jax.nn.sigmoid(out)
        out = out * (1 - 2 * EPS_D) + EPS_D
    return out


def apply(params, state, spec: DiscriminatorSpec, in_xy, in_dxdy, pred_xy,
          pred_dxdy, ped_mask, future_valid, patches=None, train=True,
          return_all=False, use_hist=False):
    """Score (and branch-classify) K prediction samples.

    Args:
        in_xy/in_dxdy: (S,P,8,2)/(S,P,7,2) observed.
        pred_xy/pred_dxdy: (K,S,P,12,2) candidate futures.
        ped_mask: (S,P) real agents; future_valid: (S,P) finite-future agents.
        use_hist: score with the probgan Polyak-averaged history heads
            (``forward_by_hist``, discriminators.py:221-244).

    Returns:
        (scores, branch, new_state): scores (K,S,P) (or (K,S,P,D) when
        return_all), branch (K,S,P,C) or None.
    """
    cls, new_state = _classifier_input(
        params, spec, in_xy, in_dxdy, pred_xy, pred_dxdy,
        ped_mask, future_valid, patches, state, train,
    )
    heads = state["hist"]["discs"] if use_hist else params["discs"]
    out = _head_scores(heads, spec, cls)
    scores = out if return_all else out.mean(-1)

    branch = None
    if spec.gan_type == "mgan" or spec.gan_type == "infogan":
        branch = mlp_apply_per_layer(params["branch"], cls, ["leaky_relu_02", "none"])
    return scores, branch, new_state


def update_hist(params, state):
    """Polyak-average live heads into the history copy
    (discriminators.py:246-263): len += 1; hist = hist*(1-a) + live*a, a=1/len.
    """
    hist = state["hist"]
    new_len = hist["len"] + 1.0
    alpha = 1.0 / new_len
    new_discs = jax.tree.map(
        lambda old, new: old * (1 - alpha) + new * alpha, hist["discs"], params["discs"]
    )
    return {**state, "hist": {"discs": new_discs, "len": new_len}}
