"""Import released PyTorch MG-GAN checkpoints into our param pytrees.

The reference ships pretrained 2-8-generator models for BIWI + SDD as torch
``.pth`` state dicts (README.md:69-71; saved by abstract_train.py:235-244
as {"generator": ..., "discriminator": ...}).  This module maps those state
dicts onto our pytrees so released models can be evaluated for metric
parity (SURVEY.md §4 item 4).

Layout translation rules:
* torch Linear stores (out, in) -> ours is (in, out): transpose.
* torch LSTM weight_ih_l0 is (4h, in) with gate order (i, f, g, o) -> ours
  is (in, 4h) with the same gate order: transpose only.
* torch Conv2d OIHW -> ours HWIO: transpose (2, 3, 1, 0).
* N generator decoders ``gs.{i}.*`` -> one stacked pytree (leading axis G).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _lin(sd, prefix):
    return {
        "w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T),
        "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
    }


def _lstm(sd, prefix):
    return {
        "w_ih": jnp.asarray(np.asarray(sd[f"{prefix}.weight_ih_l0"]).T),
        "w_hh": jnp.asarray(np.asarray(sd[f"{prefix}.weight_hh_l0"]).T),
        "b_ih": jnp.asarray(np.asarray(sd[f"{prefix}.bias_ih_l0"])),
        "b_hh": jnp.asarray(np.asarray(sd[f"{prefix}.bias_hh_l0"])),
    }


def _conv(sd, prefix):
    return {
        "w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)),
        "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
    }


def _bn(sd, prefix):
    params = {
        "scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
    }
    state = {
        "mean": jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(np.asarray(sd[f"{prefix}.running_var"])),
    }
    return params, state


def _mlp(sd, prefix, torch_indices):
    """make_mlp Sequential: Linear layers at the given indices."""
    return {
        f"lin{i}": _lin(sd, f"{prefix}.{ti}") for i, ti in enumerate(torch_indices)
    }


def _encoder(sd, prefix):
    out = {"lstm": _lstm(sd, f"{prefix}.encoder")}
    if f"{prefix}.embedding.weight" in sd:
        out["embed"] = _lin(sd, f"{prefix}.embedding")
    return out


def _scene_cnn(sd, prefix):
    params = {
        "conv1": _conv(sd, f"{prefix}.CNN.encoder.ConvBlock_1.Block.Conv_1"),
        "conv2": _conv(sd, f"{prefix}.CNN.encoder.ConvBlock_2.Block.Conv_1"),
        "attn": _mlp(sd, f"{prefix}.cnn_attention", [0, 2]),
    }
    bn1_p, bn1_s = _bn(sd, f"{prefix}.CNN.encoder.ConvBlock_1.Block.BN_1")
    bn2_p, bn2_s = _bn(sd, f"{prefix}.CNN.encoder.ConvBlock_2.Block.BN_1")
    params["bn1"], params["bn2"] = bn1_p, bn2_p
    return params, {"bn1": bn1_s, "bn2": bn2_s}


def _social(sd, prefix, pool_type):
    if pool_type == "sways":
        return {
            "embed": _mlp(sd, f"{prefix}.feature_embedder.fc", [0, 2, 4]),
            "w": _lin(sd, f"{prefix}.attention.W"),
        }
    return {
        "spatial": _lin(sd, f"{prefix}.spatial_embedding"),
        "pre_pool": _mlp(sd, f"{prefix}.mlp_pre_pool", [0, 2]),
    }


def _decoder(sd, prefix):
    return {
        "spatial_embedding": _lin(sd, f"{prefix}.spatial_embedding"),
        "lstm": _lstm(sd, f"{prefix}.decoder"),
        "hidden2pos": _mlp(sd, f"{prefix}.hidden2pos", [0, 2]),
    }


def _stack(trees):
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *trees)


def import_generator(sd, spec):
    """torch ``generator`` state dict -> (params, state) for our pytree."""
    params = {"encoder": _encoder(sd, "encoder")}
    state = {}
    if spec.scene_dim > 0 and "scene_encoder.cnn_attention.0.weight" in sd:
        params["scene"], state["scene"] = _scene_cnn(sd, "scene_encoder")
    if spec.social_feat_size > 0:
        params["social"] = _social(sd, "social", spec.pool_type)
    if spec.discrete:
        params["decoder"] = _decoder(sd, "decoder")
        params["one_hot_sample_encoder"] = _mlp(
            sd, "one_hot_sample_encoder", [0, 2]
        )
    else:
        params["decoders"] = _stack(
            [_decoder(sd, f"gs.{i}") for i in range(spec.num_gens)]
        )
    params["enc_to_dec"] = _mlp(sd, "enc_h_to_dec_h", [0])
    params["net_chooser"] = _mlp(sd, "net_chooser", [0, 2, 4])
    params["net_prior"] = jnp.asarray(np.asarray(sd["net_prior"]))
    return params, state


def import_discriminator(sd, spec):
    """torch ``discriminator`` state dict -> (params, state)."""
    params = {
        "in_encoder": _encoder(sd, "in_encoder"),
        "in_fc": _mlp(sd, "in_encoder_fc", [0, 2]),
        "pred_encoder": _mlp(sd, "pred_encoder", [0, 2]),
    }
    state = {}
    if spec.global_disc:
        params["social"] = _social(sd, "social", spec.pool_type)
    if spec.scene_dim > 0 and "scene_encoder.cnn_attention.0.weight" in sd:
        params["scene"], state["scene"] = _scene_cnn(sd, "scene_encoder")
    params["discs"] = _stack(
        [_mlp(sd, f"discs.{i}", [0, 2]) for i in range(spec.num_discs)]
    )
    if spec.gan_type == "mgan":
        params["branch"] = _mlp(sd, "gen_id_reconstructor", [0, 2])
    elif spec.gan_type == "infogan":
        params["branch"] = _mlp(sd, "code_reconstructor", [0, 2])
    if spec.gan_type == "probgan":
        state["hist"] = {
            "discs": _stack(
                [_mlp(sd, f"discs_hist.{i}", [0, 2]) for i in range(spec.num_discs)]
            ),
            "len": jnp.asarray(1.0),
        }
    return params, state


def load_torch_checkpoint(path, g_spec, d_spec):
    """Load a reference ``checkpoint_*.pth`` -> ((g_params, g_state),
    (d_params, d_state))."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    g_sd = {k: v.numpy() for k, v in obj["generator"].items()}
    d_sd = {k: v.numpy() for k, v in obj["discriminator"].items()}
    return import_generator(g_sd, g_spec), import_discriminator(d_sd, d_spec)
