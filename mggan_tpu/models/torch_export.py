"""Export our trained param pytrees as reference-format PyTorch checkpoints.

Exact inverse of models/torch_import.py: produces state dicts with the
reference's key names and layouts (standard.py / discriminators.py module
tree; saved like abstract_train.py:235-244 as ``{"generator": ...,
"discriminator": ...}``), plus a test_tube-style ``meta_tags.csv`` version
dir, so a model trained in this framework loads straight into the
reference's ``PiNetMultiGeneratorGAN.load_from_path``
(abstract_train.py:250-296) for independent evaluation with the reference's
own code — the reverse direction of cli/convert.py.

Layout translation (mirror of torch_import's rules):
* ours Linear (in, out) -> torch (out, in): transpose.
* ours LSTM (in, 4h) / (h, 4h), gate order (i, f, g, o) -> torch
  ``weight_*_l0`` (4h, in): transpose only.
* ours Conv HWIO -> torch OIHW: transpose (3, 2, 0, 1).
* stacked decoder pytree (leading axis G) -> ``gs.{i}.*`` modules.
* BN running stats come from the model *state* tree; ``num_batches_tracked``
  is emitted as 0 (torch tracks it for momentum=None only).

Optimizer moments are not exported (torch Adam state is not representable
from optax's by design — same policy as the forward converter).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _np(x):
    return np.asarray(x)


def _lin(p, prefix, out):
    out[f"{prefix}.weight"] = _np(p["w"]).T
    out[f"{prefix}.bias"] = _np(p["b"])


def _lstm(p, prefix, out):
    out[f"{prefix}.weight_ih_l0"] = _np(p["w_ih"]).T
    out[f"{prefix}.weight_hh_l0"] = _np(p["w_hh"]).T
    out[f"{prefix}.bias_ih_l0"] = _np(p["b_ih"])
    out[f"{prefix}.bias_hh_l0"] = _np(p["b_hh"])


def _conv(p, prefix, out):
    out[f"{prefix}.weight"] = _np(p["w"]).transpose(3, 2, 0, 1)
    out[f"{prefix}.bias"] = _np(p["b"])


def _bn(params, state, prefix, out):
    out[f"{prefix}.weight"] = _np(params["scale"])
    out[f"{prefix}.bias"] = _np(params["bias"])
    out[f"{prefix}.running_mean"] = _np(state["mean"])
    out[f"{prefix}.running_var"] = _np(state["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _mlp(p, prefix, torch_indices, out):
    for i, ti in enumerate(torch_indices):
        _lin(p[f"lin{i}"], f"{prefix}.{ti}", out)


def _encoder(p, prefix, out):
    _lstm(p["lstm"], f"{prefix}.encoder", out)
    if "embed" in p:
        _lin(p["embed"], f"{prefix}.embedding", out)


def _scene_cnn(params, state, prefix, out):
    _conv(params["conv1"], f"{prefix}.CNN.encoder.ConvBlock_1.Block.Conv_1", out)
    _conv(params["conv2"], f"{prefix}.CNN.encoder.ConvBlock_2.Block.Conv_1", out)
    _mlp(params["attn"], f"{prefix}.cnn_attention", [0, 2], out)
    _bn(params["bn1"], state["bn1"],
        f"{prefix}.CNN.encoder.ConvBlock_1.Block.BN_1", out)
    _bn(params["bn2"], state["bn2"],
        f"{prefix}.CNN.encoder.ConvBlock_2.Block.BN_1", out)


def _social(p, prefix, pool_type, out):
    if pool_type == "sways":
        _mlp(p["embed"], f"{prefix}.feature_embedder.fc", [0, 2, 4], out)
        _lin(p["w"], f"{prefix}.attention.W", out)
    else:
        _lin(p["spatial"], f"{prefix}.spatial_embedding", out)
        _mlp(p["pre_pool"], f"{prefix}.mlp_pre_pool", [0, 2], out)


def _decoder(p, prefix, out):
    _lin(p["spatial_embedding"], f"{prefix}.spatial_embedding", out)
    _lstm(p["lstm"], f"{prefix}.decoder", out)
    _mlp(p["hidden2pos"], f"{prefix}.hidden2pos", [0, 2], out)


def _unstack(tree, i):
    import jax

    return jax.tree.map(lambda x: x[i], tree)


def export_generator(params, state, spec) -> dict:
    """Our (params, state) -> torch ``generator`` state dict (numpy)."""
    out = {}
    _encoder(params["encoder"], "encoder", out)
    if "scene" in params:
        _scene_cnn(params["scene"], state["scene"], "scene_encoder", out)
    if "social" in params:
        _social(params["social"], "social", spec.pool_type, out)
    if spec.discrete:
        _decoder(params["decoder"], "decoder", out)
        _mlp(params["one_hot_sample_encoder"], "one_hot_sample_encoder",
             [0, 2], out)
    else:
        for i in range(spec.num_gens):
            _decoder(_unstack(params["decoders"], i), f"gs.{i}", out)
    _mlp(params["enc_to_dec"], "enc_h_to_dec_h", [0], out)
    _mlp(params["net_chooser"], "net_chooser", [0, 2, 4], out)
    out["net_prior"] = _np(params["net_prior"])
    return out


def export_discriminator(params, state, spec) -> dict:
    """Our (params, state) -> torch ``discriminator`` state dict (numpy)."""
    out = {}
    _encoder(params["in_encoder"], "in_encoder", out)
    _mlp(params["in_fc"], "in_encoder_fc", [0, 2], out)
    _mlp(params["pred_encoder"], "pred_encoder", [0, 2], out)
    if "social" in params:
        _social(params["social"], "social", spec.pool_type, out)
    if "scene" in params:
        _scene_cnn(params["scene"], state["scene"], "scene_encoder", out)
    for i in range(spec.num_discs):
        _mlp(_unstack(params["discs"], i), f"discs.{i}", [0, 2], out)
    if spec.gan_type == "mgan":
        _mlp(params["branch"], "gen_id_reconstructor", [0, 2], out)
    elif spec.gan_type == "infogan":
        _mlp(params["branch"], "code_reconstructor", [0, 2], out)
    if spec.gan_type == "probgan" and "hist" in state:
        for i in range(spec.num_discs):
            _mlp(_unstack(state["hist"]["discs"], i), f"discs_hist.{i}",
                 [0, 2], out)
    return out


def save_torch_checkpoint(path, g_sd: dict, d_sd: dict):
    """Write the two numpy state dicts as a reference ``checkpoint_*.pth``."""
    import torch

    obj = {
        "generator": {k: torch.from_numpy(np.ascontiguousarray(v))
                      for k, v in g_sd.items()},
        "discriminator": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in d_sd.items()},
    }
    torch.save(obj, path)


def export_version_dir(out_dir, config, g_spec, d_spec, state,
                       version=0, checkpoint_name="checkpoint_best"):
    """Write a reference-layout version dir the reference's
    ``load_from_path`` consumes: ``<out>/<name>/version_N/{meta_tags.csv,
    checkpoints/<checkpoint_name>.pth}``. Returns the version dir.

    Note the reference resolves ``log_path/exp_name/version_N`` where
    exp_name is the model *name* directory (abstract_train.py:251-253), so
    the layout here is ``<out_dir>/<config.name>/version_<version>``.
    """
    import csv

    vdir = Path(out_dir) / config.name / f"version_{version}"
    (vdir / "checkpoints").mkdir(parents=True, exist_ok=True)
    with open(vdir / "meta_tags.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["key", "value"])
        for k, v in config.to_dict().items():
            w.writerow([k, v])
    g_sd = export_generator(state.g_params, state.g_state, g_spec)
    d_sd = export_discriminator(state.d_params, state.d_state, d_spec)
    save_torch_checkpoint(vdir / "checkpoints" / f"{checkpoint_name}.pth",
                          g_sd, d_sd)
    return vdir
