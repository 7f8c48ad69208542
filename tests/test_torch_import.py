"""Checkpoint-import parity: a torch model with reference-style state-dict
keys is converted and must reproduce outputs numerically (SURVEY.md §4
item 4 / hard part 6: LSTM gate order + weight layout translation)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from mggan_tpu.models import generator as G_mod
from mggan_tpu.models import torch_import
from mggan_tpu.ops.cnn import scene_cnn_apply


EMB, H, Z, NG = 8, 16, 4, 3


class TEncoder(nn.Module):
    def __init__(self, inp=2):
        super().__init__()
        self.embedding = nn.Linear(inp, EMB)
        self.encoder = nn.LSTM(EMB, H)


class TDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.spatial_embedding = nn.Linear(2, EMB)
        self.decoder = nn.LSTM(EMB, H)
        self.hidden2pos = nn.Sequential(
            nn.Linear(H, H // 2), nn.LeakyReLU(), nn.Linear(H // 2, 2)
        )


class TGen(nn.Module):
    """Torch twin with reference state-dict key names (standard.py)."""

    def __init__(self):
        super().__init__()
        self.encoder = TEncoder()
        self.gs = nn.ModuleList([TDecoder() for _ in range(NG)])
        self.enc_h_to_dec_h = nn.Sequential(nn.Linear(H + Z, H))
        self.net_chooser = nn.Sequential(
            nn.Linear(H, H // 2), nn.ReLU(),
            nn.Linear(H // 2, H // 2), nn.ReLU(),
            nn.Linear(H // 2, NG),
        )
        self.net_prior = nn.Parameter(torch.zeros(1, NG), requires_grad=False)


def torch_forward(model, in_dxdy, noise, pred_len=12):
    """Reference forward math in torch: encode offsets, init decoder hidden,
    12-step rollout per generator ('rel' format, no social/scene)."""
    with torch.no_grad():
        emb = model.encoder.embedding(in_dxdy)  # (T,B,emb)
        _, (h, _) = model.encoder.encoder(emb)
        enc_h = h[-1]  # (B,H)
        logits = model.net_chooser(enc_h)
        dec_h = model.enc_h_to_dec_h(torch.cat([enc_h, noise], -1))[None]
        state0 = (dec_h, torch.zeros_like(dec_h))
        outs = []
        for g in model.gs:
            state = (state0[0].clone(), state0[1].clone())
            dxdy = in_dxdy[-1]
            preds = []
            for _ in range(pred_len):
                x = g.spatial_embedding(dxdy)[None]
                _, state = g.decoder(x, state)
                dxdy = g.hidden2pos(state[0][-1])
                preds.append(dxdy)
            outs.append(torch.stack(preds))
        return torch.stack(outs), logits  # (G,T,B,2), (B,NG)


def test_generator_import_numerical_parity():
    torch.manual_seed(0)
    model = TGen().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    spec = G_mod.GeneratorSpec(
        z_size=Z, encoder_h_dim=H, decoder_h_dim=H, social_feat_size=0,
        num_gens=NG, pred_len=12, embedding_dim=EMB, inp_format="rel",
        pool_type="sways", scene_dim=0, use_pinet=True, learn_prior=False,
    )
    params, state = torch_import.import_generator(sd, spec)

    B = 5
    torch.manual_seed(1)
    in_xy_t = torch.randn(8, B, 2)
    in_dxdy_t = in_xy_t[1:] - in_xy_t[:-1]
    noise_t = torch.randn(B, Z)

    ref_rel, ref_logits = torch_forward(model, in_dxdy_t, noise_t)

    # ours: (S=1, P=B) layout
    in_xy = jnp.asarray(in_xy_t.numpy().transpose(1, 0, 2))[None]
    in_dxdy = jnp.asarray(in_dxdy_t.numpy().transpose(1, 0, 2))[None]
    mask = jnp.ones((1, B), bool)
    enc_h, social_feats, _ = G_mod.encode(
        params, state, spec, in_xy, in_dxdy, mask, None, train=False
    )
    logits = G_mod.pm_logits(params, spec, enc_h)
    np.testing.assert_allclose(
        np.asarray(logits[0]), ref_logits.numpy(), atol=1e-5
    )
    noise = jnp.asarray(noise_t.numpy())[None, None]  # (K=1,S=1,P=B,Z)
    noise = jnp.broadcast_to(noise, (1, 1, B, Z))
    out = G_mod.decode_all(
        params, spec, in_xy[:, :, -1], in_dxdy[:, :, -1], enc_h, social_feats,
        noise,
    )
    ours_rel = np.asarray(out.rel[0, :, 0])  # (G,B,T,2)
    ref = ref_rel.numpy().transpose(0, 2, 1, 3)  # (G,B,T,2)
    np.testing.assert_allclose(ours_rel, ref, atol=2e-5)


class TSceneCNN(nn.Module):
    """Torch twin of AttentionGlobal(num_layers=2) with reference key names."""

    def __init__(self, c=6):
        super().__init__()
        block1 = nn.Sequential()
        block1.add_module("Conv_1", nn.Conv2d(4, c, 3, 1, 1))
        block1.add_module("BN_1", nn.BatchNorm2d(c))
        block1.add_module("NonLin_1", nn.ReLU())
        block1.add_module("Pool", nn.MaxPool2d(2, 2))
        block2 = nn.Sequential()
        block2.add_module("Conv_1", nn.Conv2d(c, c, 3, 1, 1))
        block2.add_module("BN_1", nn.BatchNorm2d(c))
        block2.add_module("NonLin_1", nn.ReLU())
        block2.add_module("Pool", nn.MaxPool2d(2, 2))

        class Wrap(nn.Module):
            def __init__(self, b):
                super().__init__()
                self.Block = b

            def forward(self, x):
                return self.Block(x)

        enc = nn.Sequential()
        enc.add_module("ConvBlock_1", Wrap(block1))
        enc.add_module("ConvBlock_2", Wrap(block2))

        class CNNWrap(nn.Module):
            def __init__(self, e):
                super().__init__()
                self.encoder = e

        self.CNN = CNNWrap(enc)
        self.cnn_attention = nn.Sequential(
            nn.Linear(c, 32), nn.LeakyReLU(), nn.Linear(32, c)
        )

    def forward(self, x):
        feats = self.CNN.encoder(x)  # (B,C,8,8)
        v = feats.permute(0, 2, 3, 1).reshape(x.shape[0], -1, feats.shape[1])
        scores = self.cnn_attention(v)
        att = scores.softmax(dim=2)
        return (att * v).sum(-1)


def test_scene_cnn_import_parity():
    torch.manual_seed(0)
    tm = TSceneCNN().eval()
    sd = {("scene_encoder." + k): v.numpy() for k, v in tm.state_dict().items()}

    params, state = torch_import._scene_cnn(sd, "scene_encoder")
    x_t = torch.randn(3, 4, 33, 33)
    with torch.no_grad():
        ref = tm(x_t).numpy()
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))  # NCHW->NHWC
    ours, _ = scene_cnn_apply(params, state, x_j, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)
