"""Assembled-model checkpoint-import parity: the FULL released-model
topology — trajectory encoder + scene CNN attention + sways social module +
N decoders + PM-net (standard.py:17-302), and a discriminator with social +
scene context (discriminators.py:12-219) — built in torch with reference
state-dict key names, imported via models/torch_import.py, and checked
numerically end-to-end. Extends the per-module parity of
test_torch_import.py to the assembled graph (VERDICT r2 item 1b).

Also drives the ``.pth -> version dir`` converter (cli/convert.py)
end-to-end: torch .pth + reference-style meta_tags.csv -> orbax version dir
-> Trainer.load_from_path -> predictions match the direct import bitwise.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from mggan_tpu.models import discriminator as D_mod
from mggan_tpu.models import generator as G_mod
from mggan_tpu.models import torch_import

from test_loss_parity import TSocial, TTrajEncoder
from test_torch_import import TSceneCNN, TEncoder  # noqa: F401

H = 16       # encoder_h_dim == social_feat_size (reference ties them)
EMB = 8      # embedding_dim = decoder_h_dim // 2
HD = 16      # decoder_h_dim
Z = 4
NG = 2
SCENE = 64   # 8x8 bottleneck (model_factory.py:19)
PRED_LEN = 12


class TFullDecoder(nn.Module):
    """RelativeDecoder twin WITH social features (common_modules.py:69-131)."""

    def __init__(self):
        super().__init__()
        self.spatial_embedding = nn.Linear(2, EMB)
        self.decoder = nn.LSTM(EMB, HD)
        self.hidden2pos = nn.Sequential(
            nn.Linear(HD + H, HD // 2), nn.LeakyReLU(), nn.Linear(HD // 2, 2)
        )

    def forward(self, xy, dxdy, social_feats, state):
        preds = []
        for _ in range(PRED_LEN):
            x = self.spatial_embedding(dxdy)[None]  # rel format
            _, state = self.decoder(x, state)
            nd = self.hidden2pos(torch.cat([state[0][-1], social_feats], 1))
            xy = xy + nd
            dxdy = nd
            preds.append(torch.cat([xy, nd], 1))
        out = torch.stack(preds)  # (T, B, 4)
        return out[..., :2], out[..., 2:]


class TFullGen(nn.Module):
    """MultiGenerator twin, full topology, reference key names."""

    def __init__(self):
        super().__init__()
        enc = TEncoder.__new__(TEncoder)  # reuse key names, custom dims
        nn.Module.__init__(enc)
        enc.embedding = nn.Linear(2, EMB)
        enc.encoder = nn.LSTM(EMB, H)
        self.encoder = enc
        self.scene_encoder = TSceneCNN(c=16)
        self.social = TSocial(H)
        self.gs = nn.ModuleList([TFullDecoder() for _ in range(NG)])
        total = H + SCENE + H
        self.enc_h_to_dec_h = nn.Sequential(nn.Linear(total + Z, HD))
        self.net_chooser = nn.Sequential(
            nn.Linear(total, H // 2), nn.ReLU(),
            nn.Linear(H // 2, H // 2), nn.ReLU(),
            nn.Linear(H // 2, NG),
        )
        self.net_prior = nn.Parameter(torch.zeros(1, NG), requires_grad=False)

    def forward(self, in_xy, in_dxdy, img, sub_batches, noise):
        """Reference forward math, all_gen_out path (standard.py:111-265)."""
        with torch.no_grad():
            t, b, _ = in_dxdy.shape
            e = self.encoder.embedding(in_dxdy.reshape(-1, 2)).reshape(t, b, -1)
            _, (h_t, _) = self.encoder.encoder(e)
            enc_h = h_t[-1]  # (B, H)
            scene = self.scene_encoder(img)  # (B, 64)
            social = self.social(in_xy, in_dxdy, enc_h, sub_batches)  # (B, H)
            enc_cat = torch.cat([enc_h, scene, social], -1)  # (B, total)
            logits = self.net_chooser(enc_cat)

            k = noise.shape[0]
            noise_f = noise.flatten(0, 1)  # (K*B, Z)
            enc_rep = enc_cat.repeat(k, 1)
            soc_rep = social.repeat(k, 1)
            dec_h = self.enc_h_to_dec_h(torch.cat([enc_rep, noise_f], -1))[None]
            state0 = (dec_h, torch.zeros_like(dec_h))
            xy0 = in_xy[-1].repeat(k, 1)
            dxdy0 = in_dxdy[-1].repeat(k, 1)
            outs_abs, outs_rel = [], []
            for g in self.gs:
                a, r = g(xy0, dxdy0, soc_rep, state0)
                outs_abs.append(a.reshape(PRED_LEN, k, b, 2))
                outs_rel.append(r.reshape(PRED_LEN, k, b, 2))
            # (T, K, G, B, 2) like forward_all (standard.py:259-265)
            return (
                torch.stack(outs_abs, 2), torch.stack(outs_rel, 2), logits
            )


def _gen_spec():
    return G_mod.GeneratorSpec(
        z_size=Z, encoder_h_dim=H, decoder_h_dim=HD, social_feat_size=H,
        num_gens=NG, pred_len=PRED_LEN, embedding_dim=EMB, inp_format="rel",
        pool_type="sways", scene_dim=SCENE, use_pinet=True, learn_prior=False,
    )


def _fixture_batch(s=2, p=3, k=2, seed=1):
    torch.manual_seed(seed)
    b = s * p
    in_xy_t = torch.randn(8, b, 2)
    in_dxdy_t = in_xy_t[1:] - in_xy_t[:-1]
    img_t = torch.randn(b, 4, 33, 33)
    noise_t = torch.randn(k, b, Z)
    sub_batches = [(i * p, (i + 1) * p) for i in range(s)]
    return in_xy_t, in_dxdy_t, img_t, noise_t, sub_batches


def _to_ours(in_xy_t, in_dxdy_t, img_t, noise_t, s, p):
    to_sp = lambda x, tail: jnp.asarray(
        x.numpy().transpose(1, 0, 2).reshape((s, p) + tail)
    )
    in_xy = to_sp(in_xy_t, (8, 2))
    in_dxdy = to_sp(in_dxdy_t, (7, 2))
    patches = jnp.asarray(
        img_t.numpy().transpose(0, 2, 3, 1).reshape(s, p, 33, 33, 4)
    )
    k = noise_t.shape[0]
    noise = jnp.asarray(noise_t.numpy().reshape(k, s, p, Z))
    return in_xy, in_dxdy, patches, noise


def test_assembled_generator_import_parity():
    torch.manual_seed(0)
    model = TFullGen().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    spec = _gen_spec()
    params, state = torch_import.import_generator(sd, spec)

    s, p, k = 2, 3, 2
    in_xy_t, in_dxdy_t, img_t, noise_t, sub_batches = _fixture_batch(s, p, k)
    ref_abs, ref_rel, ref_logits = model(
        in_xy_t, in_dxdy_t, img_t, sub_batches, noise_t
    )

    in_xy, in_dxdy, patches, noise = _to_ours(
        in_xy_t, in_dxdy_t, img_t, noise_t, s, p
    )
    mask = jnp.ones((s, p), bool)
    enc_h, social_feats, _ = G_mod.encode(
        params, state, spec, in_xy, in_dxdy, mask, patches, train=False
    )
    logits = G_mod.pm_logits(params, spec, enc_h)
    np.testing.assert_allclose(
        np.asarray(logits).reshape(s * p, NG), ref_logits.numpy(), atol=2e-5
    )

    out = G_mod.decode_all(
        params, spec, in_xy[:, :, -1], in_dxdy[:, :, -1], enc_h, social_feats,
        noise,
    )
    # ours (K,G,S,P,T,2) -> (T,K,G,B,2)
    ours_rel = np.asarray(out.rel).reshape(k, NG, s * p, PRED_LEN, 2)
    ours_rel = ours_rel.transpose(3, 0, 1, 2, 4)
    np.testing.assert_allclose(ours_rel, ref_rel.numpy(), atol=3e-5)
    ours_abs = np.asarray(out.abs).reshape(k, NG, s * p, PRED_LEN, 2)
    ours_abs = ours_abs.transpose(3, 0, 1, 2, 4)
    np.testing.assert_allclose(ours_abs, ref_abs.numpy(), atol=1e-4)


class TFullDisc(nn.Module):
    """Discriminator twin WITH social + scene context
    (discriminators.py:58-74,178-196), reference key names, 2 heads."""

    def __init__(self, num_discs=2, h=H):
        super().__init__()
        self.in_encoder = TTrajEncoder(2, h)
        self.in_encoder_fc = nn.Sequential(
            nn.Linear(h, h // 2), nn.LeakyReLU(0.2), nn.Linear(h // 2, h // 2)
        )
        self.pred_encoder = nn.Sequential(
            nn.Linear(PRED_LEN * 2, h), nn.LeakyReLU(0.2), nn.Linear(h, h // 2)
        )
        self.social = TSocial(h)
        self.scene_encoder = TSceneCNN(c=8)
        cd = 2 * h + SCENE  # social(h) + enc(h) + scene(64)
        self.discs = nn.ModuleList(
            nn.Sequential(
                nn.Linear(cd, cd // 2), nn.LeakyReLU(0.2),
                nn.Linear(cd // 2, 1), nn.Sigmoid(),
            )
            for _ in range(num_discs)
        )
        self.gen_id_reconstructor = nn.Sequential(
            nn.Linear(cd, cd // 2), nn.LeakyReLU(0.2), nn.Linear(cd // 2, NG)
        )

    def forward(self, in_xy, in_dxdy, pred_xy, pred_dxdy, img, sub_batches):
        """k=1 scoring path (discriminators.py:144-219; the reference's
        social sub-batch repeat is only well-defined at n_samples=1)."""
        with torch.no_grad():
            in_enc = self.in_encoder_fc(self.in_encoder(in_dxdy))
            pe = pred_dxdy.permute(1, 0, 2).reshape(pred_dxdy.shape[1], -1)
            pred_enc = self.pred_encoder(pe)
            enc = torch.cat([in_enc, pred_enc], 1)
            soc = self.social(in_xy, in_dxdy, enc, sub_batches)
            cls = torch.cat([soc, enc], 1)
            scene = self.scene_encoder(img)
            cls = torch.cat([cls, scene], 1)
            y = torch.cat([d(cls) for d in self.discs], 1)
            y = y * (1 - 2 * 1e-7) + 1e-7
            out = y.mean(1)
            branch = self.gen_id_reconstructor(cls)
            return out, branch


def _disc_spec():
    return D_mod.DiscriminatorSpec(
        h_dim=H, inp_format="rel", pred_len=PRED_LEN, num_discs=2,
        num_gens=NG, gan_type="mgan", global_disc=True, scene_dim=SCENE,
        pool_type="sways", unbound_output=False,
    )


def test_assembled_discriminator_import_parity():
    torch.manual_seed(3)
    model = TFullDisc().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    spec = _disc_spec()
    params, state = torch_import.import_discriminator(sd, spec)

    s, p = 2, 3
    in_xy_t, in_dxdy_t, img_t, _, sub_batches = _fixture_batch(s, p, k=1)
    torch.manual_seed(4)
    pred_xy_t = torch.randn(PRED_LEN, s * p, 2)
    pred_dxdy_t = torch.randn(PRED_LEN, s * p, 2)
    ref_out, ref_branch = model(
        in_xy_t, in_dxdy_t, pred_xy_t, pred_dxdy_t, img_t, sub_batches
    )

    in_xy, in_dxdy, patches, _ = _to_ours(
        in_xy_t, in_dxdy_t, img_t, torch.zeros(1, s * p, Z), s, p
    )
    to_pred = lambda x: jnp.asarray(
        x.numpy().transpose(1, 0, 2).reshape(1, s, p, PRED_LEN, 2)
    )
    mask = jnp.ones((s, p), bool)
    scores, branch, _ = D_mod.apply(
        params, state, spec, in_xy, in_dxdy, to_pred(pred_xy_t),
        to_pred(pred_dxdy_t), mask, mask, patches=patches, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(scores).reshape(-1), ref_out.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(branch).reshape(s * p, NG), ref_branch.numpy(), atol=2e-5
    )


def test_convert_cli_end_to_end(tmp_path):
    """.pth + meta_tags.csv -> cli.convert -> Trainer.load_from_path: the
    restored model's decode equals the direct import exactly (the one-command
    recipe for running released reference checkpoints, README.md:69-71)."""
    import csv

    from mggan_tpu.cli.convert import convert_torch_checkpoint
    from mggan_tpu.training.loop import Trainer

    torch.manual_seed(0)
    g = TFullGen().eval()
    # the factory builds D at h_dim*2 with one head for mgan
    # (model_factory.py:36-45, discriminators num_discs=5 iff probgan)
    d = TFullDisc(num_discs=1, h=2 * H).eval()
    pth = tmp_path / "checkpoint_best.pth"
    torch.save(
        {"generator": g.state_dict(), "discriminator": d.state_dict()}, pth
    )
    # reference-style meta_tags.csv (test_tube key,value format) describing
    # the twin's hyperparameters
    tags = {
        "name": "released_twin", "dataset": "synthetic_memory",
        "h_dim": H, "decoder_h_dim": HD, "noise_dim": Z, "num_gens": NG,
        "gan_type": "mgan", "weighting_target": "mgan", "inp_format": "rel",
        "pool_type": "sways", "n_social_modules": 1, "global_disc": 1,
        "num_samples": 2, "top_k_test": 2, "batch_size": 4,
        "some_unknown_test_tube_key": "ignored",
    }
    meta = tmp_path / "meta_tags.csv"
    with open(meta, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["key", "value"])
        for k, v in tags.items():
            w.writerow([k, v])

    out_root = tmp_path / "converted"
    vdir = convert_torch_checkpoint(
        pth, out_root, meta_tags=meta, version=0,
        overrides={"log_dir": str(out_root)},
    )
    assert vdir.name == "version_0" and (vdir / "meta_tags.csv").exists()

    trainer, config = Trainer.load_from_path(vdir, "best")
    assert config.num_gens == NG and config.h_dim == H

    # restored weights == direct import, verified through the decode path
    spec = trainer.g_spec
    params_direct, _ = torch_import.import_generator(
        {k: v.numpy() for k, v in g.state_dict().items()}, spec
    )
    s, p, k = 2, 3, 2
    in_xy_t, in_dxdy_t, img_t, noise_t, _ = _fixture_batch(s, p, k)
    in_xy, in_dxdy, patches, noise = _to_ours(
        in_xy_t, in_dxdy_t, img_t, noise_t, s, p
    )
    mask = jnp.ones((s, p), bool)

    def decode(params, state):
        enc_h, soc, _ = G_mod.encode(
            params, state, spec, in_xy, in_dxdy, mask, patches, train=False
        )
        return G_mod.decode_all(
            params, spec, in_xy[:, :, -1], in_dxdy[:, :, -1], enc_h, soc,
            noise,
        ).abs

    a1 = decode(trainer.state.g_params, trainer.state.g_state)
    a2 = decode(params_direct, trainer.state.g_state)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
