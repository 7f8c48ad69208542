"""Loss-value parity vs straight-torch transcriptions of the reference.

Closes VERDICT r1 item 2: on a fixed batch / noise / labels / generator
samples, our jitted ``d_loss_fn`` / ``g_loss_fn`` / ``pm_loss_fn`` (read out
through their metric dict) must equal a torch transcription of
``train.py:23-213,578-658`` built around a reference-keyed torch
discriminator twin (``discriminators.py:12-219``), imported through
``torch_import.import_discriminator``.

Randomness injection: the step functions split their rng internally; the
test replicates the exact split schedule (``steps.py::d_loss_fn/g_loss_fn``)
and feeds the resulting labels / predictions / generator indices into the
torch side as constants.
"""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mggan_tpu.config import Config
from mggan_tpu.models import factory
from mggan_tpu.models import generator as G_mod
from mggan_tpu.models import discriminator as D_mod
from mggan_tpu.models import torch_import
from mggan_tpu.ops import losses as L
from mggan_tpu.ops import sampling
from mggan_tpu.training import steps
from mggan_tpu.training.state import init_train_state

S, P, NG, HD, Z, K = 3, 4, 3, 16, 4, 3
PRED_LEN = 12


# ---------------------------------------------------------------------------
# Torch twins with reference state-dict key names
# ---------------------------------------------------------------------------


class TTrajEncoder(nn.Module):
    """TrajectoryEncoder twin (common_modules.py:24-66), embedding variant."""

    def __init__(self, inp, h):
        super().__init__()
        self.embedding = nn.Linear(inp, h)
        self.encoder = nn.LSTM(h, h)

    def forward(self, x):  # (T, N, inp) -> (N, h)
        t, n, d = x.shape
        e = self.embedding(x.reshape(-1, d)).reshape(t, n, -1)
        _, (h_t, _) = self.encoder(e)
        return h_t[-1]


class TSocial(nn.Module):
    """sways SocialAttention twin (social.py:7-123) with reference keys."""

    def __init__(self, h):
        super().__init__()
        self.feature_embedder = nn.Module()
        self.feature_embedder.fc = nn.Sequential(
            nn.Linear(3, 32), nn.ReLU(), nn.Linear(32, 64), nn.ReLU(),
            nn.Linear(64, h),
        )
        self.attention = nn.Module()
        self.attention.W = nn.Linear(h, h)

    def forward(self, in_xy, in_dxdy, enc_h, sub_batches):
        x = torch.cat((in_xy[-1], in_dxdy[-1]), -1)  # (N, 4)
        dp = x[:, None, :2] - x[None, :, :2]  # [i, j] = p_i - p_j
        dv = x[:, None, 2:] - x[None, :, 2:]
        l2 = dp.norm(dim=-1)
        v_i = x[:, None, 2:].expand_as(dp)
        bearing = (dp * v_i).sum(-1) / (
            dp.norm(dim=-1) * v_i.norm(dim=-1) + 1e-6
        )
        ttca = -(dp * dv).sum(-1) / ((dv * dv).sum(-1) + 1e-6)
        dca = (dp + ttca[..., None] * dv).norm(dim=-1)
        femb = self.feature_embedder.fc(torch.stack([l2, bearing, dca], -1))
        wh = self.attention.W(enc_h)
        out = torch.zeros_like(enc_h)
        for (st, en) in sub_batches:
            if en - st == 1:
                continue
            for i in range(st, en):
                sig = (femb[i, st:en] * wh[st:en]).sum(-1)
                sig[i - st] = -1000.0
                att = torch.softmax(sig, 0)
                out[i] = att @ enc_h[st:en]
        return out


class TDisc(nn.Module):
    """MultiDiscriminatorTrajectory twin (discriminators.py:12-219)."""

    def __init__(self, h, inp_format, num_discs, num_gens, global_disc,
                 unbound):
        super().__init__()
        inp = 4 if inp_format == "abs_rel" else 2
        self.inp_format = inp_format
        self.global_disc = global_disc
        self.unbound = unbound
        self.in_encoder = TTrajEncoder(inp, h)
        self.in_encoder_fc = nn.Sequential(
            nn.Linear(h, h // 2), nn.LeakyReLU(0.2), nn.Linear(h // 2, h // 2)
        )
        self.pred_encoder = nn.Sequential(
            nn.Linear(PRED_LEN * inp, h), nn.LeakyReLU(0.2),
            nn.Linear(h, h // 2),
        )
        cd = h
        if global_disc:
            self.social = TSocial(h)
            cd = 2 * h
        self.discs = nn.ModuleList()
        for _ in range(num_discs):
            layers = [nn.Linear(cd, cd // 2), nn.LeakyReLU(0.2),
                      nn.Linear(cd // 2, 1)]
            if not unbound:
                layers.append(nn.Sigmoid())
            self.discs.append(nn.Sequential(*layers))
        self.gen_id_reconstructor = nn.Sequential(
            nn.Linear(cd, cd // 2), nn.LeakyReLU(0.2),
            nn.Linear(cd // 2, num_gens),
        )

    def forward(self, in_xy, in_dxdy, pred_xy, pred_dxdy, sub_batches):
        if pred_xy.dim() == 3:
            pred_xy, pred_dxdy = pred_xy.unsqueeze(1), pred_dxdy.unsqueeze(1)
        t, k, b, _ = pred_xy.shape
        if self.inp_format == "rel":
            in_inp, pred_inp = in_dxdy, pred_dxdy
        elif self.inp_format == "abs":
            in_inp, pred_inp = in_xy, pred_xy
        else:
            in_inp = torch.cat([in_xy, in_dxdy], -1)
            pred_inp = torch.cat([pred_xy, pred_dxdy], -1)
        in_enc = self.in_encoder_fc(self.in_encoder(in_inp))  # (b, h/2)
        pe = pred_inp.permute(1, 2, 0, 3).reshape(k * b, -1)
        pred_enc = self.pred_encoder(pe)
        enc = torch.cat([in_enc.repeat(k, 1), pred_enc], 1)
        if self.global_disc:
            soc = self.social(
                in_xy.repeat(1, k, 1), in_dxdy.repeat(1, k, 1), enc,
                sub_batches * k,
            )
            cls = torch.cat([soc, enc], 1)
        else:
            cls = enc
        y = torch.cat([d(cls) for d in self.discs], 1)
        if not self.unbound:
            y = y * (1 - 2 * 1e-7) + 1e-7
        out = y.mean(1).reshape(k, b).t()  # (b, k)
        branch = self.gen_id_reconstructor(cls).reshape(k, b, -1).transpose(0, 1)
        return out, branch


def torch_phis(gan_obj):
    """phi_1/phi_2/phi_3 transcription (abstract_train.py:61-85)."""
    bce = nn.BCELoss(reduction="none")
    mse = nn.MSELoss(reduction="none")
    if gan_obj == "NS":
        return (lambda d, lr, lf: bce(d, lr), lambda d, lr, lf: bce(d, lf),
                lambda d, lr, lf: bce(d, lr))
    if gan_obj == "MM":
        return (lambda d, lr, lf: bce(d, lr), lambda d, lr, lf: bce(d, lf),
                lambda d, lr, lf: -bce(d, lf))
    if gan_obj == "LS":
        return (lambda d, lr, lf: mse(d, lr), lambda d, lr, lf: mse(d, lf),
                lambda d, lr, lf: mse(d, lr))
    raise ValueError(gan_obj)


# ---------------------------------------------------------------------------
# Layout bridges: padded (S, P) <-> reference flat time-major
# ---------------------------------------------------------------------------


def t_obs(x):  # (S, P, T, 2) -> torch (T, S*P, 2)
    a = np.asarray(x)
    s, p, t, d = a.shape
    return torch.from_numpy(a.reshape(s * p, t, d).transpose(1, 0, 2).copy())


def t_pred(x):  # (K, S, P, T, 2) -> torch (T, K, S*P, 2)
    a = np.asarray(x)
    k, s, p, t, d = a.shape
    return torch.from_numpy(
        a.reshape(k, s * p, t, d).transpose(2, 0, 1, 3).copy()
    )


SUB_BATCHES = [[s * P, (s + 1) * P] for s in range(S)]


def make_bv(seed=0):
    rng = np.random.RandomState(seed)
    xy = rng.randn(S, P, 20, 2).astype(np.float32).cumsum(2) * 0.1
    batch = {"xy": jnp.asarray(xy), "ped_mask": jnp.ones((S, P), bool)}
    return steps.batch_views(batch)


def build(gan_obj="NS", global_disc=1, l2_loss_type="min_g_z",
          weighting_target="ml", num_discs=1, seed=0):
    cfg = Config(
        dataset="synthetic_memory", num_gens=NG, gan_type="mgan",
        gan_obj=gan_obj, weighting_target=weighting_target, h_dim=HD,
        # inp_format "rel" (reference default): the reference D crashes on
        # "abs_rel" (encode() cats 8-step in_xy with 7-step in_dxdy with no
        # pad, discriminators.py:121) so only rel/abs are testable.
        decoder_h_dim=HD, noise_dim=Z, n_social_modules=0,
        inp_format="rel", num_samples=K, num_expectation_samples=2,
        l2_loss_type=l2_loss_type, global_disc=global_disc, sigma=1.3,
        clf_loss_weight=0.7, l2_loss_weight=0.4, pi_net_loss_weight=1.0,
    )
    g_spec, d_spec = factory.build_specs(cfg)
    g_spec = dataclasses.replace(g_spec, scene_dim=0)
    d_spec = dataclasses.replace(d_spec, scene_dim=0, num_discs=num_discs)

    torch.manual_seed(seed)
    tD = TDisc(
        h=2 * HD, inp_format=cfg.inp_format, num_discs=num_discs,
        num_gens=NG, global_disc=bool(global_disc),
        unbound=d_spec.unbound_output,
    ).eval()
    sd = {kk: v.numpy() for kk, v in tD.state_dict().items()}
    d_params, d_state = torch_import.import_discriminator(sd, d_spec)

    g_params, g_state = G_mod.init(jax.random.PRNGKey(seed + 3), g_spec)
    state = init_train_state(
        cfg, (g_params, g_state, g_spec), (d_params, d_state, d_spec),
        jax.random.PRNGKey(seed + 7),
    )
    return cfg, g_spec, d_spec, tD, state


def test_discriminator_import_score_parity():
    """D-score + branch import parity, global sways, 2-head ensemble, K=1."""
    cfg, g_spec, d_spec, tD, state = build(num_discs=2)
    bv = make_bv()
    scores, branch, _ = D_mod.apply(
        state.d_params, state.d_state, d_spec, bv.in_xy, bv.in_dxdy,
        bv.gt_xy[None], bv.gt_dxdy[None], bv.ped_mask, bv.loss_mask,
        None, train=True,
    )
    with torch.no_grad():
        ref_out, ref_branch = tD(
            t_obs(bv.in_xy), t_obs(bv.in_dxdy), t_obs(bv.gt_xy),
            t_obs(bv.gt_dxdy), SUB_BATCHES,
        )
    np.testing.assert_allclose(
        np.asarray(scores[0]).reshape(-1), ref_out[:, 0].numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(branch[0]).reshape(S * P, NG),
        ref_branch[:, 0].numpy(), atol=2e-5,
    )


@pytest.mark.parametrize("gan_obj", ["NS", "LS"])
def test_d_loss_value_parity(gan_obj):
    """discriminator_step loss parity (train.py:137-206), global sways."""
    cfg, g_spec, d_spec, tD, state = build(gan_obj=gan_obj)
    bv = make_bv()
    d_step, _, _ = steps.build_train_step(cfg, g_spec, d_spec, jit="phases")
    rng_d = jax.random.PRNGKey(11)
    _, metrics = d_step(state, bv, rng_d)

    # Replicate the internal rng schedule (steps.py::d_loss_fn).
    k_lab, k_gen, _ = jax.random.split(rng_d, 3)
    lr_, lf_ = L.gan_labels(k_lab)
    pred, _, gen_idxs, _, _ = steps._g_forward_sampled(
        state.g_params, state.g_state, g_spec, cfg, bv, k_gen,
        num_samples=1, train=True,
    )

    phi_1, phi_2, _ = torch_phis(gan_obj)
    with torch.no_grad():
        ixy, idxdy = t_obs(bv.in_xy), t_obs(bv.in_dxdy)
        real_out, _ = tD(ixy, idxdy, t_obs(bv.gt_xy), t_obs(bv.gt_dxdy),
                         SUB_BATCHES)
        lreal = torch.full_like(real_out, float(lr_))
        lfake = torch.full_like(real_out, float(lf_))
        real_loss = phi_1(real_out, lreal, lfake).mean()
        fake_out, branch = tD(ixy, idxdy, t_pred(pred.abs), t_pred(pred.rel),
                              SUB_BATCHES)
        fake_loss = phi_2(fake_out, lreal, lfake).mean()
        labels = torch.from_numpy(
            np.asarray(gen_idxs).reshape(S * P, 1).astype(np.int64)
        )
        ce = F.cross_entropy(branch.flatten(0, 1), labels.flatten())

    np.testing.assert_allclose(
        float(metrics["train/discr_loss"]), float(real_loss + fake_loss),
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        float(metrics["train/info_mgan_disc_loss"]), float(ce),
        rtol=2e-4, atol=1e-5,
    )


@pytest.mark.parametrize(
    "gan_obj,l2_type", [("NS", "min_g_z"), ("LS", "mse"), ("MM", "min_g_z")]
)
def test_g_loss_value_parity(gan_obj, l2_type):
    """generator_step loss parity (train.py:23-135): min-scene L2,
    count-reweighted adversarial, mgan classifier CE. global_disc=0 because
    the reference's D social indexing is only well-defined at n_samples=1
    (see PARITY.md deviation list)."""
    cfg, g_spec, d_spec, tD, state = build(
        gan_obj=gan_obj, l2_loss_type=l2_type, global_disc=0
    )
    bv = make_bv(seed=1)
    _, g_step, _ = steps.build_train_step(cfg, g_spec, d_spec, jit="phases")
    rng_g = jax.random.PRNGKey(17)
    _, metrics = g_step(state, bv, rng_g)

    k_lab, k_gen = jax.random.split(rng_g)
    lr_, lf_ = L.gan_labels(k_lab)
    pred, _, gen_idxs, _, _ = steps._g_forward_sampled(
        state.g_params, state.g_state, g_spec, cfg, bv, k_gen,
        num_samples=K, train=True,
    )

    b = S * P
    _, _, phi_3 = torch_phis(gan_obj)
    with torch.no_grad():
        gt = t_obs(bv.gt_xy)
        # min-scene L2 (train.py:57-75)
        l2 = (t_pred(pred.abs) - gt[:, None]).norm(dim=-1)  # (T, K, b)
        if l2_type == "mse":
            l2 = l2 ** 2
        l2 = l2.sum(0)  # (K, b)
        min_l2 = sum(
            l2[:, st:en].sum(1).min() for st, en in SUB_BATCHES
        ) / b

        disc_out, branch = tD(
            t_obs(bv.in_xy), t_obs(bv.in_dxdy), t_pred(pred.abs),
            t_pred(pred.rel), SUB_BATCHES,
        )
        lreal = torch.full_like(disc_out, float(lr_))
        lfake = torch.full_like(disc_out, float(lf_))
        adv = phi_3(disc_out, lreal, lfake)  # (b, K)
        gidx = torch.from_numpy(
            np.asarray(gen_idxs).reshape(b, K).astype(np.int64)
        )
        idxs, counts = torch.unique(gidx, return_counts=True)
        for i, c in zip(idxs, counts):
            adv[gidx == i] = adv[gidx == i] / c
        adv = adv.mean()

        clf = F.cross_entropy(
            branch.flatten(0, 1), gidx.flatten(), reduction="none"
        ).reshape_as(gidx)
        for i, c in zip(idxs, counts):
            clf[gidx == i] = clf[gidx == i] / c
        clf = clf.mean()

    np.testing.assert_allclose(
        float(metrics["train/L2_loss"]), float(min_l2), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["train/gen_loss"]), float(adv), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["train/info_mgan_loss"]), float(clf),
        rtol=2e-4, atol=1e-5,
    )


@pytest.mark.parametrize("wt", ["ml", "l2", "endpoint"])
def test_pm_loss_value_parity(wt):
    """net_chooser_step loss parity (train.py:578-658) for the three
    sample-based weighting targets."""
    cfg, g_spec, d_spec, tD, state = build(weighting_target=wt)
    bv = make_bv(seed=2)
    _, _, pm_step = steps.build_train_step(cfg, g_spec, d_spec, jit="phases")
    kpm = jax.random.PRNGKey(23)
    _, metrics = pm_step(state, bv, kpm)

    # Replicate the forward (pm_loss_fn draws noise straight from its rng).
    enc_h, social_feats, _ = G_mod.encode(
        state.g_params, state.g_state, g_spec, bv.in_xy, bv.in_dxdy,
        bv.ped_mask, None, train=True,
    )
    logits = G_mod.pm_logits(state.g_params, g_spec, enc_h)
    noise = sampling.global_noise(
        kpm, cfg.num_expectation_samples, S, P, cfg.noise_dim
    )
    out_all = G_mod.decode_all(
        state.g_params, g_spec, bv.in_xy[:, :, -1], bv.in_dxdy[:, :, -1],
        enc_h, social_feats, noise,
    )

    b = S * P
    with torch.no_grad():
        # (Ke, G, S, P, T, 2) -> (T, Ke, G, b, 2)
        a = np.asarray(out_all.abs)
        ke, g = a.shape[:2]
        gen_abs = torch.from_numpy(
            a.reshape(ke, g, b, PRED_LEN, 2).transpose(3, 0, 1, 2, 4).copy()
        )
        gt = t_obs(bv.gt_xy)  # (T, b, 2)
        weights = torch.from_numpy(np.asarray(logits).reshape(b, NG).copy())
        if wt == "ml":
            out_probs = torch.softmax(weights, 1)
            log_prob = (
                torch.distributions.Normal(0, cfg.sigma)
                .log_prob(gen_abs - gt[:, None, None])
                .sum([0, -1]).mean(0).t()
            )
            gen_prob = torch.softmax(log_prob, 1)
            ref_loss = -(gen_prob * out_probs.log()).sum(1).mean()
        elif wt == "l2":
            l2_dist = (gen_abs - gt[:, None, None]).norm(dim=-1).mean(0)
            per_gen = l2_dist.min(0)[0].t()  # (b, G)
            ref_loss = F.cross_entropy(weights, per_gen.argmin(1))
        else:  # endpoint
            d = (gen_abs[-1] - gt[-1, None, None]).norm(dim=-1)
            per_gen = d.min(0)[0].t()
            ref_loss = F.cross_entropy(weights, per_gen.argmin(1))
        ref_probs = torch.softmax(weights, 1).mean(0)

    np.testing.assert_allclose(
        float(metrics["train/net_chooser_loss"]), float(ref_loss),
        rtol=2e-4, atol=1e-5,
    )
    for i in range(NG):
        np.testing.assert_allclose(
            float(metrics[f"probs/Gen {i} probability"]),
            float(ref_probs[i]), rtol=2e-4, atol=1e-5,
        )


def test_pm_loss_value_parity_mgan_compat():
    """``--wt_mgan_compat 1`` reproduces the reference's LITERAL wt_mgan
    computation (train.py:604-613): softmax over the (b,1,G) branch
    output's singleton axis gives all-ones targets and the (b,1,G)x(b,G)
    broadcast scales the loss by b. Pinned against the verbatim torch
    expression (with an arbitrary branch_out — its values must cancel)."""
    cfg, g_spec, d_spec, tD, state = build(weighting_target="mgan")
    cfg = cfg.replace(wt_mgan_compat=1)
    bv = make_bv(seed=3)
    _, _, pm_step = steps.build_train_step(cfg, g_spec, d_spec, jit="phases")
    _, metrics = pm_step(state, bv, jax.random.PRNGKey(29))

    enc_h, _, _ = G_mod.encode(
        state.g_params, state.g_state, g_spec, bv.in_xy, bv.in_dxdy,
        bv.ped_mask, None, train=True,
    )
    logits = G_mod.pm_logits(state.g_params, g_spec, enc_h)

    b = S * P
    with torch.no_grad():
        weights = torch.from_numpy(np.asarray(logits).reshape(b, NG).copy())
        # Arbitrary (b, 1, G) branch output: softmax over dim=1 (the
        # singleton sample axis, as in train.py:609) is identically 1.
        branch_out = torch.randn(b, 1, NG)
        out_probs = torch.softmax(weights, 1)
        target_probs = torch.softmax(branch_out, 1)
        ref_loss = -(target_probs * out_probs.log()).sum(1).mean()
        epoch = 0
        reg = (0.9 ** epoch) * -(out_probs * out_probs.log()).sum(1).mean()
        ref_loss -= reg

    np.testing.assert_allclose(
        float(metrics["train/net_chooser_loss"]), float(ref_loss),
        rtol=2e-4, atol=1e-5,
    )
