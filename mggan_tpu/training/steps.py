"""The jitted GAN train step: D-step(s) + G-step + PM-step in one XLA program.

Reference call structure: abstract_train.py:136-166 (gating, unrolled-GAN
backup/restore) dispatching into train.py:23-213 (generator_step /
discriminator_step) and train.py:578-658 (net_chooser_step).

TPU re-design: one specialized compiled step per config (no lax.cond towers
over gan_type/gan_obj/weighting_target — those are static), with

* decode-all + one-hot gather instead of dynamic-shape sample selection,
* masked means over the padded (S, P) agent grid instead of row filtering
  (`mask=loss_mask` row-slicing, standard.py:167-173),
* functional D-parameter snapshot for unrolled GAN (no state_dict dance),
* three optax updates (D; G adversarial; PM) mirroring the reference's
  optimizer usage — the PM step reuses the G optimizer chain exactly as
  ``net_chooser_step`` reuses ``optimizerG`` (train.py:656-658).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mggan_tpu.config import Config, OBS_LEN
from mggan_tpu.models import generator as G_mod
from mggan_tpu.models import discriminator as D_mod
from mggan_tpu.ops import losses as L
from mggan_tpu.ops import sampling
from mggan_tpu.training.state import TrainState, optimizers, scheduled_lr, with_lr
from mggan_tpu.utils import trajectory_tools
from mggan_tpu.utils.pytree import tree_global_norm


class BatchViews(NamedTuple):
    in_xy: jnp.ndarray  # (S,P,8,2)
    in_dxdy: jnp.ndarray  # (S,P,7,2)
    gt_xy: jnp.ndarray  # (S,P,12,2) NaNs zeroed
    gt_dxdy: jnp.ndarray  # (S,P,12,2) NaNs zeroed
    ped_mask: jnp.ndarray  # (S,P) real agents
    loss_mask: jnp.ndarray  # (S,P) real agents with finite futures
    patches: jnp.ndarray | None  # (S,P,33,33,4) or None


def batch_views(batch) -> BatchViews:
    """Derive model inputs + masks from a padded batch dict.

    ``loss_mask`` mirrors ``~gt.isnan().any()`` (abstract_train.py:130);
    NaN futures are zeroed so masked arithmetic stays finite.
    """
    xy = batch["xy"]
    ped_mask = batch["ped_mask"]
    in_xy = xy[:, :, :OBS_LEN]
    in_dxdy = in_xy[:, :, 1:] - in_xy[:, :, :-1]
    gt_raw = xy[:, :, OBS_LEN:]
    finite = ~jnp.isnan(gt_raw).any(axis=(-1, -2))
    loss_mask = ped_mask & finite
    gt_xy = jnp.where(loss_mask[..., None, None], jnp.nan_to_num(gt_raw), 0.0)
    prev = jnp.concatenate([in_xy[:, :, -1:], gt_raw[:, :, :-1]], axis=2)
    gt_dxdy = jnp.where(
        loss_mask[..., None, None], jnp.nan_to_num(gt_raw - prev), 0.0
    )
    return BatchViews(
        in_xy=in_xy,
        in_dxdy=in_dxdy,
        gt_xy=gt_xy,
        gt_dxdy=gt_dxdy,
        ped_mask=ped_mask,
        loss_mask=loss_mask,
        patches=batch.get("patches"),
    )


def _g_forward_sampled(g_params, g_state, g_spec, config, bv: BatchViews, rng,
                       num_samples: int, train: bool,
                       needs_decoder_grad: bool = False):
    """Encode + PM-sample + decode the sampled generator (the reference's
    ``all_gen_out=False`` path, standard.py:186-214).

    ``needs_decoder_grad`` picks the decode flavor: gradient paths (G-step)
    use decode-all + gather, whose Pallas kernel has a fused reverse-sweep
    backward (ops/pallas/decoder.py::_bwd_kernel); stop-gradient paths
    (D-step fakes, eval sampling) use the fused-selection kernel that never
    materialises the all-generator output.

    Returns (pred GeneratorOutput (K,S,P,T,2), logits (S,P,G),
    gen_idxs (S,P,K), noise (K,S,P,z), new_g_state).
    """
    k_noise, k_cat = jax.random.split(rng)
    s, p = bv.ped_mask.shape
    enc_h, social_feats, new_g_state = G_mod.encode(
        g_params, g_state, g_spec, bv.in_xy, bv.in_dxdy, bv.ped_mask,
        bv.patches, train=train,
    )
    logits = G_mod.pm_logits(g_params, g_spec, enc_h)
    gen_idxs = sampling.categorical(k_cat, logits, num_samples)
    noise = sampling.global_noise(k_noise, num_samples, s, p, config.noise_dim)
    pred = G_mod.decode_select(
        g_params, g_spec, bv.in_xy[:, :, -1], bv.in_dxdy[:, :, -1],
        enc_h, social_feats, noise, gen_idxs,
        fuse_select=not needs_decoder_grad,
    )
    return pred, logits, gen_idxs, noise, new_g_state


def per_module_grad_norms(grads, prefix: str):
    """Per-module gradient norms for the epoch histograms (reference
    GradNormLogger, utils.py:168-199): top-level param-tree keys play the
    role of module names. Keys carry a ``gradnorm/`` prefix so the trainer
    routes them to TensorBoard histograms instead of scalar CSV columns."""
    return {
        f"gradnorm/{prefix}/{name}": tree_global_norm(sub)
        for name, sub in grads.items()
    }


def _gradient_penalty(d_params, d_state, d_spec, bv: BatchViews, pred, rng,
                      gp_lambda=10.0):
    """WGAN-GP on interpolated futures (utils.py:42-67).

    Design note: the reference differentiates w.r.t. all four inputs but then
    keeps only the gradient w.r.t. the observed history and norms over the
    batch axis — both artifacts of ``autograd.grad(...)[0]``. We implement
    the WGAN-GP intent: gradient w.r.t. the interpolated future, per-agent
    norm, masked mean of (|g|-1)^2 (SURVEY.md §2.4 "spec bugs").
    """
    alpha = jax.random.uniform(rng, bv.ped_mask.shape + (1, 1))
    inter_xy = alpha * bv.gt_xy + (1 - alpha) * pred.abs[0]
    inter_dxdy = alpha * bv.gt_dxdy + (1 - alpha) * pred.rel[0]

    def score_sum(ixy, idxdy):
        scores, _, _ = D_mod.apply(
            d_params, d_state, d_spec, bv.in_xy, bv.in_dxdy,
            ixy[None], idxdy[None], bv.ped_mask, bv.loss_mask, bv.patches,
            train=True,
        )
        return (scores[0] * bv.loss_mask).sum()

    gx, gd = jax.grad(score_sum, argnums=(0, 1))(inter_xy, inter_dxdy)
    g = jnp.concatenate([gx, gd], axis=-1).reshape(bv.ped_mask.shape + (-1,))
    # safe norm: padded agents have exactly-zero grads and ||.|| has a NaN
    # derivative at 0, which would poison the grad-of-grad pass
    norms = jnp.sqrt((g * g).sum(-1) + 1e-12)
    return L.masked_mean((norms - 1.0) ** 2, bv.loss_mask) * gp_lambda


def build_train_step(config: Config, g_spec, d_spec, jit: bool = True):
    """Compile-time specialization over the full config surface.

    With ``jit=False`` the raw step function is returned so callers (the
    parallel layer) can jit it with explicit shardings.
    """
    phi_1, phi_2, phi_3 = L.phi_losses(config.gan_obj)
    tx_g, tx_d = optimizers(config)
    num_samples = config.num_samples
    num_exp = config.num_expectation_samples
    gan_type = config.gan_type

    # ------------------------------------------------------------------ D --
    def d_loss_fn(d_params, state: TrainState, bv: BatchViews, rng):
        k_lab, k_gen, k_gp = jax.random.split(rng, 3)
        lr_, lf_ = L.gan_labels(k_lab)
        valid = bv.loss_mask

        real_scores, _, d_state1 = D_mod.apply(
            d_params, state.d_state, d_spec, bv.in_xy, bv.in_dxdy,
            bv.gt_xy[None], bv.gt_dxdy[None], bv.ped_mask, valid, bv.patches,
            train=True,
        )
        real_loss = L.masked_mean(phi_1(real_scores, lr_, lf_), valid[None])

        pred, _, gen_idxs, noise, _ = _g_forward_sampled(
            state.g_params, state.g_state, g_spec, config, bv, k_gen,
            num_samples=1, train=True,
        )
        pred = jax.tree.map(jax.lax.stop_gradient, pred)
        gen_idxs = jax.lax.stop_gradient(gen_idxs)

        fake_scores, branch, _ = D_mod.apply(
            d_params, d_state1, d_spec, bv.in_xy, bv.in_dxdy,
            pred.abs, pred.rel, bv.ped_mask, valid, bv.patches, train=True,
        )
        fake_loss = L.masked_mean(phi_2(fake_scores, lr_, lf_), valid[None])

        total = real_loss + fake_loss
        metrics = {"train/discr_loss": real_loss + fake_loss}
        if gan_type == "mgan":
            # CE of the gen-id branch vs the sampled generator (train.py:181-186)
            labels = jnp.moveaxis(gen_idxs, -1, 0)  # (1,S,P)
            ce = L.softmax_cross_entropy(branch, labels)
            ce_loss = L.masked_mean(ce, valid[None])
            metrics["train/info_mgan_disc_loss"] = ce_loss
            total = total + ce_loss
        elif gan_type == "infogan":
            target = jnp.moveaxis(noise[..., :3], 0, 0)  # (1,S,P,3)
            info = 0.5 * L.masked_mean(
                (branch - target) ** 2, valid[None, :, :, None]
            )
            metrics["train/disc_info_loss"] = info
            total = total + info
        if config.gan_obj == "W":
            total = total + _gradient_penalty(
                d_params, state.d_state, d_spec, bv, pred, k_gp
            )
        if gan_type == "probgan":
            # SGHMC noise injection via the loss term lambda*<theta, n>,
            # n ~ N(0, alpha): its gradient adds lambda*n to every D param
            # grad, turning the update into an SGHMC step (reference
            # utils.py:10-15 helpers, shipped unwired there; probGAN flags
            # config.py:100-117).
            # key folded from rng with a constant far from split()'s
            # counter indices, so non-probgan RNG streams (pinned by the
            # golden fixtures) are untouched
            k_nl = jax.random.fold_in(rng, 1729)
            nl = trajectory_tools.noise_loss(d_params, k_nl, config.sghmc_alpha)
            metrics["train/d_noise_loss"] = nl
            total = total + config.d_noise_loss_lambda * nl
        return total, (metrics, d_state1)

    def d_step(state: TrainState, bv: BatchViews, rng):
        grads, (metrics, d_state1) = jax.grad(d_loss_fn, has_aux=True)(
            state.d_params, state, bv, rng
        )
        metrics["train/grad_norm_D"] = tree_global_norm(grads)
        metrics.update(per_module_grad_norms(grads, "D"))
        lr_d = scheduled_lr(config.d_lr, state.epoch, config.epochs)
        metrics["train/lr_D"] = lr_d
        updates, d_opt = tx_d.update(
            grads, with_lr(state.d_opt, lr_d), state.d_params
        )
        d_params = jax.tree.map(lambda p, u: p + u, state.d_params, updates)
        return (
            state.replace(d_params=d_params, d_opt=d_opt, d_state=d_state1),
            metrics,
        )

    # ------------------------------------------------------------------ G --
    def g_loss_fn(g_params, state: TrainState, bv: BatchViews, rng):
        k_lab, k_gen = jax.random.split(rng)
        lr_, lf_ = L.gan_labels(k_lab)
        valid = bv.loss_mask

        pred, logits, gen_idxs, noise, g_state1 = _g_forward_sampled(
            g_params, state.g_state, g_spec, config, bv, k_gen,
            num_samples=num_samples, train=True, needs_decoder_grad=True,
        )
        total = jnp.asarray(0.0)
        metrics = {}

        if config.l2_loss_type != "none":
            min_l2 = L.min_scene_l2(
                pred.abs, bv.gt_xy, valid, bv.ped_mask, config.l2_loss_type
            )
            metrics["train/L2_loss"] = min_l2
            total = total + state.l2_weight * min_l2

        scores, branch, _ = D_mod.apply(
            state.d_params, state.d_state, d_spec, bv.in_xy, bv.in_dxdy,
            pred.abs, pred.rel, bv.ped_mask, valid, bv.patches, train=True,
        )
        # scores: (K,S,P); gen_idxs: (S,P,K) -> align sample axis first
        idx_kf = jnp.moveaxis(gen_idxs, -1, 0)
        adv_elem = phi_3(scores, lr_, lf_)
        adv = L.count_reweighted_mean(
            adv_elem, idx_kf, config.num_gens, valid[None]
        )
        metrics["train/gen_loss"] = adv
        total = total + adv

        if gan_type == "mgan":
            ce = L.softmax_cross_entropy(branch, idx_kf)
            clf = L.count_reweighted_mean(ce, idx_kf, config.num_gens, valid[None])
            metrics["train/info_mgan_loss"] = clf
            total = total + config.clf_loss_weight * clf
        elif gan_type == "infogan":
            target = noise[..., :3]
            info = 0.5 * L.masked_mean((branch - target) ** 2, valid[None, :, :, None])
            info = info / num_samples  # train.py:123
            metrics["train/info_loss"] = info
            total = total + info
        if gan_type == "probgan":
            # SGHMC noise term for G (see d_loss_fn; lambda from
            # --g_noise_loss_lambda, std from --sghmc_alpha)
            k_nl = jax.random.fold_in(rng, 1729)  # see d_loss_fn note
            nl = trajectory_tools.noise_loss(g_params, k_nl, config.sghmc_alpha)
            metrics["train/g_noise_loss"] = nl
            total = total + config.g_noise_loss_lambda * nl
        return total, (metrics, g_state1)

    def g_step(state: TrainState, bv: BatchViews, rng):
        grads, (metrics, g_state1) = jax.grad(g_loss_fn, has_aux=True)(
            state.g_params, state, bv, rng
        )
        metrics["train/grad_norm_G"] = tree_global_norm(grads)
        metrics.update(per_module_grad_norms(grads, "G"))
        lr_g = scheduled_lr(config.g_lr, state.epoch, config.epochs)
        metrics["train/lr_G"] = lr_g
        updates, g_opt = tx_g.update(
            grads, with_lr(state.g_opt, lr_g), state.g_params
        )
        g_params = jax.tree.map(lambda p, u: p + u, state.g_params, updates)
        return (
            state.replace(g_params=g_params, g_opt=g_opt, g_state=g_state1),
            metrics,
        )

    # ----------------------------------------------------------------- PM --
    def pm_loss_fn(g_params, state: TrainState, bv: BatchViews, rng):
        valid = bv.loss_mask
        enc_h, social_feats, _ = G_mod.encode(
            g_params, state.g_state, g_spec, bv.in_xy, bv.in_dxdy,
            bv.ped_mask, bv.patches, train=True,
        )
        logits = G_mod.pm_logits(g_params, g_spec, enc_h)
        out_probs = jax.nn.softmax(logits, axis=-1)
        metrics = {
            f"probs/Gen {i} probability": L.masked_mean(out_probs[..., i], valid)
            for i in range(config.num_gens)
        }

        wt = config.weighting_target
        if wt == "mgan" and config.wt_mgan_compat:
            # Reference-literal computation (train.py:604-613): branch_out
            # is (b,1,G) and ``torch.softmax(branch_out, 1)`` softmaxes the
            # SINGLETON axis -> all-ones targets, and the (b,1,G)x(b,G)
            # broadcast makes the loss b * mean_{j,g}(-log pm[j,g]). The D
            # branch values cancel entirely, so no D call is needed.
            n_valid = valid.sum().astype(jnp.float32)
            ce = -jnp.log(out_probs).mean(-1)  # mean over G
            loss = n_valid * L.masked_mean(ce, valid)
            ent = -(out_probs * jnp.log(out_probs)).sum(-1)
            reg = (0.9 ** state.epoch.astype(jnp.float32)) * L.masked_mean(ent, valid)
            loss = loss - reg
        elif wt == "mgan":
            _, branch, _ = D_mod.apply(
                state.d_params, state.d_state, d_spec, bv.in_xy, bv.in_dxdy,
                bv.gt_xy[None], bv.gt_dxdy[None], bv.ped_mask, valid,
                bv.patches, train=True,
            )
            target_probs = jax.lax.stop_gradient(jax.nn.softmax(branch[0], axis=-1))
            ce = -(target_probs * jnp.log(out_probs)).sum(-1)
            loss = L.masked_mean(ce, valid)
            ent = -(out_probs * jnp.log(out_probs)).sum(-1)
            reg = (0.9 ** state.epoch.astype(jnp.float32)) * L.masked_mean(ent, valid)
            loss = loss - reg  # train.py:604-613
        else:
            # These targets need all-generator rollouts (train.py:585-594).
            s, p = bv.ped_mask.shape
            noise = sampling.global_noise(rng, num_exp, s, p, config.noise_dim)
            out_all = G_mod.decode_all(
                g_params, g_spec, bv.in_xy[:, :, -1], bv.in_dxdy[:, :, -1],
                enc_h, social_feats, noise,
            )
            gen_abs = jax.lax.stop_gradient(out_all.abs)  # (Ke,G,S,P,T,2)
            if wt == "l2":
                d = jnp.linalg.norm(
                    gen_abs - bv.gt_xy[None, None], axis=-1
                ).mean(-1)  # (Ke,G,S,P) mean over T (train.py:617)
                per_gen = d.min(0)  # (G,S,P) min over samples
                min_idx = jnp.argmin(per_gen, axis=0)  # (S,P)
                ce = L.softmax_cross_entropy(logits, min_idx)
                loss = L.masked_mean(ce, valid)
            elif wt == "endpoint":
                d = jnp.linalg.norm(
                    gen_abs[..., -1, :] - bv.gt_xy[None, None, :, :, -1, :], axis=-1
                )  # (Ke,G,S,P)
                per_gen = d.min(0)
                min_idx = jnp.argmin(per_gen, axis=0)
                ce = L.softmax_cross_entropy(logits, min_idx)
                loss = L.masked_mean(ce, valid)
            elif wt == "ml":
                # Bayes posterior from Normal log-likelihood (train.py:626-639)
                lp = L.normal_log_prob(
                    gen_abs - bv.gt_xy[None, None], config.sigma
                ).sum((-1, -2))  # (Ke,G,S,P) summed over (T, 2)
                lp = lp.mean(0)  # (G,S,P)
                gen_prob = jax.nn.softmax(lp, axis=0)  # softmax over G
                gen_prob = jnp.moveaxis(gen_prob, 0, -1)  # (S,P,G)
                ce = -(gen_prob * jnp.log(out_probs)).sum(-1)
                loss = L.masked_mean(ce, valid)
            elif wt == "disc_scores":
                raise NotImplementedError  # train.py:602-603
            else:
                raise ValueError("Weighting target does not exist")

        metrics["train/net_chooser_loss"] = loss
        return loss * config.pi_net_loss_weight, metrics

    def pm_step(state: TrainState, bv: BatchViews, rng):
        grads, metrics = jax.grad(pm_loss_fn, has_aux=True)(
            state.g_params, state, bv, rng
        )
        g_opt = with_lr(
            state.g_opt, scheduled_lr(config.g_lr, state.epoch, config.epochs)
        )
        updates, g_opt = tx_g.update(grads, g_opt, state.g_params)
        g_params = jax.tree.map(lambda p, u: p + u, state.g_params, updates)
        return state.replace(g_params=g_params, g_opt=g_opt), metrics

    # --------------------------------------------------------------- step --
    def train_step(state: TrainState, batch):
        bv = batch_views(batch)
        rng, kd, kg, kpm = jax.random.split(state.rng, 4)
        state = state.replace(rng=rng)
        metrics = {}

        # D-step gating (abstract_train.py:136-138)
        do_d = jnp.logical_or(
            state.step % config.num_gen_steps == 0,
            state.epoch >= config.keep_gen_steps,
        )

        def run_d(st):
            backup = st.d_params
            m_all = {}
            for u in range(config.num_unrolling_steps + 1):
                st, m = d_step(st, bv, jax.random.fold_in(kd, u))
                if u == 0:
                    m_all = m
                    backup = st.d_params if config.num_unrolling_steps > 0 else backup
            return st, m_all, backup

        if config.num_unrolling_steps > 0:
            # Unrolled GAN: D trains ahead, G sees the unrolled D, then D is
            # rolled back to its first update (abstract_train.py:151-162).
            # The unroll is NESTED inside the num_gen_steps/keep_gen_steps
            # gate (abstract_train.py:136-150): on gated-out iterations no
            # D-step runs and the rollback restore is a no-op (D already
            # equals the previous iteration's backup).
            if config.num_gen_steps <= 1:
                state, d_metrics, d_backup = run_d(state)
            else:
                def skip_d(st):
                    _, m_shape, _ = jax.eval_shape(run_d, st)
                    nans = jax.tree.map(
                        lambda s: jnp.full(s.shape, jnp.nan, s.dtype), m_shape
                    )
                    return st, nans, st.d_params

                state, d_metrics, d_backup = jax.lax.cond(
                    do_d, run_d, skip_d, state
                )
            metrics.update(d_metrics)
            state, g_metrics = g_step(state, bv, kg)
            metrics.update(g_metrics)
            if config.weighting_target != "none":
                state, pm_metrics = pm_step(state, bv, kpm)
                metrics.update(pm_metrics)
            state = state.replace(d_params=d_backup)
        elif config.num_gen_steps <= 1:
            # gate condition is identically true -> no cond, half the compile
            state, d_metrics = d_step(state, bv, kd)
            metrics.update(d_metrics)
            state, g_metrics = g_step(state, bv, kg)
            metrics.update(g_metrics)
            if config.weighting_target != "none":
                state, pm_metrics = pm_step(state, bv, kpm)
                metrics.update(pm_metrics)
        else:
            def do_d_branch(st):
                st2, m = d_step(st, bv, kd)
                return st2, m

            def skip_d_branch(st):
                # NaN sentinels: the loop aggregates with nanmean so skipped
                # D-steps don't dilute epoch means (the reference simply
                # doesn't append on skipped iterations).
                _, m_shape = jax.eval_shape(d_step, st, bv, kd)
                nans = jax.tree.map(
                    lambda s: jnp.full(s.shape, jnp.nan, s.dtype), m_shape
                )
                return st, nans

            state, d_metrics = jax.lax.cond(do_d, do_d_branch, skip_d_branch, state)
            metrics.update(d_metrics)
            state, g_metrics = g_step(state, bv, kg)
            metrics.update(g_metrics)
            if config.weighting_target != "none":
                state, pm_metrics = pm_step(state, bv, kpm)
                metrics.update(pm_metrics)

        if gan_type == "probgan":
            # history EMA every 10 iterations (abstract_train.py:164-166)
            state = jax.lax.cond(
                state.step % 10 == 0,
                lambda st: st.replace(
                    d_state=D_mod.update_hist(st.d_params, st.d_state)
                ),
                lambda st: st,
                state,
            )

        state = state.replace(step=state.step + 1)
        return state, metrics

    if jit == "phases":
        return d_step, g_step, pm_step
    if jit:
        return jax.jit(train_step, donate_argnums=(0,))
    return train_step


def build_split_train_step(config: Config, g_spec, d_spec):
    """Three separately-jitted sub-steps (D, G, PM) instead of one fused
    program. Semantically equivalent for the common case (no unrolled GAN,
    num_gen_steps<=1) up to the RNG stream layout; the payoff is compile
    time: ``precompile()`` lowers and compiles the three programs in
    parallel threads, which overlap ~linearly through the TPU
    remote-compile service (important on this environment where the fused
    step can take minutes to compile).
    """
    assert config.num_unrolling_steps == 0 and config.num_gen_steps <= 1, (
        "split step supports the common ungated configuration; use the "
        "fused build_train_step otherwise"
    )
    d_step, g_step, pm_step = build_train_step(config, g_spec, d_spec, jit="phases")
    use_pm = config.weighting_target != "none"

    def d_phase(state: TrainState, batch):
        bv = batch_views(batch)
        kd = jax.random.fold_in(jax.random.fold_in(state.rng, state.step), 0)
        return d_step(state, bv, kd)

    def g_phase(state: TrainState, batch):
        bv = batch_views(batch)
        kg = jax.random.fold_in(jax.random.fold_in(state.rng, state.step), 1)
        return g_step(state, bv, kg)

    def pm_phase(state: TrainState, batch):
        bv = batch_views(batch)
        kpm = jax.random.fold_in(jax.random.fold_in(state.rng, state.step), 2)
        state, metrics = pm_step(state, bv, kpm)
        if config.gan_type == "probgan":
            state = jax.lax.cond(
                state.step % 10 == 0,
                lambda st: st.replace(
                    d_state=D_mod.update_hist(st.d_params, st.d_state)
                ),
                lambda st: st,
                state,
            )
        state = state.replace(
            step=state.step + 1, rng=jax.random.split(state.rng)[0]
        )
        return state, metrics

    jits = [jax.jit(d_phase, donate_argnums=(0,)), jax.jit(g_phase, donate_argnums=(0,))]
    if use_pm:
        jits.append(jax.jit(pm_phase, donate_argnums=(0,)))
    else:
        def finalize(state: TrainState, batch):
            return state.replace(
                step=state.step + 1, rng=jax.random.split(state.rng)[0]
            ), {}

        jits.append(jax.jit(finalize, donate_argnums=(0,)))

    compiled = {}

    def step(state: TrainState, batch):
        metrics = {}
        for i, fn in enumerate(jits):
            state, m = compiled.get(i, fn)(state, batch)
            metrics.update(m)
        return state, metrics

    def precompile(state: TrainState, batch):
        """AOT-compile all phases in parallel threads; subsequent ``step``
        calls use the compiled executables directly."""
        import threading

        lowered = [fn.lower(state, batch) for fn in jits]

        def compile_one(i):
            compiled[i] = lowered[i].compile()

        threads = [
            threading.Thread(target=compile_one, args=(i,))
            for i in range(len(lowered))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    step.precompile = precompile
    return step
