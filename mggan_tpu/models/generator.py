"""Multi-generator G: encoder + scene/social context + PM-net + stacked decoders.

Reference: ``MultiGenerator`` (standard.py:17-302) and the discrete-latent
ablation ``DiscreteLatentGenerator`` (standard_discrete.py:18-257).

TPU re-design:
* All ragged scene handling is dense ``(S, P)`` + masks.
* ``forward_all`` (standard.py:227-265, a Python loop over generators) is a
  single vmapped rollout over the stacked decoder axis.
* The ``all_gen_out=False`` shortcut with occurrence-offset gathers
  (standard.py:186-214) is replaced by decode-all + one-hot gather
  (see ops/sampling.gather_samples) — static shapes, MXU-friendly.
* Per-scene shared noise is drawn once over the scene axis and broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mggan_tpu.ops.linear import linear_init, mlp_init, mlp_apply
from mggan_tpu.ops import social as social_ops
from mggan_tpu.ops.cnn import scene_cnn_init, scene_cnn_apply
from mggan_tpu.models import common
from mggan_tpu.models.common import GeneratorOutput  # re-export


@dataclass(frozen=True)
class GeneratorSpec:
    """Static architecture hyper-parameters (subset of Config)."""

    z_size: int
    encoder_h_dim: int
    decoder_h_dim: int
    social_feat_size: int  # 0 disables the social module
    num_gens: int
    pred_len: int
    embedding_dim: int
    inp_format: str
    pool_type: str
    scene_dim: int  # 0 disables the scene CNN
    use_pinet: bool
    learn_prior: bool
    discrete: bool = False  # DiscreteLatentGenerator ablation
    # Fused Pallas rollout kernel (ops/pallas/decoder.py). Takes effect only
    # on a TPU backend and off any dp/gp mesh; the XLA scan remains the
    # portable/autodiff reference path.
    use_pallas: bool = False

    @property
    def social_out_dim(self) -> int:
        # Both sways attention and sgan pooling emit encoder_h_dim features
        # (social.py:28 pools enc_h rows; social_gan bottleneck=encoder_h_dim).
        return self.encoder_h_dim if self.social_feat_size > 0 else 0

    @property
    def enc_total(self) -> int:
        return self.encoder_h_dim + self.scene_dim + self.social_out_dim


def init(key, spec: GeneratorSpec):
    """Build (params, state). state holds scene-CNN BatchNorm stats."""
    ks = jax.random.split(key, 8)
    params = {
        "encoder": common.trajectory_encoder_init(
            ks[0],
            common.input_size(spec.inp_format),
            spec.encoder_h_dim,
            spec.embedding_dim,
        )
    }
    state = {}
    if spec.scene_dim > 0:
        params["scene"], state["scene"] = scene_cnn_init(ks[1], channels_cnn=16)
    if spec.social_feat_size > 0:
        if spec.pool_type == "sways":
            params["social"] = {
                "embed": mlp_init(ks[2], [3, 32, 64, spec.social_feat_size]),
                "w": linear_init(ks[3], spec.encoder_h_dim, spec.social_feat_size),
            }
        else:
            params["social"] = {
                "spatial": linear_init(ks[2], 2, spec.embedding_dim),
                "pre_pool": mlp_init(
                    ks[3],
                    [
                        spec.embedding_dim + spec.encoder_h_dim,
                        spec.encoder_h_dim,
                        spec.encoder_h_dim,
                    ],
                ),
            }

    dec_social = spec.social_out_dim
    if spec.discrete:
        params["decoder"] = common.relative_decoder_init(
            ks[4], spec.embedding_dim, spec.decoder_h_dim, spec.inp_format, dec_social
        )
        # one-hot -> z embedding (standard_discrete.py:103)
        params["one_hot_sample_encoder"] = mlp_init(
            ks[7], [spec.num_gens, spec.z_size, spec.z_size]
        )
        enc_to_dec_in = spec.enc_total + spec.z_size + spec.z_size
    else:
        params["decoders"] = common.stacked_decoders_init(
            ks[4],
            spec.num_gens,
            spec.embedding_dim,
            spec.decoder_h_dim,
            spec.inp_format,
            dec_social,
        )
        enc_to_dec_in = spec.enc_total + spec.z_size

    # single linear (make_mlp with two dims; standard.py:91-94)
    params["enc_to_dec"] = mlp_init(ks[5], [enc_to_dec_in, spec.decoder_h_dim])
    h = spec.encoder_h_dim
    params["net_chooser"] = mlp_init(
        ks[6], [spec.enc_total, h // 2, h // 2, spec.num_gens]
    )
    params["net_prior"] = jnp.zeros((1, spec.num_gens))
    return params, state


def encode(params, state, spec: GeneratorSpec, in_xy, in_dxdy, ped_mask,
           patches, train, compute_dtype=None):
    """Shared context encoding (standard.py:140-155).

    ``compute_dtype`` (eval-only, e.g. bf16) selects the scene CNN's
    reduced-precision activation path (ops/cnn.py::scene_cnn_apply); the
    trajectory encoder and social module stay f32 (they are a tiny share
    of the encode cost).

    Returns (enc_h (S,P,E_total), social_feats (S,P,F), new_state).
    """
    enc_inp = common.get_input(in_xy, in_dxdy, spec.inp_format)
    enc_h = common.trajectory_encoder_apply(params["encoder"], enc_inp)
    feats = [enc_h]
    new_state = dict(state)
    if spec.scene_dim > 0 and patches is not None:
        s, p = patches.shape[:2]
        flat = patches.reshape((s * p,) + patches.shape[2:])
        scene_enc, new_scene_state = scene_cnn_apply(
            params["scene"], state["scene"], flat, train,
            mask=ped_mask.reshape(s * p), compute_dtype=compute_dtype,
        )
        feats.append(scene_enc.reshape(s, p, -1))
        new_state["scene"] = new_scene_state
    if spec.social_feat_size > 0:
        last_xy = in_xy[..., -1, :]
        last_dxdy = in_dxdy[..., -1, :]
        if spec.pool_type == "sways":
            social_feats = social_ops.social_attention_apply(
                params["social"], last_xy, last_dxdy, enc_h, ped_mask
            )
        else:
            social_feats = social_ops.pool_hidden_net_apply(
                params["social"], last_xy, enc_h, ped_mask
            )
        feats.append(social_feats)
    else:
        social_feats = jnp.zeros(enc_h.shape[:-1] + (0,), enc_h.dtype)
    return jnp.concatenate(feats, axis=-1), social_feats, new_state


def pm_logits(params, spec: GeneratorSpec, enc_h):
    """PM-network logits or (learnable) prior (standard.py:217-225)."""
    if spec.use_pinet:
        return mlp_apply(params["net_chooser"], enc_h, activation="relu")
    prior = params["net_prior"][0]
    return jnp.broadcast_to(prior, enc_h.shape[:-1] + (spec.num_gens,))


def _broadcast_decoder_inputs(params, last_xy, last_dxdy, enc_h,
                              social_feats, noise):
    """Broadcast per-agent tensors over the K noise samples and flatten to
    (k*s*p)-major rows — the shared decode prologue. Row order here defines
    the flattening every consumer (decode_all's reshape, decode_select's
    gen_idxs one-hot) relies on.

    Returns (xy_b, dxdy_b, social_b, h0) with leading axis n = k*s*p.
    """
    k, s, p, _ = noise.shape
    n = k * s * p
    enc_b = jnp.broadcast_to(enc_h[None], (k,) + enc_h.shape)
    flat = lambda x: x.reshape((n,) + x.shape[3:])
    social_b = flat(jnp.broadcast_to(social_feats[None], (k,) + social_feats.shape))
    xy_b = flat(jnp.broadcast_to(last_xy[None], (k,) + last_xy.shape))
    dxdy_b = flat(jnp.broadcast_to(last_dxdy[None], (k,) + last_dxdy.shape))
    inp = jnp.concatenate([enc_b, noise], axis=-1)
    h0 = flat(mlp_apply(params["enc_to_dec"], inp))
    return xy_b, dxdy_b, social_b, h0


def decode_all(params, spec: GeneratorSpec, last_xy, last_dxdy, enc_h,
               social_feats, noise, compute_dtype=None, use_pallas=True):
    """Run every generator on every noise sample (standard.py:227-265).

    Args:
        last_xy/last_dxdy: (S, P, 2).
        enc_h: (S, P, E_total); social_feats: (S, P, F).
        noise: (K, S, P, z).
        compute_dtype: optional bf16 fast path for the recurrent matmuls.
        use_pallas: caller veto for the fused kernel (kept for debugging /
            A-B timing; the kernel has a fused backward so training paths
            use it too).

    Returns:
        GeneratorOutput with abs/rel of shape (K, G, S, P, pred_len, 2).
    """
    k, s, p, _ = noise.shape
    n = k * s * p

    if spec.discrete:
        # One shared decoder; generator identity enters through an embedded
        # one-hot appended to enc_h (standard_discrete.py:168-223). The
        # prologue differs from _broadcast_decoder_inputs: h0 is computed
        # per generator with the one-hot embedding in the concat.
        enc_b = jnp.broadcast_to(enc_h[None], (k,) + enc_h.shape)
        flat = lambda x: x.reshape((n,) + x.shape[3:])
        social_b = flat(
            jnp.broadcast_to(social_feats[None], (k,) + social_feats.shape))
        xy_b = flat(jnp.broadcast_to(last_xy[None], (k,) + last_xy.shape))
        dxdy_b = flat(jnp.broadcast_to(last_dxdy[None], (k,) + last_dxdy.shape))
        eye = jnp.eye(spec.num_gens)
        enc_flat = flat(enc_b)
        noise_flat = flat(noise)

        def decode_gen(onehot_row):
            emb = mlp_apply(params["one_hot_sample_encoder"], onehot_row)
            emb_b = jnp.broadcast_to(emb[None], (n,) + emb.shape)
            inp = jnp.concatenate([enc_flat, emb_b, noise_flat], axis=-1)
            h0 = mlp_apply(params["enc_to_dec"], inp)
            return common.relative_decoder_apply(
                params["decoder"], xy_b, dxdy_b, social_b, h0,
                spec.pred_len, spec.inp_format, compute_dtype,
            )

        abs_g, rel_g = jax.vmap(decode_gen)(eye)  # (G, N, T, 2)
    else:
        xy_b, dxdy_b, social_b, h0 = _broadcast_decoder_inputs(
            params, last_xy, last_dxdy, enc_h, social_feats, noise
        )
        if spec.use_pallas and use_pallas and jax.default_backend() == "tpu":
            from mggan_tpu.ops.pallas.decoder import pallas_decode_all

            abs_g, rel_g = pallas_decode_all(
                params["decoders"], xy_b, dxdy_b, social_b, h0,
                spec.pred_len, spec.inp_format, compute_dtype,
            )
        else:
            abs_g, rel_g = common.stacked_decoders_apply(
                params["decoders"], xy_b, dxdy_b, social_b, h0,
                spec.pred_len, spec.inp_format, compute_dtype,
            )

    reshape = lambda x: jnp.moveaxis(
        x.reshape(spec.num_gens, k, s, p, spec.pred_len, 2), 0, 1
    )
    return GeneratorOutput(rel=reshape(rel_g), abs=reshape(abs_g))


def decode_select(params, spec: GeneratorSpec, last_xy, last_dxdy, enc_h,
                  social_feats, noise, gen_idxs, compute_dtype=None,
                  fuse_select=True):
    """Decode only the SAMPLED generator per (sample, agent).

    The ``all_gen_out=False`` path's final product (standard.py:186-214):
    ``decode_all`` + one-hot gather, but on TPU fused into one kernel that
    reduces the generator lane blocks in VMEM and stores only the selected
    rollout — 1/4G of the gather path's HBM traffic (the dominant
    non-decode sampling cost, r2 TODO).

    Forward-only fusion: callers that differentiate through the rollout
    (G-step) pass ``fuse_select=False`` and get decode_all + gather, whose
    Pallas kernel has a fused VJP.

    Args:
        noise: (K, S, P, z); gen_idxs: (S, P, K) int.
    Returns:
        GeneratorOutput with abs/rel of shape (K, S, P, pred_len, 2).
    """
    from mggan_tpu.ops import sampling as sampling_ops

    k, s, p, _ = noise.shape
    fused = (
        fuse_select
        and not spec.discrete
        and spec.use_pallas
        and jax.default_backend() == "tpu"
    )
    if not fused:
        out = decode_all(
            params, spec, last_xy, last_dxdy, enc_h, social_feats, noise,
            compute_dtype,
        )
        return GeneratorOutput(
            rel=sampling_ops.gather_samples(out.rel, gen_idxs),
            abs=sampling_ops.gather_samples(out.abs, gen_idxs),
        )

    from mggan_tpu.ops.pallas.decoder import pallas_decode_select

    n = k * s * p
    xy_b, dxdy_b, social_b, h0 = _broadcast_decoder_inputs(
        params, last_xy, last_dxdy, enc_h, social_feats, noise
    )

    # rows are (k, s, p)-major, exactly decode_all's flattening
    # (_broadcast_decoder_inputs is shared, so they cannot diverge)
    idx_flat = jnp.moveaxis(gen_idxs, -1, 0).reshape(n)
    onehot = jax.nn.one_hot(idx_flat, spec.num_gens, dtype=jnp.float32)
    abs_sel, rel_sel = pallas_decode_select(
        params["decoders"], xy_b, dxdy_b, social_b, h0, onehot,
        spec.pred_len, spec.inp_format, compute_dtype,
    )
    reshape = lambda x: x.reshape(k, s, p, spec.pred_len, 2)
    return GeneratorOutput(rel=reshape(rel_sel), abs=reshape(abs_sel))
