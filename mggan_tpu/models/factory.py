"""Model factory (reference model_factory.py:7-86)."""

from __future__ import annotations

import jax

from mggan_tpu.config import Config, PRED_LEN, SCENE_DIM
from mggan_tpu.models import generator, discriminator
from mggan_tpu.utils.pytree import count_parameters


def build_specs(config: Config):
    unbound_output = config.gan_obj in ("W", "LS")
    num_discs = 5 if config.gan_type == "probgan" else 1
    use_pinet = config.weighting_target != "none" and not config.unconditional

    discrete = config.experiment == "discrete"
    g_spec = generator.GeneratorSpec(
        z_size=config.noise_dim,
        encoder_h_dim=config.h_dim,
        decoder_h_dim=config.decoder_h_dim,
        social_feat_size=config.h_dim if config.n_social_modules > 0 else 0,
        num_gens=config.num_gens,
        pred_len=PRED_LEN,
        # multi_generator uses decoder_h_dim//2, discrete uses 16
        # (model_factory.py:28,57)
        embedding_dim=16 if discrete else int(config.decoder_h_dim // 2),
        inp_format=config.inp_format,
        pool_type=config.pool_type,
        scene_dim=SCENE_DIM,
        use_pinet=use_pinet,
        learn_prior=config.unconditional,
        discrete=discrete,
        use_pallas=(
            bool(getattr(config, "pallas_decoder", 1))
            and not discrete
            # The fused kernel has no GSPMD partitioning rule: single-chip
            # only (any mesh axis > 1 -> XLA scan path).
            and config.dp * config.gp * getattr(config, "slices", 1) == 1
        ),
    )
    d_spec = discriminator.DiscriminatorSpec(
        h_dim=config.h_dim * 2,
        inp_format=config.inp_format,
        pred_len=PRED_LEN,
        num_discs=num_discs,
        num_gens=config.num_gens,
        gan_type=config.gan_type,
        global_disc=bool(config.global_disc),
        scene_dim=SCENE_DIM,
        pool_type=config.pool_type,
        unbound_output=unbound_output,
    )
    return g_spec, d_spec


def construct_model(config: Config, key):
    """Build ((g_params, g_state, g_spec), (d_params, d_state, d_spec))."""
    g_spec, d_spec = build_specs(config)
    gk, dk = jax.random.split(key)
    g_params, g_state = generator.init(gk, g_spec)
    d_params, d_state = discriminator.init(dk, d_spec)
    config.num_gen_parameters = count_parameters(g_params)
    print("G #parameters: ", count_parameters(g_params))
    print("D #parameters: ", count_parameters(d_params))
    return (g_params, g_state, g_spec), (d_params, d_state, d_spec)
