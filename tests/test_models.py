"""Module-level shape/mask/equivalence tests (SURVEY.md §4 level 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mggan_tpu.config import Config
from mggan_tpu.models import factory, generator, discriminator, common
from mggan_tpu.ops import sampling


S, P, K = 3, 5, 4


def make_batch(key, s=S, p=P, with_patches=True):
    ks = jax.random.split(key, 4)
    xy = jax.random.normal(ks[0], (s, p, 20, 2))
    ped_mask = jnp.arange(p)[None, :] < jnp.array([[2], [5], [1]])[:s]
    loss_mask = ped_mask & (jax.random.uniform(ks[1], (s, p)) > 0.1)
    patches = (
        jax.random.uniform(ks[2], (s, p, 33, 33, 4), minval=-1, maxval=1)
        if with_patches
        else None
    )
    return {
        "in_xy": xy[:, :, :8],
        "in_dxdy": xy[:, :, 1:8] - xy[:, :, :7],
        "gt_xy": xy[:, :, 8:],
        "gt_dxdy": xy[:, :, 8:] - xy[:, :, 7:19],
        "ped_mask": ped_mask,
        "loss_mask": loss_mask,
        "patches": patches,
    }


@pytest.mark.parametrize("experiment", ["multi_generator", "discrete"])
@pytest.mark.parametrize("inp_format", ["rel", "abs", "abs_rel"])
def test_generator_forward_shapes(experiment, inp_format):
    cfg = Config(num_gens=3, experiment=experiment, inp_format=inp_format)
    key = jax.random.PRNGKey(0)
    (gp, gs, gspec), _ = factory.construct_model(cfg, key)
    batch = make_batch(jax.random.PRNGKey(1))

    enc_h, social_feats, new_state = generator.encode(
        gp, gs, gspec, batch["in_xy"], batch["in_dxdy"], batch["ped_mask"],
        batch["patches"], train=True,
    )
    assert enc_h.shape == (S, P, gspec.enc_total)

    logits = generator.pm_logits(gp, gspec, enc_h)
    assert logits.shape == (S, P, 3)

    noise = sampling.global_noise(jax.random.PRNGKey(2), K, S, P, cfg.noise_dim)
    # noise identical across peds of a scene (utils.py:160-165)
    np.testing.assert_allclose(noise[:, :, 0], noise[:, :, 1])

    out = generator.decode_all(
        gp, gspec, batch["in_xy"][:, :, -1], batch["in_dxdy"][:, :, -1],
        enc_h, social_feats, noise,
    )
    assert out.abs.shape == (K, 3, S, P, 12, 2)
    # integration invariant: abs = cumsum(rel) + last_xy
    ref = jnp.cumsum(out.rel, axis=-2) + batch["in_xy"][None, None, :, :, -1:, :]
    np.testing.assert_allclose(np.asarray(out.abs), np.asarray(ref), atol=1e-5)


def test_stacked_equals_loop():
    """vmapped stacked decoders == looped single decoders."""
    key = jax.random.PRNGKey(0)
    stacked = common.stacked_decoders_init(key, 3, 16, 32, "rel", 8)
    n = 7
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    xy = jax.random.normal(ks[0], (n, 2))
    dxdy = jax.random.normal(ks[1], (n, 2))
    soc = jax.random.normal(ks[2], (n, 8))
    h0 = jax.random.normal(ks[3], (n, 32))

    abs_v, rel_v = common.stacked_decoders_apply(stacked, xy, dxdy, soc, h0, 12, "rel")
    for g in range(3):
        single = jax.tree.map(lambda x: x[g], stacked)
        a, r = common.relative_decoder_apply(single, xy, dxdy, soc, h0, 12, "rel")
        np.testing.assert_allclose(np.asarray(abs_v[g]), np.asarray(a), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rel_v[g]), np.asarray(r), atol=1e-6)


@pytest.mark.parametrize("gan_type", ["mgan", "gan", "infogan", "probgan"])
def test_discriminator_forward(gan_type):
    cfg = Config(num_gens=2, gan_type=gan_type)
    key = jax.random.PRNGKey(0)
    _, (dp, ds, dspec) = factory.construct_model(cfg, key)
    batch = make_batch(jax.random.PRNGKey(1))
    pred_xy = jax.random.normal(jax.random.PRNGKey(2), (K, S, P, 12, 2))
    pred_dxdy = jax.random.normal(jax.random.PRNGKey(3), (K, S, P, 12, 2))

    scores, branch, new_state = discriminator.apply(
        dp, ds, dspec, batch["in_xy"], batch["in_dxdy"], pred_xy, pred_dxdy,
        batch["ped_mask"], batch["loss_mask"], batch["patches"], train=True,
    )
    assert scores.shape == (K, S, P)
    if gan_type in ("mgan", "infogan"):
        assert branch.shape == (K, S, P, 2 if gan_type == "mgan" else 3)
    else:
        assert branch is None
    # bounded output squashed into (eps, 1-eps) (discriminators.py:204)
    assert float(scores.min()) > 0 and float(scores.max()) < 1

    if gan_type == "probgan":
        new_state2 = discriminator.update_hist(dp, ds)
        assert float(new_state2["hist"]["len"]) == 2.0


def test_masked_future_encoding_zeroed():
    """Agents with invalid futures must contribute history-only encodings:
    their score must not depend on the (gt) future values
    (discriminators.py:135-138)."""
    cfg = Config(num_gens=2, gan_type="gan", global_disc=0)
    key = jax.random.PRNGKey(0)
    _, (dp, ds, dspec) = factory.construct_model(cfg, key)
    batch = make_batch(jax.random.PRNGKey(1), with_patches=True)
    patches = batch["patches"]
    future_valid = batch["ped_mask"] & (jnp.arange(P)[None, :] != 0)

    pred1 = jax.random.normal(jax.random.PRNGKey(2), (1, S, P, 12, 2))
    pred2 = pred1.at[:, :, 0].set(999.0)  # change only invalid agents' future

    s1, _, _ = discriminator.apply(
        dp, ds, dspec, batch["in_xy"], batch["in_dxdy"], pred1, pred1,
        batch["ped_mask"], future_valid, patches, train=False,
    )
    s2, _, _ = discriminator.apply(
        dp, ds, dspec, batch["in_xy"], batch["in_dxdy"], pred2, pred2,
        batch["ped_mask"], future_valid, patches, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(s1[:, :, 0]), np.asarray(s2[:, :, 0]), atol=1e-6
    )
