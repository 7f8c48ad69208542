"""Smoke + shape tests for the legacy Social-GAN family and grid pooling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mggan_tpu.models import social_gan_legacy as sgan
from mggan_tpu.ops import social as social_ops
from mggan_tpu.ops.linear import mlp_init


@pytest.mark.parametrize("pooling", ["pool_net", "spool", "none"])
@pytest.mark.parametrize("mix", ["global", "ped"])
def test_sgan_generator(pooling, mix):
    spec = sgan.SGANSpec(pooling_type=pooling, noise_mix_type=mix)
    params = sgan.generator_init(jax.random.PRNGKey(0), spec)
    S, P = 2, 5
    rng = np.random.RandomState(0)
    in_xy = jnp.asarray(rng.randn(S, P, 8, 2).astype(np.float32))
    in_dxdy = in_xy[:, :, 1:] - in_xy[:, :, :-1]
    mask = jnp.asarray(rng.rand(S, P) > 0.3)
    abs_out, rel_out = sgan.generator_apply(
        params, spec, in_xy, in_dxdy, mask, jax.random.PRNGKey(1)
    )
    assert abs_out.shape == (S, P, 12, 2)
    np.testing.assert_allclose(
        np.asarray(abs_out),
        np.asarray(jnp.cumsum(rel_out, -2) + in_xy[:, :, -1:, :]),
        atol=1e-5,
    )


@pytest.mark.parametrize("d_type", ["local", "global"])
def test_sgan_discriminator(d_type):
    spec = sgan.SGANSpec(d_type=d_type)
    params = sgan.discriminator_init(jax.random.PRNGKey(0), spec)
    S, P = 2, 4
    rng = np.random.RandomState(0)
    xy = jnp.asarray(rng.randn(S, P, 20, 2).astype(np.float32))
    dxdy = xy[:, :, 1:] - xy[:, :, :-1]
    mask = jnp.ones((S, P), bool)
    scores = sgan.discriminator_apply(params, spec, xy, dxdy, mask)
    assert scores.shape == (S, P)


def test_social_pooling_grid():
    """Peers outside the neighborhood must not contribute; self excluded."""
    S, P, H = 1, 3, 4
    params = {"pool": mlp_init(jax.random.PRNGKey(0), [64 * H, H])}
    xy = jnp.asarray([[[0.0, 0.0], [0.5, 0.5], [100.0, 100.0]]])
    h = jnp.asarray(np.eye(3, H, dtype=np.float32))[None]
    mask = jnp.ones((S, P), bool)
    out_all = social_ops.social_pooling_apply(params, xy, h, mask)
    # moving the far ped further must not change ped 0's pooled output
    xy2 = xy.at[0, 2].set(jnp.asarray([200.0, 200.0]))
    out2 = social_ops.social_pooling_apply(params, xy2, h, mask)
    np.testing.assert_allclose(
        np.asarray(out_all[0, 0]), np.asarray(out2[0, 0]), atol=1e-6
    )
    # but moving the near ped does
    xy3 = xy.at[0, 1].set(jnp.asarray([-0.5, 0.5]))
    out3 = social_ops.social_pooling_apply(params, xy3, h, mask)
    assert np.abs(np.asarray(out3[0, 0] - out_all[0, 0])).max() > 1e-8
