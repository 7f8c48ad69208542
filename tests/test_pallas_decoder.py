"""Pallas fused decoder == XLA scan decoder (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mggan_tpu.models import common
from mggan_tpu.ops.pallas import decoder as dec
from mggan_tpu.ops.pallas.decoder import pallas_decode_all


@pytest.fixture(autouse=True)
def _interpret_mode():
    dec.INTERPRET = True
    yield
    dec.INTERPRET = False


@pytest.mark.parametrize("inp_format", ["rel", "abs", "abs_rel"])
def test_pallas_matches_scan(inp_format):
    key = jax.random.PRNGKey(0)
    G, N, EMB, H, F = 3, 70, 16, 32, 8
    stacked = common.stacked_decoders_init(key, G, EMB, H, inp_format, F)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    xy = jax.random.normal(ks[0], (N, 2))
    dxdy = jax.random.normal(ks[1], (N, 2))
    soc = jax.random.normal(ks[2], (N, F))
    h0 = jax.random.normal(ks[3], (N, H))

    abs_ref, rel_ref = common.stacked_decoders_apply(
        stacked, xy, dxdy, soc, h0, 12, inp_format
    )
    abs_pl, rel_pl = pallas_decode_all(
        stacked, xy, dxdy, soc, h0, 12, inp_format
    )
    np.testing.assert_allclose(
        np.asarray(abs_pl), np.asarray(abs_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(rel_pl), np.asarray(rel_ref), atol=2e-5
    )


def test_pallas_custom_vjp_matches_scan_grad():
    """The custom VJP (backward = recompute through the XLA scan) gives the
    same gradients as differentiating the scan directly."""
    key = jax.random.PRNGKey(2)
    G, N, EMB, H, F = 2, 40, 8, 16, 4
    stacked = common.stacked_decoders_init(key, G, EMB, H, "rel", F)
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    xy = jax.random.normal(ks[0], (N, 2))
    dxdy = jax.random.normal(ks[1], (N, 2))
    soc = jax.random.normal(ks[2], (N, F))
    h0 = jax.random.normal(ks[3], (N, H))

    def loss_scan(p, h):
        a, r = common.stacked_decoders_apply(p, xy, dxdy, soc, h, 12, "rel")
        return (a ** 2).sum() + (r * 0.3).sum()

    def loss_pl(p, h):
        a, r = pallas_decode_all(p, xy, dxdy, soc, h, 12, "rel")
        return (a ** 2).sum() + (r * 0.3).sum()

    g1 = jax.grad(loss_pl, argnums=(0, 1))(stacked, h0)
    g2 = jax.grad(loss_scan, argnums=(0, 1))(stacked, h0)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
