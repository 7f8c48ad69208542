"""Pallas fused decoder == XLA scan decoder (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mggan_tpu.models import common
from mggan_tpu.ops.pallas.decoder import pallas_decode_all


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
        stacked, xy, dxdy, soc, h0, 12, inp_format, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(abs_pl), np.asarray(abs_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(rel_pl), np.asarray(rel_ref), atol=2e-5
    )
