"""Pallas fused decoder == XLA scan decoder, forward AND gradients
(interpret mode on CPU)."""

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


def make_inputs(inp_format, G=3, N=70, EMB=16, H=32, F=8, seed=0):
    key = jax.random.PRNGKey(seed)
    stacked = common.stacked_decoders_init(key, G, EMB, H, inp_format, F)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 4)
    xy = jax.random.normal(ks[0], (N, 2))
    dxdy = jax.random.normal(ks[1], (N, 2))
    soc = jax.random.normal(ks[2], (N, F))
    h0 = jax.random.normal(ks[3], (N, H))
    return stacked, xy, dxdy, soc, h0


@pytest.mark.parametrize("inp_format", ["rel", "abs", "abs_rel"])
def test_pallas_matches_scan(inp_format):
    stacked, xy, dxdy, soc, h0 = make_inputs(inp_format)
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


@pytest.mark.parametrize("inp_format", ["rel", "abs", "abs_rel"])
def test_pallas_bwd_kernel_matches_scan_grad(inp_format):
    """The fused reverse-sweep kernel's gradients — w.r.t. the stacked
    params AND every input — equal autodiff through the XLA scan."""
    stacked, xy, dxdy, soc, h0 = make_inputs(inp_format, G=2, N=40, EMB=8,
                                             H=16, F=4, seed=2)

    def loss(fn):
        def inner(p, x, d, s, h):
            a, r = fn(p, x, d, s, h, 12, inp_format)
            # asymmetric weights so abs/rel cotangents differ per element
            wa = jnp.linspace(0.5, 1.5, a.size).reshape(a.shape)
            wr = jnp.linspace(-1.0, 1.0, r.size).reshape(r.shape)
            return (a * wa).sum() + (r * wr).sum()
        return inner

    g_pl = jax.grad(loss(pallas_decode_all), argnums=(0, 1, 2, 3, 4))(
        stacked, xy, dxdy, soc, h0
    )
    g_sc = jax.grad(
        loss(lambda *a: common.stacked_decoders_apply(*a)),
        argnums=(0, 1, 2, 3, 4),
    )(stacked, xy, dxdy, soc, h0)
    flat_pl, tree_pl = jax.tree.flatten(g_pl)
    flat_sc, tree_sc = jax.tree.flatten(g_sc)
    assert tree_pl == tree_sc
    for a, b in zip(flat_pl, flat_sc):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_pallas_value_and_grad_jit():
    """value_and_grad through the custom VJP under jit (training usage)."""
    stacked, xy, dxdy, soc, h0 = make_inputs("rel", G=2, N=30, EMB=8, H=16,
                                             F=4, seed=5)

    @jax.jit
    def f(p):
        a, r = pallas_decode_all(p, xy, dxdy, soc, h0, 12, "rel")
        return (a ** 2).sum() + (r * 0.3).sum()

    v, g = jax.value_and_grad(f)(stacked)

    def f_scan(p):
        a, r = common.stacked_decoders_apply(p, xy, dxdy, soc, h0, 12, "rel")
        return (a ** 2).sum() + (r * 0.3).sum()

    v2, g2 = jax.value_and_grad(f_scan)(stacked)
    np.testing.assert_allclose(float(v), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
