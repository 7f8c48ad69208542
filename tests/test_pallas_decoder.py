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


@pytest.mark.parametrize("inp_format", ["rel", "abs", "abs_rel"])
@pytest.mark.parametrize("ilp", [False, True])
def test_pallas_select_matches_gather(inp_format, ilp):
    """Fused-selection kernel == decode-all + per-row one-hot gather.
    ilp=True covers the half-tile-interleaved ablation variant
    (bit-identical ops; measured only ~1.05x on chip — see decoder.py
    ``_fwd_select_kernel_ilp`` docstring), kept gated off by default."""
    from mggan_tpu.ops.pallas.decoder import pallas_decode_select

    G, N = 3, 70
    stacked, xy, dxdy, soc, h0 = make_inputs(inp_format, G=G, N=N)
    idx = jax.random.randint(jax.random.PRNGKey(9), (N,), 0, G)
    onehot = jax.nn.one_hot(idx, G)

    abs_all, rel_all = common.stacked_decoders_apply(
        stacked, xy, dxdy, soc, h0, 12, inp_format
    )  # (G, N, T, 2)
    want_abs = np.asarray(abs_all)[np.asarray(idx), np.arange(N)]
    want_rel = np.asarray(rel_all)[np.asarray(idx), np.arange(N)]

    got_abs, got_rel = pallas_decode_select(
        stacked, xy, dxdy, soc, h0, onehot, 12, inp_format, ilp=ilp
    )
    np.testing.assert_allclose(np.asarray(got_abs), want_abs, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_rel), want_rel, atol=2e-5)


@pytest.mark.parametrize("inp_format", ["rel", "abs", "abs_rel"])
def test_pallas_select_sorted_matches_gather(inp_format):
    """Sorted-by-generator selection kernel == decode-all + gather, incl.
    the group-padding permutation for N not a tile multiple."""
    from mggan_tpu.ops.pallas.decoder import pallas_decode_select_sorted

    G, N = 3, 70
    stacked, xy, dxdy, soc, h0 = make_inputs(inp_format, G=G, N=N)
    idx = jax.random.randint(jax.random.PRNGKey(9), (N,), 0, G)

    abs_all, rel_all = common.stacked_decoders_apply(
        stacked, xy, dxdy, soc, h0, 12, inp_format
    )  # (G, N, T, 2)
    want_abs = np.asarray(abs_all)[np.asarray(idx), np.arange(N)]
    want_rel = np.asarray(rel_all)[np.asarray(idx), np.arange(N)]

    got_abs, got_rel = jax.jit(
        lambda *a: pallas_decode_select_sorted(*a, 12, inp_format)
    )(stacked, xy, dxdy, soc, h0, idx)
    np.testing.assert_allclose(np.asarray(got_abs), want_abs, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_rel), want_rel, atol=2e-5)


def test_pallas_select_sorted_no_social():
    """F=0 path: the social operand is dropped and socb degenerates to b1."""
    from mggan_tpu.ops.pallas.decoder import pallas_decode_select_sorted

    G, N = 2, 50
    stacked, xy, dxdy, _, h0 = make_inputs("rel", G=G, N=N, F=0)
    soc = jnp.zeros((N, 0))
    idx = jax.random.randint(jax.random.PRNGKey(3), (N,), 0, G)
    abs_all, _ = common.stacked_decoders_apply(
        stacked, xy, dxdy, soc, h0, 12, "rel"
    )
    want = np.asarray(abs_all)[np.asarray(idx), np.arange(N)]
    got, _ = pallas_decode_select_sorted(
        stacked, xy, dxdy, soc, h0, idx, 12, "rel"
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_pallas_select_sorted_skewed_distribution():
    """All rows on one generator (max group padding) still exact."""
    from mggan_tpu.ops.pallas.decoder import pallas_decode_select_sorted

    G, N = 4, 33
    stacked, xy, dxdy, soc, h0 = make_inputs("rel", G=G, N=N, seed=11)
    idx = jnp.full((N,), 2, jnp.int32)
    abs_all, _ = common.stacked_decoders_apply(
        stacked, xy, dxdy, soc, h0, 12, "rel"
    )
    want = np.asarray(abs_all)[2]
    got, _ = pallas_decode_select_sorted(
        stacked, xy, dxdy, soc, h0, idx, 12, "rel"
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_decode_select_fallback_equals_gather():
    """models/generator.decode_select off-TPU == decode_all + gather_samples
    (the CPU/grad fallback the train G-step uses)."""
    from mggan_tpu.models import generator as G_mod
    from mggan_tpu.ops import sampling

    spec = G_mod.GeneratorSpec(
        z_size=4, encoder_h_dim=8, decoder_h_dim=8, social_feat_size=8,
        num_gens=3, pred_len=12, embedding_dim=4, inp_format="rel",
        pool_type="sways", scene_dim=0, use_pinet=True, learn_prior=False,
    )
    params, _ = G_mod.init(jax.random.PRNGKey(0), spec)
    k, s, p = 4, 2, 3
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    enc_h = jax.random.normal(ks[0], (s, p, spec.enc_total))
    soc = jax.random.normal(ks[1], (s, p, 8))
    xy = jax.random.normal(ks[2], (s, p, 2))
    dxdy = jax.random.normal(ks[3], (s, p, 2))
    noise = jax.random.normal(ks[4], (k, s, p, 4))
    gen_idxs = jax.random.randint(jax.random.PRNGKey(2), (s, p, k), 0, 3)

    out_all = G_mod.decode_all(params, spec, xy, dxdy, enc_h, soc, noise)
    want = sampling.gather_samples(out_all.abs, gen_idxs)
    got = G_mod.decode_select(
        params, spec, xy, dxdy, enc_h, soc, noise, gen_idxs
    )
    np.testing.assert_allclose(np.asarray(got.abs), np.asarray(want),
                               atol=1e-6)


def test_bf16_compute_dtype_close_to_f32():
    """bf16 fast-path accuracy envelope (documented in BASELINE.md): the
    recurrent matmuls in bf16 with f32 accumulation stay within a few
    centimeters of the f32 rollout at flagship magnitudes."""
    stacked, xy, dxdy, soc, h0 = make_inputs("rel", G=4, N=128, EMB=16, H=32,
                                             F=8, seed=7)
    a32, r32 = common.stacked_decoders_apply(stacked, xy, dxdy, soc, h0, 12,
                                             "rel")
    a16, r16 = common.stacked_decoders_apply(stacked, xy, dxdy, soc, h0, 12,
                                             "rel", jnp.bfloat16)
    err = np.abs(np.asarray(a16) - np.asarray(a32))
    scale = np.abs(np.asarray(a32)).mean()
    assert err.max() < 0.15 * max(scale, 1.0), (err.max(), scale)
    assert err.mean() < 0.02 * max(scale, 1.0)
    # integration (cumsum) is f32: rel errors bound abs errors
    assert np.abs(np.asarray(r16) - np.asarray(r32)).max() < 0.1
