"""Unit tests for pure ops against closed-form/looped references
(SURVEY.md §4 level 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from mggan_tpu.ops import losses as L
from mggan_tpu.ops import sampling, social
from mggan_tpu.ops.lstm import lstm_init, lstm_scan
from mggan_tpu.utils.pytree import relative_to_abs


def test_selection_indices():
    # utils.py:234-248 example: [1,2,3,1] -> [0,0,0,1]
    idx = jnp.array([[1, 2, 3, 1], [0, 0, 0, 2]])
    out = np.asarray(sampling.selection_indices(idx))
    np.testing.assert_array_equal(out, [[0, 0, 0, 1], [0, 1, 2, 0]])


def test_relative_to_abs():
    rel = jnp.array([[[1.0, 0.0], [1.0, 1.0], [0.0, 2.0]]])  # (1,3,2)
    start = jnp.array([[5.0, 5.0]])
    out = np.asarray(relative_to_abs(rel, start))
    np.testing.assert_allclose(out, [[[6, 5], [7, 6], [7, 8]]])


def test_global_noise_shared_per_scene():
    z = sampling.global_noise(jax.random.PRNGKey(0), 3, 4, 6, 8)
    assert z.shape == (3, 4, 6, 8)
    np.testing.assert_allclose(np.asarray(z[:, :, 0]), np.asarray(z[:, :, 3]))
    # different scenes differ
    assert np.abs(np.asarray(z[:, 0]) - np.asarray(z[:, 1])).max() > 1e-3


def test_min_scene_l2_matches_loop():
    rng = np.random.RandomState(0)
    K, S, P, T = 4, 3, 5, 12
    pred = rng.randn(K, S, P, T, 2).astype(np.float32)
    gt = rng.randn(S, P, T, 2).astype(np.float32)
    loss_mask = rng.rand(S, P) > 0.3
    ped_mask = loss_mask | (rng.rand(S, P) > 0.5)

    got = float(
        L.min_scene_l2(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(loss_mask),
            jnp.asarray(ped_mask), "min_g_z",
        )
    )
    # looped reference semantics (train.py:57-75)
    total = 0.0
    for s in range(S):
        per_sample = []
        for k in range(K):
            acc = 0.0
            for p in range(P):
                if loss_mask[s, p]:
                    acc += np.linalg.norm(pred[k, s, p] - gt[s, p], axis=-1).sum()
            per_sample.append(acc)
        total += min(per_sample)
    expected = total / ped_mask.sum()
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_count_reweighted_mean_matches_loop():
    rng = np.random.RandomState(1)
    loss = rng.rand(2, 4, 6).astype(np.float32)  # (K,S,P)
    gen = rng.randint(0, 3, (2, 4, 6))
    valid = rng.rand(4, 6) > 0.4

    got = float(
        L.count_reweighted_mean(
            jnp.asarray(loss), jnp.asarray(gen), 3, jnp.asarray(valid)[None]
        )
    )
    # reference: per-element division by global count (train.py:92-97)
    counts = np.zeros(3)
    for g in range(3):
        counts[g] = ((gen == g) & valid[None]).sum()
    acc, n = 0.0, 0
    for idx in np.ndindex(*loss.shape):
        if valid[idx[1], idx[2]]:
            acc += loss[idx] / max(counts[gen[idx]], 1)
            n += 1
    np.testing.assert_allclose(got, acc / n, rtol=1e-5)


def test_social_features_match_loop():
    """Dense masked features == per-pair formulas (social.py:51-104)."""
    rng = np.random.RandomState(2)
    S, P = 2, 4
    xy = rng.randn(S, P, 2).astype(np.float32)
    v = rng.randn(S, P, 2).astype(np.float32)
    mask = np.ones((S, P), bool)

    feats = np.asarray(
        social.social_features(jnp.asarray(xy), jnp.asarray(v), jnp.asarray(mask))
    )
    for s in range(S):
        for i in range(P):
            for j in range(P):
                dp = xy[s, i] - xy[s, j]
                dv = v[s, i] - v[s, j]
                l2 = np.linalg.norm(dp)
                bearing = dp.dot(v[s, i]) / (
                    np.linalg.norm(dp) * np.linalg.norm(v[s, i]) + 1e-6
                )
                ttca = -dp.dot(dv) / (dv.dot(dv) + 1e-6)
                dca = np.linalg.norm(dp + ttca * dv)
                np.testing.assert_allclose(
                    feats[s, i, j], [l2, bearing, dca], rtol=2e-4, atol=2e-5
                )


def test_attention_pool_single_ped_zero():
    """Single-ped scenes get zero social context (social.py:19-20)."""
    key = jax.random.PRNGKey(0)
    from mggan_tpu.ops.linear import linear_init

    w = linear_init(key, 8, 4)
    femb = jax.random.normal(key, (2, 3, 3, 4))
    h = jax.random.normal(key, (2, 3, 8))
    mask = jnp.array([[True, False, False], [True, True, True]])
    out = np.asarray(social.attention_pool(w, femb, h, mask))
    np.testing.assert_allclose(out[0], 0.0)
    assert np.abs(out[1]).max() > 0


def test_lstm_matches_torch():
    """Gate order / layout parity with torch nn.LSTM."""
    import torch

    torch.manual_seed(0)
    t, n, i, h = 5, 3, 4, 6
    lstm_t = torch.nn.LSTM(i, h, 1)
    x = torch.randn(t, n, i)
    with torch.no_grad():
        _, (h_t, c_t) = lstm_t(x)

    params = {
        "w_ih": jnp.asarray(lstm_t.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(lstm_t.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(lstm_t.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(lstm_t.bias_hh_l0.detach().numpy()),
    }
    _, (hj, cj) = lstm_scan(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(hj), h_t[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cj), c_t[0].numpy(), atol=1e-5)


def test_gather_samples():
    K, G, S, P = 2, 3, 1, 2
    dec = jnp.arange(K * G * S * P, dtype=jnp.float32).reshape(K, G, S, P, 1, 1)
    gen = jnp.array([[[0, 2], [1, 0]]]).transpose(0, 2, 1)  # (S,P,K)
    out = np.asarray(sampling.gather_samples(dec, gen))
    for kk in range(K):
        for pp in range(P):
            g = int(gen[0, pp, kk])
            np.testing.assert_allclose(out[kk, 0, pp], np.asarray(dec[kk, g, 0, pp]))


def test_masked_bn_matches_valid_rows_only():
    """BN batch statistics must come from real peds only: running the scene
    CNN on a padded batch with ``mask`` equals running it on just the valid
    rows (the reference's dense N-ped batch, cnn.py:101-116 + torch BN)."""
    import jax
    import numpy as np
    from mggan_tpu.ops.cnn import scene_cnn_init, scene_cnn_apply

    key = jax.random.PRNGKey(0)
    params, state = scene_cnn_init(key, channels_cnn=16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (10, 33, 33, 4),
                           minval=-1.0, maxval=1.0)
    mask = np.zeros(10, bool)
    mask[[0, 2, 3, 7]] = True

    out_valid, st_valid = scene_cnn_apply(
        params, state, x[np.flatnonzero(mask)], train=True
    )
    out_masked, st_masked = scene_cnn_apply(
        params, state, x, train=True, mask=jax.numpy.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(out_masked)[np.flatnonzero(mask)], np.asarray(out_valid),
        rtol=1e-5, atol=1e-6,
    )
    for k in ("bn1", "bn2"):
        for stat in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(st_masked[k][stat]), np.asarray(st_valid[k][stat]),
                rtol=1e-5, atol=1e-7, err_msg=f"{k}/{stat}",
            )


def test_scene_cnn_folded_bf16_eval_path():
    """The compute_dtype eval path folds eval-mode BN into the conv
    weights: with compute_dtype=f32 it must match the standard eval path to
    float tolerance, and with bf16 it must stay within bf16 tolerance
    (the decoder's bf16 A/B discipline, ops/cnn.py::scene_cnn_apply)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mggan_tpu.ops.cnn import scene_cnn_init, scene_cnn_apply

    key = jax.random.PRNGKey(0)
    params, state = scene_cnn_init(key, channels_cnn=16)
    # non-trivial BN state so the folding actually matters
    state = {
        bn: {
            "mean": jax.random.normal(jax.random.PRNGKey(7), (16,)) * 0.3,
            "var": jax.random.uniform(jax.random.PRNGKey(8), (16,),
                                      minval=0.5, maxval=2.0),
        }
        for bn in ("bn1", "bn2")
    }
    x = jax.random.uniform(jax.random.PRNGKey(1), (10, 33, 33, 4),
                           minval=-1.0, maxval=1.0)

    ref, _ = scene_cnn_apply(params, state, x, train=False)
    folded_f32, _ = scene_cnn_apply(params, state, x, train=False,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(folded_f32), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    folded_bf16, st = scene_cnn_apply(params, state, x, train=False,
                                      compute_dtype=jnp.bfloat16)
    assert folded_bf16.dtype == jnp.float32  # attention head restores f32
    assert st is state  # eval: state untouched
    err = np.abs(np.asarray(folded_bf16) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() <= 0.05 * max(scale, 1e-3), (err.max(), scale)

    # train-mode ignores compute_dtype (batch stats + grads stay f32)
    tr_ref, _ = scene_cnn_apply(params, state, x, train=True)
    tr_cd, _ = scene_cnn_apply(params, state, x, train=True,
                               compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(tr_cd), np.asarray(tr_ref))
