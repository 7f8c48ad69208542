"""Eval-layer tests: selection orders, occurrence gather, strategies,
dataset-level pipeline, manifold P/R."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mggan_tpu.config import Config
from mggan_tpu.data.loaders import get_dataloader, get_dataset
from mggan_tpu.eval import evaluate as ev
from mggan_tpu.eval import manifold as man
from mggan_tpu.eval.predict import (
    Predictor,
    STRATEGIES,
    expected_selection,
    gather_by_occurrence,
    uniform_selection,
)
from mggan_tpu.models import factory
from mggan_tpu.training.loop import Trainer
from mggan_tpu.utils.logging import ExperimentWriter


def test_expected_selection():
    # round(p*num): [0.5,0.5]*4 -> [2,2]; emission round-robin desc-alloc
    sel = expected_selection(np.array([[0.5, 0.5]]), 4)
    assert sorted(sel[0].tolist()) == [0, 0, 1, 1]
    assert sel[0].tolist()[:2] in ([0, 1], [1, 0])
    # heavy skew: all slots to gen 0
    sel = expected_selection(np.array([[0.9, 0.1]]), 4)
    assert sel[0].tolist() == [0, 0, 0, 0]
    # rounding residue distributed: [0.34,0.33,0.33]*3 -> [1,1,1]
    sel = expected_selection(np.array([[0.34, 0.33, 0.33]]), 3)
    assert sorted(sel[0].tolist()) == [0, 1, 2]
    # always exactly num slots
    rng = np.random.RandomState(0)
    p = rng.dirichlet(np.ones(4), size=16)
    sel = expected_selection(p, 20)
    assert sel.shape == (16, 20)


def test_uniform_selection():
    probs = np.array([[0.5, 0.3, 0.2]])
    sel = uniform_selection(probs, 6, eps=0.25)  # gens 0,1 over threshold
    assert sel[0].tolist() == [0, 1, 0, 1, 0, 1]
    # none over threshold -> all gens
    sel = uniform_selection(np.array([[0.3, 0.3, 0.4]]), 6, eps=0.9)
    assert sel[0].tolist() == [2, 0, 1, 2, 0, 1]


def test_gather_by_occurrence():
    K, G = 3, 2
    dec = jnp.arange(K * G, dtype=jnp.float32).reshape(K, G, 1, 1, 1, 1)
    dec = jnp.broadcast_to(dec, (K, G, 1, 1, 1, 2))
    # flat index = occ * G + gen over sample-major (K,G)
    gen = jnp.array([[[0, 0, 1]]])  # (S,P,num=3): gen 0 twice then gen 1
    out = np.asarray(gather_by_occurrence(dec, gen))[:, 0, 0, 0, 0]
    # occurrences: [0,1,0] -> decoded[0,g0]=0, decoded[1,g0]=2, decoded[0,g1]=1
    np.testing.assert_allclose(out, [0.0, 2.0, 1.0])


@pytest.fixture(scope="module")
def small_model():
    cfg = Config(
        dataset="synthetic_memory", num_gens=2, num_samples=4, h_dim=16,
        decoder_h_dim=16, gan_type="mgan", weighting_target="ml",
    )
    g_pack, _ = factory.construct_model(cfg, jax.random.PRNGKey(0))
    pred = Predictor(cfg, g_pack[2], g_pack[0], g_pack[1])
    loader = get_dataloader(cfg.dataset, "val", batch_size=4)
    return cfg, pred, loader


@pytest.mark.parametrize(
    "strategy", [s for s in STRATEGIES if s != "rejection"]
)
def test_all_strategies_shapes(small_model, strategy):
    cfg, pred, loader = small_model
    batch = loader.make_batch(np.arange(4))
    from mggan_tpu.data.augment import augment_batch

    mb = augment_batch(jax.random.PRNGKey(0),
                       {k: v for k, v in batch.items()
                        if k not in ("scale", "window_idx")}, train=False)
    mb = {"xy": mb["xy"], "ped_mask": mb["ped_mask"], "patches": mb["patches"]}
    fn = pred.get_predict_func(strategy)
    out_abs, out_rel, probs, gen_idxs = fn(mb, jax.random.PRNGKey(1), num=5)
    s, p = batch["ped_mask"].shape
    assert out_abs.shape == (5, s, p, 12, 2)
    assert probs.shape == (s, p, 2)
    assert np.isfinite(np.asarray(out_abs)).all()


def test_predict_multi_matches_strategy_methods(small_model):
    """predict_multi shares decode passes within rng families but must be
    bitwise equal to the standalone per-strategy methods."""
    cfg, pred, loader = small_model
    batch = loader.make_batch(np.arange(4))
    from mggan_tpu.data.augment import augment_batch

    mb = augment_batch(jax.random.PRNGKey(0),
                       {k: v for k, v in batch.items()
                        if k not in ("scale", "window_idx")}, train=False)
    mb = {"xy": mb["xy"], "ped_mask": mb["ped_mask"], "patches": mb["patches"]}
    rng = jax.random.PRNGKey(3)
    strategies = tuple(s for s in STRATEGIES if s != "rejection")
    multi = pred.predict_multi(mb, rng, strategies, num=5)
    for s in strategies:
        ref = pred.get_predict_func(s)(mb, rng, num=5)
        for a, b in zip(multi[s], ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rejection_strategy():
    cfg = Config(dataset="synthetic_memory", num_gens=1, num_samples=4,
                 h_dim=16, decoder_h_dim=16, gan_type="gan",
                 weighting_target="none")
    g_pack, _ = factory.construct_model(cfg, jax.random.PRNGKey(0))
    pred = Predictor(cfg, g_pack[2], g_pack[0], g_pack[1])
    loader = get_dataloader(cfg.dataset, "val", batch_size=2)
    batch = loader.make_batch(np.arange(2))
    from mggan_tpu.data.augment import augment_batch

    mb = augment_batch(jax.random.PRNGKey(0),
                       {k: v for k, v in batch.items()
                        if k not in ("scale", "window_idx")}, train=False)
    mb = {"xy": mb["xy"], "ped_mask": mb["ped_mask"], "patches": mb["patches"]}
    out_abs, _, _, _ = pred.predict_rejection(mb, jax.random.PRNGKey(1), num=4)
    assert out_abs.shape[0] == 4
    assert np.isfinite(np.asarray(out_abs)).all()


def test_dataset_level_eval_pipeline(tmp_path):
    cfg = Config(
        dataset="synthetic_memory", num_gens=2, num_samples=4, h_dim=16,
        decoder_h_dim=16, top_k_test=3, epochs=1, batch_size=4,
        log_dir=str(tmp_path),
    )
    writer = ExperimentWriter(tmp_path, cfg.experiment, cfg.name, version=7,
                              config=cfg, tensorboard=False)
    tr = Trainer(cfg, writer)
    loader = get_dataloader(cfg.dataset, "test", batch_size=4, shuffle=False)
    preds = ev.get_predictions(tr.predictor(), loader, num_preds=3)
    ds = get_dataset(cfg.dataset, "test")
    n_agents = sum(len(t) for t in ds.trajectories)
    assert preds.shape == (12, 3, n_agents, 2)

    metrics = ev.evaluate_ade_fde(ds, preds, [1, 3])
    assert set(metrics) == {
        "ADE k=1", "FDE k=1", "Mode k=1", "ADE k=3", "FDE k=3", "Mode k=3"
    }
    assert metrics["ADE k=3"] <= metrics["ADE k=1"] + 1e-9

    # device-path metrics should agree with the host reference accumulation
    dev = tr.check_accuracy(loader, num_k=3)
    # (different RNG draws -> compare only within a loose band)
    assert abs(dev["ADE k=3"] - metrics["ADE k=3"]) / metrics["ADE k=3"] < 0.5

    pr = man.evaluate_precision_recall(ds, preds, 3.0, [1, 3])
    assert 0 <= pr["Precision"] <= 1
    assert 0 <= pr["Recall k=3"] <= 1


def test_manifold_membership():
    gt = np.zeros((1, 12, 2))
    m = man.Manifold(gt, radius=3.0)
    inside = np.zeros((1, 12, 2)) + 0.01
    outside = np.zeros((1, 12, 2))
    outside[0, 0] = 10.0  # violates the t=0 radius (= 3/12)
    assert m.compute_inside(inside)[0]
    assert not m.compute_inside(outside)[0]
    # radius ramps linearly: offset that fits late but not early
    mid = np.zeros((1, 12, 2))
    mid[:, :, 0] = 1.0  # 1 m off at every step; radius(t) = 0.25..3.0
    assert not m.compute_inside(mid)[0]


def test_oracle_and_same_obs(tmp_path):
    ds = get_dataset("synthetic_memory", "test")
    groups = man.get_same_obs_indices(ds)
    assert sum(len(g) for g in groups) == len(ds.trajectories)
    oracle = man.get_oracle_preds(ds, 4)
    n_agents = sum(len(t) for t in ds.trajectories)
    assert oracle.shape == (12, 4, n_agents, 2)


def _expected_ref(probs, num):
    """Loop oracle mirroring the reference algorithm (train.py:309-337)."""
    b, g = probs.shape
    expected = np.round(probs * num).astype(np.int64)
    sort_idxs = np.argsort(-expected, axis=-1, kind="stable")
    missing = num - expected.sum(1)
    for row in range(b):
        m = missing[row]
        if m != 0:
            seq = np.tile(sort_idxs[row], abs(m))[: abs(m)]
            uniq, counts = np.unique(seq, return_counts=True)
            expected[row, uniq] += np.sign(m) * counts
    out = np.zeros((b, num), np.int32)
    for row in range(b):
        remaining = expected[row].copy()
        emitted = []
        while len(emitted) < num:
            progress = False
            for idx in sort_idxs[row]:
                if remaining[idx] > 0:
                    emitted.append(idx)
                    remaining[idx] -= 1
                    progress = True
                    if len(emitted) == num:
                        break
            if not progress:
                break
        out[row] = (emitted + [0] * num)[:num]
    return out


def test_expected_selection_fuzz():
    rng = np.random.RandomState(0)
    for _ in range(60):
        g = rng.randint(2, 9)
        num = rng.randint(1, 25)
        probs = rng.dirichlet(np.ones(g) * rng.uniform(0.2, 3), size=rng.randint(1, 7))
        np.testing.assert_array_equal(
            expected_selection(probs, num), _expected_ref(probs, num)
        )


def test_uniform_selection_fuzz():
    rng = np.random.RandomState(1)
    for _ in range(60):
        g = rng.randint(2, 9)
        num = rng.randint(1, 25)
        eps = float(rng.choice([0.0, 1.0 / g, 1.0 / g**2, 0.9]))
        probs = rng.dirichlet(np.ones(g), size=rng.randint(1, 7))
        got = uniform_selection(probs, num, eps)
        for row in range(len(probs)):
            sel = np.where(probs[row] > eps)[0]
            if len(sel) == 0:
                sel = np.arange(g)
            order = sel[np.argsort(-probs[row, sel], kind="stable")]
            np.testing.assert_array_equal(got[row], np.tile(order, num)[:num])


def test_on_device_selection_matches_numpy():
    from mggan_tpu.eval.predict import (
        expected_selection_jax,
        uniform_selection_jax,
    )

    rng = np.random.RandomState(3)
    for _ in range(8):
        g, num = rng.randint(2, 7), rng.randint(2, 15)
        probs = rng.dirichlet(np.ones(g), size=5).astype(np.float32)
        np.testing.assert_array_equal(
            expected_selection(probs, num),
            np.asarray(expected_selection_jax(jnp.asarray(probs), num)),
        )
        eps = float(rng.choice([0.0, 1.0 / g]))
        np.testing.assert_array_equal(
            uniform_selection(probs, num, eps),
            np.asarray(uniform_selection_jax(jnp.asarray(probs), num, eps)),
        )
