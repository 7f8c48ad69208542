"""Golden-output regression fixtures (SURVEY.md §4 item 4, VERDICT r2
item 1a): fixed-seed batches with stored outputs so refactors cannot
silently drift the numerics. Covers one full train step per supported
gan_type (train.py:21 asserts mgan/gan/infogan) and the eval metric stack
(ADE/FDE/Mode joint scene-min + manifold precision/recall).

Fixtures live in tests/golden/ and are created on first run (the test then
skips); delete a file to re-pin after an INTENTIONAL numeric change, and
say why in the commit message.
"""

import json
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mggan_tpu.config import Config
from mggan_tpu.models import factory
from mggan_tpu.training.state import init_train_state
from mggan_tpu.training.steps import build_train_step

GOLDEN_DIR = Path(__file__).parent / "golden"


def _check_or_create(name, got, atol=1e-4):
    path = GOLDEN_DIR / name
    if not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        path.write_text(json.dumps(got, indent=1, sort_keys=True))
        pytest.skip(f"golden fixture {name} created")
    want = json.loads(path.read_text())
    assert set(got) == set(want), (
        f"{name}: metric keys changed: {sorted(set(got) ^ set(want))}"
    )
    for k in sorted(want):
        g, w = np.asarray(got[k]), np.asarray(want[k])
        both_nan = np.isnan(g).all() and np.isnan(w).all()
        if not both_nan:
            np.testing.assert_allclose(
                g, w, atol=atol, rtol=1e-4, err_msg=f"{name}: {k}"
            )


def _fixed_batch(s=4, p=3, seed=11):
    rng = np.random.RandomState(seed)
    xy = rng.randn(s, p, 20, 2).astype(np.float32).cumsum(axis=2)
    mask = np.ones((s, p), bool)
    mask[0, -1] = False  # one padded slot
    xy[~mask] = 0.0
    patches = rng.uniform(-1, 1, (s, p, 33, 33, 4)).astype(np.float32)
    return {
        "xy": jnp.asarray(xy),
        "ped_mask": jnp.asarray(mask),
        "patches": jnp.asarray(patches),
    }


@pytest.mark.parametrize(
    "gan_type,wt,gan_obj",
    [
        ("mgan", "ml", "NS"),
        ("gan", "l2", "NS"),
        ("infogan", "none", "NS"),
        # the two numerically-hairiest paths (VERDICT r4 next #8): W's
        # gradient penalty differentiates THROUGH d(D)/d(input) (grads of
        # grads across the scan decoder, reference utils.py:42-67), and
        # probgan injects SGHMC noise-loss terms into D and G plus the
        # Polyak discs_hist update (reference discriminators.py:246-263)
        ("mgan", "ml", "W"),
        ("probgan", "ml", "NS"),
    ],
)
def test_golden_train_step(gan_type, wt, gan_obj):
    cfg = Config(
        dataset="synthetic_memory", batch_size=4, num_gens=2, epochs=2,
        num_samples=3, num_expectation_samples=2, h_dim=16, decoder_h_dim=16,
        noise_dim=8, gan_type=gan_type, weighting_target=wt, gan_obj=gan_obj,
    )
    key = jax.random.PRNGKey(0)
    g_pack, d_pack = factory.construct_model(cfg, key)
    state = init_train_state(cfg, g_pack, d_pack, jax.random.PRNGKey(1))
    step = build_train_step(cfg, g_pack[2], d_pack[2])
    state, metrics = step(state, _fixed_batch())
    got = {k: float(v) for k, v in metrics.items()}
    # one parameter-summary scalar per net pins the update itself
    got["gsum/g_params"] = float(
        sum(jnp.abs(x).sum() for x in jax.tree.leaves(state.g_params))
    )
    got["gsum/d_params"] = float(
        sum(jnp.abs(x).sum() for x in jax.tree.leaves(state.d_params))
    )
    tag = f"{gan_type}_{wt}" + ("" if gan_obj == "NS" else f"_{gan_obj}")
    _check_or_create(f"train_step_{tag}_v1.json", got)


def test_golden_eval_metrics():
    from mggan_tpu.eval.evaluate import evaluate_ade_fde
    from mggan_tpu.eval.manifold import evaluate_precision_recall
    from mggan_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(num_windows=8, max_peds=4, seed=2)
    n = sum(len(t) for t in ds.trajectories)
    rng = np.random.RandomState(5)
    # preds in the reference eval layout (T, K, N, 2), anchored near GT
    gt = np.concatenate(ds.trajectories)[:, 8:]  # (N, 12, 2)
    preds = gt.transpose(1, 0, 2)[:, None] + 0.3 * rng.randn(12, 5, n, 2)
    preds = preds.astype(np.float32)

    got = {}
    for k, v in evaluate_ade_fde(ds, preds, [1, 5]).items():
        got[k] = float(v)
    for k, v in evaluate_precision_recall(ds, preds, 3.0, [5]).items():
        got[k] = float(v)
    _check_or_create("eval_metrics_v1.json", got, atol=1e-5)
