"""Dataset-level evaluation pipeline (reference evaluation.py:14-78 +
train.py:215-243 ``get_predictions``).

Predictions cross the host boundary once per batch in the reference layout
``(pred_len, k, n_agents, 2)`` so the metric code matches the reference's
accumulation exactly (including the per-scene pixel rescaling and the
NaN-agent removal with seq_start_end reindexing).
"""

from __future__ import annotations

from collections import defaultdict

import jax
import numpy as np

from mggan_tpu.config import PRED_LEN
from mggan_tpu.eval.metrics import MODE_THRESH


def adjust_seq_start_end_for_mask(seq_start_end, remove_mask):
    """Reindex scene boundaries after dropping masked agents
    (evaluation.py:14-27)."""
    offsets = np.concatenate([[0], np.cumsum(remove_mask)])
    return [
        (int(s - offsets[s]), int(e - offsets[e])) for s, e in seq_start_end
    ]


def get_predictions_multi(predictor, loader, num_preds=20,
                          strategies=("sampling",), seed=0):
    """Run several strategies over a sequential loader in one pass.

    Returns {strategy: (pred_len, k, N, 2) numpy}. Each entry is bitwise
    equal to a standalone :func:`get_predictions` call with the same seed
    (Predictor.predict_multi shares decode passes only within
    rng-identical strategy families), but the loader/augment host work and
    rng-shared device decodes run once instead of once per strategy.

    The loader must be sequential/unshuffled so rows line up with the
    dataset's ``seq_start_end`` (reference asserts a SequentialSampler,
    train.py:216).
    """
    assert not loader.shuffle, "get_predictions requires a sequential loader"
    rng = jax.random.PRNGKey(seed)
    out = {s: [] for s in strategies}
    from mggan_tpu.data.augment import augment_batch

    for i, batch in enumerate(loader):
        model_batch = augment_batch(
            jax.random.PRNGKey(0),
            {k: v for k, v in batch.items() if k not in ("scale", "window_idx")},
            train=False,
        )
        model_batch = {
            "xy": model_batch["xy"],
            "ped_mask": model_batch["ped_mask"],
            "patches": model_batch.get("patches"),
        }
        results = predictor.predict_multi(
            model_batch, jax.random.fold_in(rng, i), strategies, num=num_preds
        )
        valid_rows = np.asarray(model_batch["ped_mask"])
        for s in strategies:
            abs_np = np.asarray(jax.device_get(results[s][0]))  # (K,S,P,T,2)
            # flatten to reference layout: agents of scene 0, scene 1, ...
            sel = abs_np[:, valid_rows]  # (K, N_batch, T, 2)
            out[s].append(np.transpose(sel, (2, 0, 1, 3)))  # (T, K, N, 2)
    return {s: np.concatenate(v, axis=2) for s, v in out.items()}


def get_predictions(predictor, loader, num_preds=20, strategy="sampling", seed=0):
    """Run a strategy over a sequential loader -> (pred_len, k, N, 2) numpy."""
    return get_predictions_multi(
        predictor, loader, num_preds, (strategy,), seed
    )[strategy]


def evaluate_ade_fde(ds, preds, n_preds_list):
    """Reference-exact ADE/FDE/Mode accumulation (evaluation.py:43-78,
    metrics.py:99-141) from a (pred_len, k, N, 2) prediction tensor."""
    gt = ds.pred_traj  # (N, T, 2)
    seq_start_end = ds.seq_start_end
    pred_mask = np.isnan(gt).any(-1).any(-1)
    start_end = adjust_seq_start_end_for_mask(seq_start_end, pred_mask)
    gt = gt[~pred_mask]
    preds = preds[:, :, ~pred_mask]

    sums = defaultdict(lambda: np.zeros(2))
    for scene_idx, (start, end) in enumerate(start_end):
        if start == end:
            continue
        scaling = ds.eval_scaling(scene_idx)
        p = preds[:, :, start:end] * scaling  # (T, k, n, 2)
        g = gt[start:end].transpose(1, 0, 2) * scaling  # (T, n, 2)
        d = np.linalg.norm(p - g[:, None], axis=-1)  # (T, k, n)
        ades = d.sum(0)  # (k, n)
        fdes = d[-1]  # (k, n)
        n = end - start
        for k in n_preds_list:
            min_ade = ades[:k].sum(1).min()
            min_fde = fdes[:k].sum(1).min()
            mode = (fdes[:k].min(0) < MODE_THRESH).sum()
            sums[f"ADE k={k}"] += (min_ade, PRED_LEN * n)
            sums[f"FDE k={k}"] += (min_fde, n)
            sums[f"Mode k={k}"] += (mode, n)
    return {k: v[0] / v[1] for k, v in sums.items()}
