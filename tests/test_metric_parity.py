"""Device-side batched metrics must equal the host reference-semantics
accumulation EXACTLY when fed the same predictions."""

import jax
import jax.numpy as jnp
import numpy as np

from mggan_tpu.config import OBS_LEN
from mggan_tpu.data.loaders import get_dataloader, get_dataset
from mggan_tpu.eval import evaluate as ev
from mggan_tpu.eval.metrics import MetricAccumulator, batch_metric_sums
from mggan_tpu.training.steps import batch_views


def test_device_metrics_equal_host_reference():
    ds = get_dataset("synthetic_memory", "test")
    loader = get_dataloader("synthetic_memory", "test", batch_size=4)
    rng = np.random.RandomState(0)
    ks = [1, 3, 5]
    K = max(ks)

    acc = MetricAccumulator()
    all_preds = []
    for batch in loader:
        s, p = batch["ped_mask"].shape
        # fake predictions: gt + structured noise (NaN-safe)
        gt = np.nan_to_num(batch["xy"][:, :, OBS_LEN:])
        preds = gt[None] + rng.randn(K, s, p, 12, 2).astype(np.float32)
        bv = batch_views(
            {"xy": jnp.asarray(batch["xy"]),
             "ped_mask": jnp.asarray(batch["ped_mask"])}
        )
        sums = batch_metric_sums(
            jnp.asarray(preds), bv.gt_xy, bv.loss_mask,
            jnp.asarray(batch["scale"]), ks,
        )
        acc.update(jax.device_get(sums))
        valid = np.asarray(batch["ped_mask"])
        all_preds.append(np.transpose(preds[:, valid], (2, 0, 1, 3)))

    device_metrics = acc.result()
    # host reference path over the same predictions
    preds_ref = np.concatenate(all_preds, axis=2)  # (T, K, N, 2)
    host_metrics = ev.evaluate_ade_fde(ds, preds_ref, ks)
    for k in ks:
        for name in ("ADE", "FDE", "Mode"):
            a = device_metrics[f"{name} k={k}"]
            b = host_metrics[f"{name} k={k}"]
            np.testing.assert_allclose(a, b, rtol=1e-5, err_msg=f"{name} k={k}")


def test_upper_lower_split_filter():
    from mggan_tpu.data import parsing
    from mggan_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(num_windows=20, max_peds=4, seed=5, img_size=160)
    up = parsing.filter_split(ds, "upper")
    lo = parsing.filter_split(ds, "lower")
    assert len(up) + len(lo) >= len(ds)  # windows may satisfy both (any-ped rule)
    for d, pred in ((up, lambda y: y <= 16.0), (lo, lambda y: y > 16.0)):
        for traj in d.trajectories:
            assert pred(traj[:, OBS_LEN, 1]).any()
