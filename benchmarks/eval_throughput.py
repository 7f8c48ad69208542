"""End-to-end evaluation throughput on the real TPU chip: the Predictor's
k=20 ``sampling`` strategy (encode + PM-categorical + fused-selection
decode) chained into the on-device ADE/FDE/Mode metric sums — the L5 eval
stack the evaluate CLI and Trainer.check_accuracy drive
(reference scripts/evaluate.py:114-163; the reference runs this loop on the
host in numpy, one scene at a time).

r3 result (single v5e, forced value-fetch sync): 109.8 ms per 4096-scene
batch = 596.7k agents/s = 11.9M trajectories/s through predict + metric
sums at ks=(1,5,10,20) — the metric stack costs ~12 ms over the 98 ms
sampling path. Run: python benchmarks/eval_throughput.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from mggan_tpu.eval.metrics import batch_metric_sums
from mggan_tpu.eval.predict import Predictor
from mggan_tpu.models import factory
from mggan_tpu.training.steps import batch_views

S, P, K = 4096, 16, 20


def main():
    cfg = bench._flagship_config()
    g_params, g_state, g_spec = factory.construct_model(
        cfg, jax.random.PRNGKey(0)
    )[0]
    predictor = Predictor(cfg, g_spec, g_params, g_state)
    pred_func = predictor.get_predict_func("sampling")
    batch = bench._make_batch(S, P)
    batch["scale"] = jnp.ones((S,))

    ks = (1, 5, 10, 20)

    @jax.jit
    def metric_sums(pred_abs, batch):
        bv = batch_views(batch)
        return batch_metric_sums(pred_abs, bv.gt_xy, bv.loss_mask,
                                 batch["scale"], list(ks))

    def eval_batch(i):
        pred_abs, _, _, _ = pred_func(batch, jax.random.fold_in(key, i), num=K)
        return metric_sums(pred_abs, batch)

    key = jax.random.PRNGKey(1)
    sums = eval_batch(0)  # compile
    # value fetch is the only reliable fence through the axon tunnel
    float(sum(jnp.asarray(v).sum() for v in jax.tree.leaves(sums)))

    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(5):
            sums = eval_batch(5 * w + i)
        float(sum(jnp.asarray(v).sum() for v in jax.tree.leaves(sums)))
        best = min(best, (time.perf_counter() - t0) / 5)

    agents = S * P
    print("EVALBENCH " + json.dumps({
        "batch_ms": round(best * 1e3, 2),
        "agents_per_sec": round(agents / best, 1),
        "traj_per_sec": round(agents * K / best, 1),
        "ks": list(ks),
    }))


if __name__ == "__main__":
    main()
