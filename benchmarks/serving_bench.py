"""Serving-runtime benchmark on the default backend (real chip under axon).

Measures the deployment path (serving/runtime.py — no reference equivalent,
the reference's only inference surface is scripts/evaluate.py):

* single-scene request latency through ServingModel.predict (pad -> one
  device call -> strip; the returned numpy array is the fence, so these are
  honest end-to-end numbers through the tunnel);
* micro-batched throughput: N client threads against one MicroBatcher,
  requests/s and the realized device-batch occupancy.

Usage: python benchmarks/serving_bench.py [--scenes 64] [--threads 32]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=64)
    ap.add_argument("--peds", type=int, default=16)
    ap.add_argument("--num", type=int, default=20)
    ap.add_argument("--threads", type=int, default=32)
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--latency_iters", type=int, default=30)
    args = ap.parse_args()

    import jax

    from mggan_tpu.config import Config
    from mggan_tpu.eval.predict import Predictor
    from mggan_tpu.models import factory
    from mggan_tpu.serving.runtime import MicroBatcher, ServingModel

    cfg = Config(
        dataset="synthetic_memory", num_gens=4, gan_type="mgan",
        weighting_target="ml", h_dim=32, decoder_h_dim=32,
    )
    (g_params, g_state, g_spec), _ = factory.construct_model(
        cfg, jax.random.PRNGKey(0)
    )
    predictor = Predictor(cfg, g_spec, g_params, g_state)
    model = ServingModel.from_predictor(
        predictor, "sampling", args.scenes, args.peds, args.num
    )

    rng = np.random.RandomState(0)
    obs = (rng.randn(args.peds, 8, 2).astype(np.float32).cumsum(1) * 0.1)
    # every model carries a scene CNN (SCENE_DIM constant); bench the real
    # request payload — per-ped 33x33x4 patches — not the zero-patch opt-out
    patches = rng.rand(args.peds, 33, 33, 4).astype(np.float32)

    t0 = time.perf_counter()
    model.predict(obs, patches=patches, seed=0)  # compile + warm
    compile_s = time.perf_counter() - t0

    # single-request latency (sequential; the numpy result is the fence)
    lat = []
    for i in range(args.latency_iters):
        t0 = time.perf_counter()
        model.predict(obs, patches=patches, seed=i)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3

    # micro-batched concurrent throughput
    from concurrent.futures import ThreadPoolExecutor

    with MicroBatcher(model, max_wait_ms=5.0) as mb:
        def one(i):
            return mb.predict(obs, patches=patches, seed=i, timeout=300.0)

        with ThreadPoolExecutor(args.threads) as ex:
            list(ex.map(one, range(args.threads)))  # warm the queue path
            # snapshot counters so warm-up requests/batches don't skew the
            # timed window's occupancy (ADVICE r3)
            req0, bat0 = mb.requests_served, mb.batches_run
            t0 = time.perf_counter()
            list(ex.map(one, range(args.requests)))
            dt = time.perf_counter() - t0
        occupancy = (mb.requests_served - req0) / max(mb.batches_run - bat0, 1)

    print(json.dumps({
        "backend": jax.default_backend(),
        "compile_s": round(compile_s, 1),
        "latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 2),
        "latency_ms_p95": round(float(np.percentile(lat_ms, 95)), 2),
        "microbatch_requests_per_sec": round(args.requests / dt, 1),
        "microbatch_agents_per_sec": round(
            args.requests * args.peds / dt, 1
        ),
        "mean_batch_occupancy": round(occupancy, 1),
        "compiled_batch_scenes": args.scenes,
    }))


if __name__ == "__main__":
    main()
