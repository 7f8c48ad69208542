"""Scene-CNN roofline closure (VERDICT r3 #4, option B): show by
measurement that the encode stage is within ~2x of attainable for its
program structure, and decompose the measured time into

    t(B) = dispatch_floor + traffic(B) / achieved_GBps

via batch scaling: timing the SAME jitted stack at B and B/2 separates the
fixed per-call cost (axon tunnel dispatch, independently measured at
~8 ms/program — BASELINE.md train-step phase table) from the per-patch
cost, and the per-patch slope is compared against the materialized-
intermediate traffic model (utils/roofline.py::scene_cnn_traffic) rather
than the fused-kernel speed-of-light (a fused Pallas kernel was built in
r3 and measured SLOWER end-to-end — BASELINE.md encode row).

Usage: python benchmarks/cnn_roofline.py   (real chip via axon)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B_FULL = 65536  # the sampling benchmark's patch count (4096 scenes x 16)


def timed_best(fn, n_iters=5, windows=3):
    float(fn())
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn()
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best / n_iters


def main():
    import jax
    import jax.numpy as jnp

    from mggan_tpu.config import Config
    from mggan_tpu.models import factory
    from mggan_tpu.ops.cnn import scene_cnn_apply
    from mggan_tpu.utils import roofline

    cfg = Config(dataset="synthetic_memory", num_gens=4, gan_type="mgan",
                 weighting_target="ml", h_dim=32, decoder_h_dim=32)
    (g_params, g_state, _), _ = factory.construct_model(
        cfg, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    out = {}
    for name, cd, act_bytes in (("f32", None, 4), ("bf16", jnp.bfloat16, 2)):
        f = jax.jit(lambda x, cd=cd: scene_cnn_apply(
            g_params["scene"], g_state["scene"], x, train=False,
            compute_dtype=cd)[0].sum())
        times = {}
        for b in (B_FULL // 2, B_FULL):
            x = rng.rand(b, 33, 33, 4).astype(np.float32)
            x = jax.device_put(x)
            times[b] = timed_best(lambda: f(x))
        t_half, t_full = times[B_FULL // 2], times[B_FULL]
        # linear model: slope = marginal per-patch cost, intercept = fixed
        slope_s = (t_full - t_half) / (B_FULL / 2)
        dispatch_s = t_full - slope_s * B_FULL
        traffic = roofline.scene_cnn_traffic(B_FULL, act_bytes=act_bytes)
        attain_s = traffic / roofline.V5E_HBM_BPS
        exec_s = t_full - max(dispatch_s, 0.0)
        out[name] = {
            "ms_full": round(t_full * 1e3, 2),
            "ms_half": round(t_half * 1e3, 2),
            "dispatch_ms": round(dispatch_s * 1e3, 2),
            "traffic_gb": round(traffic / 1e9, 2),
            "achieved_gbps_marginal": round(
                traffic / 2 / (t_full - t_half) / 1e9, 1),
            "attainable_ms": round(attain_s * 1e3, 2),
            "exec_vs_attainable_x": round(exec_s / attain_s, 2),
            "total_vs_attainable_x": round(t_full / attain_s, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
