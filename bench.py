"""Benchmark: k=20 multi-generator sampling throughput on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the build target of 100k trajectories/sec
k=20 sampling (BASELINE.md north star; the reference never measured
throughput, SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from mggan_tpu.config import Config
    from mggan_tpu.models import factory
    from mggan_tpu.training.steps import batch_views, _g_forward_sampled

    S, P, K = 4096, 16, 20
    cfg = Config(
        dataset="synthetic_memory", num_gens=4, gan_type="mgan",
        weighting_target="ml", h_dim=32, decoder_h_dim=32,
    )
    g_pack, d_pack = factory.construct_model(cfg, jax.random.PRNGKey(0))
    g_params, g_state, g_spec = g_pack

    rng = np.random.RandomState(0)
    batch = {
        "xy": jnp.asarray(rng.randn(S, P, 20, 2).astype(np.float32).cumsum(2) * 0.1),
        "ped_mask": jnp.ones((S, P), bool),
        "patches": jnp.asarray(
            rng.uniform(-1, 1, (S, P, 33, 33, 4)).astype(np.float32)
        ),
    }

    @jax.jit
    def sample(g_params, g_state, batch, key):
        bv = batch_views(batch)
        pred, _, _, _, _ = _g_forward_sampled(
            g_params, g_state, g_spec, cfg, bv, key, num_samples=K, train=False
        )
        return pred.abs

    key = jax.random.PRNGKey(1)
    out = sample(g_params, g_state, batch, key)  # compile
    jax.block_until_ready(out)

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = sample(g_params, g_state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    traj_per_sec = n_iters * S * P * K / dt
    print(
        json.dumps(
            {
                "metric": "k20_sampling_throughput",
                "value": round(traj_per_sec, 1),
                "unit": "traj/s",
                "vs_baseline": round(traj_per_sec / 100_000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
