"""Attribute the fused train step's cold-compile time (BASELINE.md r3:
79-455 s through the remote-compile service) to its components:

  1. the inference-forward Pallas kernel (decode_select, 12 unrolled steps)
  2. the train fwd+bwd Pallas kernel pair (decode_all under value_and_grad)
  3. the XLA-only train step (pallas_decoder=0: pure scan autodiff)
  4. the full fused train step (both kernels inside)

Each is compiled as its own program in one process; wall-clock includes
remote-compile-service queueing (load-dependent — treat deltas, not
absolutes, as the signal). Run: python benchmarks/compile_attribution.py
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mggan_tpu.models import factory
from mggan_tpu.models import generator as G_mod
from mggan_tpu.ops import sampling
from mggan_tpu.training.state import init_train_state
from mggan_tpu.training.steps import batch_views, build_train_step


def timed(name, fn, results):
    t0 = time.perf_counter()
    out = fn()
    float(jnp.asarray(out).sum())  # value fetch = the only tunnel-safe fence
    results[name] = round(time.perf_counter() - t0, 1)
    print(name, results[name], flush=True)


def main():
    results = {}
    cfg = bench._flagship_config(batch_size=bench.S_TRAIN)
    g_pack, d_pack = factory.construct_model(cfg, jax.random.PRNGKey(0))
    g_params, g_state, g_spec = g_pack
    batch = bench._make_batch(bench.S_TRAIN, bench.P)
    bv = batch_views(batch)
    key = jax.random.PRNGKey(1)

    s, p = bv.ped_mask.shape
    enc_h, soc, _ = G_mod.encode(
        g_params, g_state, g_spec, bv.in_xy, bv.in_dxdy, bv.ped_mask,
        bv.patches, train=False,
    )
    logits = G_mod.pm_logits(g_params, g_spec, enc_h)
    gen_idxs = sampling.categorical(key, logits, bench.K)
    noise = sampling.global_noise(key, bench.K, s, p, cfg.noise_dim)
    args = (bv.in_xy[:, :, -1], bv.in_dxdy[:, :, -1], enc_h, soc, noise)

    # 1. inference select kernel alone
    @jax.jit
    def sel(g_params, gen_idxs):
        out = G_mod.decode_select(g_params, g_spec, *args, gen_idxs)
        return out.abs.sum()

    timed("pallas_select_fwd", lambda: sel(g_params, gen_idxs), results)

    # 2. train fwd+bwd kernels alone (grad through decode_all + gather)
    @jax.jit
    def dec_grad(g_params):
        def loss(p_):
            out = G_mod.decode_select(
                p_, g_spec, *args, gen_idxs, fuse_select=False
            )
            return (out.abs ** 2).sum()

        return jax.grad(loss)(g_params)["decoders"]["lstm"]["w_hh"].sum()

    timed("pallas_train_fwd_bwd", lambda: dec_grad(g_params), results)

    # 3. XLA-only train step (scan decoder, no pallas)
    cfg_xla = bench._flagship_config(batch_size=bench.S_TRAIN, pallas_decoder=0)
    g2, d2 = factory.construct_model(cfg_xla, jax.random.PRNGKey(0))
    st2 = init_train_state(cfg_xla, g2, d2, jax.random.PRNGKey(1))
    step2 = build_train_step(cfg_xla, g2[2], d2[2])
    timed(
        "train_step_xla_only",
        lambda: step2(st2, batch)[1]["train/gen_loss"],
        results,
    )

    # 4. full fused step (both kernels)
    g3, d3 = factory.construct_model(cfg, jax.random.PRNGKey(0))
    st3 = init_train_state(cfg, g3, d3, jax.random.PRNGKey(1))
    step3 = build_train_step(cfg, g3[2], d3[2])
    timed(
        "train_step_fused_pallas",
        lambda: step3(st3, batch)[1]["train/gen_loss"],
        results,
    )

    print("COMPILEATTR " + json.dumps(results))


if __name__ == "__main__":
    main()
