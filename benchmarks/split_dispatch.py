"""Fused one-dispatch step vs split three-dispatch step, steady state.
Decides the 'one-dispatch split-step' TODO: if the 3-program split costs
~nothing at steady state (dispatches pipeline through the tunnel), the
jit-of-compiled-calls idea is moot."""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import bench
from mggan_tpu.models import factory
from mggan_tpu.training.state import init_train_state
from mggan_tpu.training.steps import build_train_step, build_split_train_step

cfg = bench._flagship_config(batch_size=bench.S_TRAIN)
batch = bench._make_batch(bench.S_TRAIN, bench.P)
out = {}
for name, builder in (("fused", build_train_step), ("split", build_split_train_step)):
    # fresh params per variant: donated steps delete the buffers they share
    # with g_pack/d_pack
    g_pack, d_pack = factory.construct_model(cfg, jax.random.PRNGKey(0))
    state = init_train_state(cfg, g_pack, d_pack, jax.random.PRNGKey(1))
    step = builder(cfg, g_pack[2], d_pack[2])
    if hasattr(step, "precompile"):
        t0 = time.perf_counter()
        step.precompile(state, batch)
        out[name + "_precompile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    state, m = step(state, batch)
    float(m["train/gen_loss"])
    out[name + "_first_s"] = round(time.perf_counter() - t0, 1)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            state, m = step(state, batch)
        float(m["train/gen_loss"])
        best = min(best, (time.perf_counter() - t0) / 20)
    out[name + "_step_ms"] = round(best * 1e3, 2)
    print(name, out, flush=True)
print("SPLITDISPATCH " + json.dumps(out))
