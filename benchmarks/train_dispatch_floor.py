"""Train-step dispatch-floor closure by measurement (VERDICT r4 next #7).

BASELINE.md r3 estimated the fused D+G+PM step at S=256 as "roughly half
per-dispatch/launch latency" from a single AdamW-only probe. This script
QUANTIFIES it: the same fused ``build_train_step`` program is compiled and
timed at several scene counts S, and the linear fit

    t(S) = dispatch_floor + S * marginal_per_scene

yields the fixed per-step cost (axon tunnel dispatch + launch, absent on a
directly-attached TPU) from successive marginals (d = 2*t(S) - t(2S)).
The dispatch-corrected speed-of-light ratio

    sol_x_dispatch_corrected = (t(S) - dispatch) / sol(S)

is then the winnable-compute headroom of the step itself; bench.py reads
the committed JSON this script writes (benchmarks/train_dispatch_floor.json)
and reports both numbers in its summary extras each run.

Each batch size is its own program (static shapes), so this costs one
compile per S — run with a persistent cache dir to amortize re-runs.

Usage: python benchmarks/train_dispatch_floor.py [--sizes 128 256 512 1024]
Prints one JSON line and writes benchmarks/train_dispatch_floor.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

P = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[128, 256, 512, 1024])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cache_dir", default="/tmp/mggan_bench_jaxcache")
    args = ap.parse_args()

    import jax

    from mggan_tpu.config import Config
    from mggan_tpu.models import factory
    from mggan_tpu.training.state import init_train_state
    from mggan_tpu.training.steps import build_train_step
    from mggan_tpu.utils import roofline
    from mggan_tpu.utils.profiling import enable_compilation_cache

    if args.cache_dir:
        enable_compilation_cache(args.cache_dir)

    times = {}
    for s in sorted(args.sizes):
        cfg = Config(dataset="synthetic_memory", num_gens=4, gan_type="mgan",
                     weighting_target="ml", h_dim=32, decoder_h_dim=32,
                     batch_size=s)
        g_pack, d_pack = factory.construct_model(cfg, jax.random.PRNGKey(0))
        state = init_train_state(cfg, g_pack, d_pack, jax.random.PRNGKey(1))
        step = build_train_step(cfg, g_pack[2], d_pack[2])
        rng = np.random.RandomState(0)
        batch = {
            "xy": jax.numpy.asarray(
                rng.randn(s, P, 20, 2).astype(np.float32).cumsum(2) * 0.1),
            "ped_mask": jax.numpy.ones((s, P), bool),
            "patches": jax.numpy.asarray(
                rng.uniform(-1, 1, (s, P, 33, 33, 4)).astype(np.float32)),
        }
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        float(metrics["train/gen_loss"])  # value fetch = the tunnel fence
        compile_s = time.perf_counter() - t0

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, metrics = step(state, batch)
            float(metrics["train/gen_loss"])
            best = min(best, time.perf_counter() - t0)
        times[s] = best / args.iters
        print(f"S={s}: {times[s]*1e3:.2f} ms/step "
              f"(compile {compile_s:.1f}s)", flush=True)

    sizes = sorted(times)
    out = {"step_ms": {str(s): round(times[s] * 1e3, 2) for s in sizes}}

    # successive-marginal dispatch estimates: d = 2*t(S) - t(2S) for each
    # doubling pair; their agreement is the closure evidence
    est = {}
    for s in sizes:
        if 2 * s in times:
            est[f"{s}_vs_{2*s}"] = round(
                (2 * times[s] - times[2 * s]) * 1e3, 2)
    out["dispatch_ms_estimates"] = est
    # Negative estimates mean t(2S) > 2*t(S): the step scales (mildly)
    # SUPER-linearly, i.e. there is NO fixed dispatch floor to subtract —
    # back-to-back stepping pipelines the per-dispatch latency away (the
    # ~8 ms floor r3 measured applies to isolated single-program calls,
    # not steady-state throughput). Clamp at 0: correcting with a negative
    # floor would be subtracting convexity, not dispatch.
    disp_ms = float(np.median(list(est.values()))) if est else 0.0
    out["dispatch_ms_raw_median"] = round(disp_ms, 2)
    disp_ms = max(disp_ms, 0.0)
    out["dispatch_ms"] = round(disp_ms, 2)

    # dispatch-corrected sol_x at the flagship S=256 (BENCH headline row):
    # flops from XLA's HLO cost analysis + the analytic Pallas adders,
    # exactly bench.py's train_roofline accounting
    s_ref = 256 if 256 in times else sizes[0]
    cfg = Config(dataset="synthetic_memory", num_gens=4, gan_type="mgan",
                 weighting_target="ml", h_dim=32, decoder_h_dim=32,
                 batch_size=s_ref)
    d = Config()
    rows_g = s_ref * P * d.num_samples
    rows_d = s_ref * P * (1 + d.num_expectation_samples)
    # XLA flop count from the last compiled program is backend-dependent;
    # reuse bench.py's committed value scaled by S (flops are linear in S)
    xla_flops = None
    full_path = os.path.join(HERE, "bench_full.json")
    if os.path.exists(full_path):
        with open(full_path) as f:
            tr = json.load(f)["extra"].get("train_roofline", {})
        if tr.get("xla_flops"):
            xla_flops = tr["xla_flops"] * s_ref / 256.0
    if xla_flops:
        tf = roofline.train_step_flops(
            xla_flops, g=4, h=32, in_dim=2, soc_f=32,
            rows_g=rows_g, rows_d=rows_d, pred_len=12)
        sol_s = tf["executed"] / roofline.V5E_PEAK_FLOPS
        t_ref = times[s_ref]
        out["s_ref"] = s_ref
        out["sol_ms"] = round(sol_s * 1e3, 2)
        out["sol_x"] = round(t_ref / sol_s, 1)
        out["sol_x_dispatch_corrected"] = round(
            max(t_ref - disp_ms / 1e3, 0.0) / sol_s, 1)
        out["projected_step_ms_direct_attach"] = round(
            (t_ref - disp_ms / 1e3) * 1e3, 2)

    with open(os.path.join(HERE, "train_dispatch_floor.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
