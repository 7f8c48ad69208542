"""Decode-stage roofline closure by measurement (VERDICT r4 next #3).

Mirrors benchmarks/cnn_roofline.py's method for the two Pallas decode
stages — the largest single stage of both the sampling path and the train
step:

* ``select``       — the fused-selection forward kernel
                     (ops/pallas/decoder.py::pallas_decode_select), on the
                     sampling benchmark's shapes (K=20 rollouts per agent);
* ``train_fwd_bwd``— the train-path forward + true-backward kernel pair
                     (pallas_decode_all under jax.grad), on the G-step's
                     row count (S*P*num_samples rollouts).

Timing the SAME jitted program at R and R/2 rows splits

    t(R) = dispatch_floor + R * marginal_per_row

so the axon tunnel's fixed per-program dispatch cost (absent on a
directly-attached TPU) is measured, not estimated, and the marginal
per-row cost is compared against the MXU speed-of-light for the EXECUTED
flops of the lane-packed program structure (utils/roofline.py::
decoder_flops — the packing trades 4x MXU flops for full-width VPU lanes;
the sorted/compact variants avoiding that redundancy were measured LOSSES
in r3, BASELINE.md decode row). ``exec_vs_attainable_x`` is therefore the
honest winnable-kernel-time headroom for this program structure;
``useful_x`` prices the additional algorithmic headroom a non-packed
program would need to collect (known-lost per r3 ablations).

Usage: python benchmarks/decode_roofline.py   (real chip via axon)
Prints one JSON line; bench.py folds the dispatch correction into its
``stages.decode`` extras from the committed decode_roofline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S_SAMPLE, P, K = 4096, 16, 20      # sampling-path shapes (bench.py)
S_TRAIN, K_TRAIN = 256, 20         # G-step shapes (num_samples=20)


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


def _fit(times, rows_full):
    """times: {rows: seconds} at rows_full and rows_full//2."""
    t_half, t_full = times[rows_full // 2], times[rows_full]
    slope = (t_full - t_half) / (rows_full / 2)   # s per row, marginal
    # Clamp at 0 like train_dispatch_floor.py: super-linear scaling
    # (t_full > 2*t_half) yields a negative intercept, and a negative
    # "dispatch" would make bench.py's sol_x_dispatch_corrected WORSE
    # than the uncorrected value instead of removing overhead.
    dispatch = max(t_full - slope * rows_full, 0.0)
    return slope, dispatch, t_half, t_full


def main():
    import jax

    from mggan_tpu.config import Config
    from mggan_tpu.models import factory
    from mggan_tpu.models import generator as G_mod
    from mggan_tpu.utils import roofline
    from mggan_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache("/tmp/mggan_bench_jaxcache")

    cfg = Config(dataset="synthetic_memory", num_gens=4, gan_type="mgan",
                 weighting_target="ml", h_dim=32, decoder_h_dim=32)
    g_pack, _ = factory.construct_model(cfg, jax.random.PRNGKey(0))
    g_params, g_state, g_spec = g_pack

    def make_inputs(s, k, seed=0):
        """Synthesized decoder inputs at the encode-output contract
        (decode_all docstring shapes) — the decode stage's cost does not
        depend on the encodings' values, and skipping the encode jit
        halves the number of tunnel compiles this script pays."""
        rng = np.random.RandomState(seed)
        e_total = (g_params["enc_to_dec"]["lin0"]["w"].shape[0]
                   - cfg.noise_dim)
        a = lambda x: jax.device_put(x.astype(np.float32))
        return jax.block_until_ready((
            a(rng.randn(s, P, 2) * 0.1),                  # last_xy
            a(rng.randn(s, P, 2) * 0.1),                  # last_dxdy
            a(rng.randn(s, P, e_total) * 0.5),            # enc_h
            a(rng.randn(s, P, g_spec.social_out_dim)),    # social
            a(rng.randn(k, s, P, cfg.noise_dim)),         # noise
            jax.device_put(rng.randint(0, cfg.num_gens,
                                       (s, P, k)).astype(np.int32)),
        ))

    out = {}

    # ---- fused-selection forward kernel (sampling path), R vs R/2 rows --
    @jax.jit
    def dec_sel(g_params, last_xy, last_dxdy, enc_h, soc, noise, gen_idxs):
        return G_mod.decode_select(
            g_params, g_spec, last_xy, last_dxdy, enc_h, soc, noise,
            gen_idxs, None).abs.sum()

    times = {}
    for s in (S_SAMPLE // 2, S_SAMPLE):
        inp = make_inputs(s, K)
        times[K * s * P] = timed_best(lambda: dec_sel(g_params, *inp))
        print(f"select S={s}: {times[K*s*P]*1e3:.2f} ms", flush=True)
    rows_full = K * S_SAMPLE * P
    slope, dispatch, t_half, t_full = _fit(times, rows_full)
    fl = roofline.decoder_flops(
        g=cfg.num_gens, h=cfg.decoder_h_dim, in_dim=2,
        soc_f=g_spec.social_out_dim, rows=rows_full, pred_len=12,
        select=True)
    attain_s = fl["executed"] / roofline.V5E_PEAK_FLOPS  # compute-bound
    exec_s = slope * rows_full
    # the MXU roofline prices elementwise at zero; decompose the kernel's
    # structural floor with the analytic VPU model (validated against the
    # r3 linear-stand-in ablation: predicted transc time ~10.5 ms vs
    # measured 10.6 ms — utils/roofline.py V5E_VPU_TRANSC note)
    vpu = roofline.decoder_vpu_ops(g=cfg.num_gens, h=cfg.decoder_h_dim,
                                   rows=rows_full, pred_len=12)
    elem_s = vpu["elementwise"] / roofline.V5E_VPU_OPS
    transc_s = vpu["transcendental"] / roofline.V5E_VPU_TRANSC
    floor_serial = attain_s + elem_s + transc_s   # no MXU/VPU overlap
    floor_overlap = max(attain_s, elem_s + transc_s)  # perfect overlap
    out["select"] = {
        "vpu_elementwise_ms": round(elem_s * 1e3, 2),
        "vpu_transcendental_ms": round(transc_s * 1e3, 2),
        "structural_floor_ms_serial": round(floor_serial * 1e3, 2),
        "structural_floor_ms_overlap": round(floor_overlap * 1e3, 2),
        "kernel_vs_structural_floor_x": round(exec_s / floor_serial, 2),
        "rows": rows_full,
        "ms_full": round(t_full * 1e3, 2),
        "ms_half": round(t_half * 1e3, 2),
        "dispatch_ms": round(dispatch * 1e3, 2),
        "marginal_tflops_executed": round(
            fl["executed"] / exec_s / 1e12, 1),
        "marginal_mfu_pct": round(
            100.0 * fl["executed"] / exec_s / roofline.V5E_PEAK_FLOPS, 1),
        "attainable_ms": round(attain_s * 1e3, 2),
        "exec_vs_attainable_x": round(exec_s / attain_s, 2),
        "total_vs_attainable_x": round(t_full / attain_s, 2),
        "useful_x": round(fl["executed"] / fl["useful"], 2),
    }

    # ---- train fwd+bwd kernel pair (G-step rows), R vs R/2 -------------
    @jax.jit
    def dec_grad(g_params, last_xy, last_dxdy, enc_h, soc, noise):
        def loss(p):
            o = G_mod.decode_all(p, g_spec, last_xy, last_dxdy, enc_h, soc,
                                 noise, None)
            return o.abs.sum() + o.rel.sum()

        g = jax.grad(loss)(g_params)
        return sum(jax.numpy.abs(x).sum() for x in jax.tree.leaves(g))

    times = {}
    for s in (S_TRAIN // 2, S_TRAIN):
        inp = make_inputs(s, K_TRAIN)
        times[K_TRAIN * s * P] = timed_best(
            lambda: dec_grad(g_params, *inp[:5]))
        print(f"train_fwd_bwd S={s}: {times[K_TRAIN*s*P]*1e3:.2f} ms",
              flush=True)
    rows_full = K_TRAIN * S_TRAIN * P
    slope, dispatch, t_half, t_full = _fit(times, rows_full)
    fl = roofline.decoder_flops(
        g=cfg.num_gens, h=cfg.decoder_h_dim, in_dim=2,
        soc_f=g_spec.social_out_dim, rows=rows_full, pred_len=12,
        select=False)
    # fwd + 3x bwd (recompute + 2x grad contractions) per
    # utils/roofline.py::train_step_flops; the jit also carries the
    # encode-side VJP chain (pack VJP + broadcast sums) priced at 0 here,
    # so attainable is a floor for the whole grad program
    flops = 4 * fl["executed"]
    attain_s = flops / roofline.V5E_PEAK_FLOPS
    exec_s = slope * rows_full
    out["train_fwd_bwd"] = {
        "rows": rows_full,
        "ms_full": round(t_full * 1e3, 2),
        "ms_half": round(t_half * 1e3, 2),
        "dispatch_ms": round(dispatch * 1e3, 2),
        "marginal_tflops_executed": round(flops / exec_s / 1e12, 1),
        "marginal_mfu_pct": round(
            100.0 * flops / exec_s / roofline.V5E_PEAK_FLOPS, 1),
        "attainable_ms": round(attain_s * 1e3, 2),
        "exec_vs_attainable_x": round(exec_s / attain_s, 2),
        "total_vs_attainable_x": round(t_full / attain_s, 2),
        "useful_x": round(fl["executed"] / fl["useful"], 2),
    }

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "decode_roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
