"""Benchmark: flagship model on the real TPU chip.

The LAST stdout line is ONE compact JSON line
{"metric", "value", "unit", "vs_baseline", "extra"} kept under
SUMMARY_LINE_MAX chars so the driver's tail capture can always parse it
(round-4 lesson: the full extras outgrew the capture window and the round's
headline number was lost — VERDICT r4 weak #1). The complete extras are
written to benchmarks/bench_full.json (committed) and referenced from the
summary's ``extra.full_results``.

* headline metric: k=20 multi-generator sampling throughput vs the 100k
  traj/s build target (BASELINE.md north star; the reference never measured
  throughput, SURVEY.md §6).
* extra.train_*: fused D+G+PM train-step latency / agent throughput at 4096
  agents (S=256 scenes x P=16 peds, the flagship batch).
* extra.ref_*: the reference's torch train step on CPU
  (benchmarks/ref_torch_cpu.json, produced by benchmarks/ref_torch_step.py;
  caveat documented there and in BASELINE.md).
* extra.host_pipeline_*: synthetic-data ingestion rate through
  PaddedBatcher + Prefetcher, to show the host feed outruns the device step.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

S_TRAIN, P, K = 256, 16, 20  # 4096 agents/step, flagship shapes
S_SAMPLE = 4096

# Hard cap on the final stdout line: the driver tails ~2000 chars of stdout;
# stay well under it so the headline JSON survives any prefix noise.
SUMMARY_LINE_MAX = 1500

# extra.<key> whitelist for the summary line — the hand-picked headline
# dozen (VERDICT r4 next #1). Dotted paths index into nested dicts.
SUMMARY_KEYS = (
    "sampling_bf16_traj_per_sec",
    "train_step_ms_4096_agents",
    "train_agents_per_sec",
    "train_mfu_pct",
    "train_compile_s",
    "cold_start_cached_s",
    "decode_mfu_pct",
    "cnn_bf16_mfu_pct",
    "train_speedup_vs_ref_torch_cpu",
    "pipeline_bank_agents_per_sec",
    "train_roofline.dispatch_ms",
    "train_roofline.sol_x_dispatch_corrected",
    "stages.decode.sol_x",
    "stages.decode.sol_x_dispatch_corrected",
    "serving.live.load_latency_ms_p50",
    "serving.bucketed.latency_ms_p50",
    "serving.mixed.latency_ms_p50",
    "serving.mixed.latency_ms_p99",
    "serving.mixed.scenes_per_sec",
)


def _pluck(extra, dotted):
    cur = extra
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def summary_line(value, extra, metric="k20_sampling_throughput",
                 unit="traj/s", baseline=100_000.0):
    """Build the driver-facing LAST stdout line: compact JSON with the
    headline metric plus the SUMMARY_KEYS whitelist, guaranteed under
    SUMMARY_LINE_MAX chars (tested by tests/test_bench_contract.py)."""
    compact = {"full_results": "benchmarks/bench_full.json"}
    for key in SUMMARY_KEYS:
        v = _pluck(extra, key)
        if v is not None:
            compact[key.replace(".", "_")] = (
                round(v, 3) if isinstance(v, float) else v
            )
    head = {
        "metric": metric,
        "value": round(value, 1),
        "unit": unit,
        "vs_baseline": round(value / baseline, 3),
    }
    line = json.dumps({**head, "extra": compact}, separators=(",", ":"))
    if len(line) > SUMMARY_LINE_MAX:
        # Never lose the headline to an oversized line (the r4 failure
        # mode): degrade by dropping whitelisted extras from the END
        # until it fits — the headline + full_results pointer always
        # survive. The size guard lives in tests/test_bench_contract.py.
        keys = [k for k in compact if k != "full_results"]
        while keys and len(line) > SUMMARY_LINE_MAX:
            compact.pop(keys.pop())
            line = json.dumps({**head, "extra": compact},
                              separators=(",", ":"))
    return line


def _flagship_config(**kw):
    from mggan_tpu.config import Config

    return Config(
        dataset="synthetic_memory", num_gens=4, gan_type="mgan",
        weighting_target="ml", h_dim=32, decoder_h_dim=32, **kw,
    )


def _make_batch(s, p, seed=0):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    return {
        "xy": jnp.asarray(rng.randn(s, p, 20, 2).astype(np.float32).cumsum(2) * 0.1),
        "ped_mask": jnp.ones((s, p), bool),
        "patches": jnp.asarray(
            rng.uniform(-1, 1, (s, p, 33, 33, 4)).astype(np.float32)
        ),
    }


def bench_sampling(compute_dtype=None):
    """k=20 PM-categorical sampling with the fused-selection decode kernel
    (the Predictor's ``sampling`` strategy path). ``compute_dtype`` measures
    the bf16 matmul fast path (f32 accumulation)."""
    import jax

    from mggan_tpu.models import factory
    from mggan_tpu.models import generator as G_mod
    from mggan_tpu.ops import sampling
    from mggan_tpu.training.steps import batch_views

    cfg = _flagship_config()
    g_pack, _ = factory.construct_model(cfg, jax.random.PRNGKey(0))
    g_params, g_state, g_spec = g_pack
    batch = _make_batch(S_SAMPLE, P)

    # NOTE on timing: through the remote (axon) tunnel,
    # jax.block_until_ready can report readiness before the device finishes;
    # the only reliable fence is fetching a VALUE that depends on the whole
    # computation. Every timer here reduces on device and fetches a scalar.
    @jax.jit
    def sample(g_params, g_state, batch, key):
        k1, k2 = jax.random.split(key)
        bv = batch_views(batch)
        enc_h, soc, _ = G_mod.encode(
            g_params, g_state, g_spec, bv.in_xy, bv.in_dxdy, bv.ped_mask,
            bv.patches, train=False, compute_dtype=compute_dtype,
        )
        logits = G_mod.pm_logits(g_params, g_spec, enc_h)
        gen_idxs = sampling.categorical(k2, logits, K)
        noise = sampling.global_noise(k1, K, S_SAMPLE, P, cfg.noise_dim)
        pred = G_mod.decode_select(
            g_params, g_spec, bv.in_xy[:, :, -1], bv.in_dxdy[:, :, -1],
            enc_h, soc, noise, gen_idxs, compute_dtype,
        )
        return pred.abs.sum()

    key = jax.random.PRNGKey(1)
    float(sample(g_params, g_state, batch, key))  # compile + sync

    # best of 3 windows: throughput through the shared tunnel is noisy
    # under compile-service load; peak sustained rate is the stable figure
    best_dt = float("inf")
    n_iters = 5
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(n_iters):
            out = sample(
                g_params, g_state, batch, jax.random.fold_in(key, 5 * w + i)
            )
        float(out)  # drains the queue
        best_dt = min(best_dt, time.perf_counter() - t0)
    return n_iters * S_SAMPLE * P * K / best_dt


def _timed_best(fn, n_iters=5, windows=3):
    """Best-of-windows sustained per-call seconds; ``fn()`` must return a
    device scalar (fetched once per window — the tunnel-safe fence)."""
    float(fn())  # compile + sync
    best_dt = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn()
        float(out)
        best_dt = min(best_dt, time.perf_counter() - t0)
    return best_dt / n_iters


def bench_stages():
    """Per-stage roofline measurements (VERDICT r3 #3): the scene CNN
    (f32 and the folded-BN bf16 eval path) and the fused-selection decode
    kernel, each isolated in its own jit on the sampling batch's shapes,
    reported as achieved TFLOP/s, % of v5e peak, and distance from the
    (compute, memory)-roofline speed of light."""
    import jax
    import jax.numpy as jnp

    from mggan_tpu.models import factory
    from mggan_tpu.models import generator as G_mod
    from mggan_tpu.ops import sampling
    from mggan_tpu.ops.cnn import scene_cnn_apply
    from mggan_tpu.training.steps import batch_views
    from mggan_tpu.utils import roofline

    cfg = _flagship_config()
    g_pack, _ = factory.construct_model(cfg, jax.random.PRNGKey(0))
    g_params, g_state, g_spec = g_pack
    batch = _make_batch(S_SAMPLE, P)
    n_patches = S_SAMPLE * P
    flat_patches = batch["patches"].reshape(n_patches, 33, 33, 4)

    out = {}
    for name, cd in (("cnn_f32", None), ("cnn_bf16", jnp.bfloat16)):
        f = jax.jit(lambda x, cd=cd: scene_cnn_apply(
            g_params["scene"], g_state["scene"], x, train=False,
            compute_dtype=cd)[0].sum())
        dt = _timed_best(lambda: f(flat_patches))
        fl = roofline.scene_cnn_flops(
            n_patches, channels=16, dtype_bytes=2 if cd is not None else 4)
        out[name] = {"ms": round(dt * 1e3, 2), **roofline.stage_report(
            fl["executed"], fl["min_bytes"], dt)}

    # decode-only: encode once outside the timed jit, keep results on device
    @jax.jit
    def prep(g_params, g_state, batch, key):
        k1, k2 = jax.random.split(key)
        bv = batch_views(batch)
        enc_h, soc, _ = G_mod.encode(
            g_params, g_state, g_spec, bv.in_xy, bv.in_dxdy, bv.ped_mask,
            bv.patches, train=False)
        logits = G_mod.pm_logits(g_params, g_spec, enc_h)
        gen_idxs = sampling.categorical(k2, logits, K)
        noise = sampling.global_noise(k1, K, S_SAMPLE, P, cfg.noise_dim)
        return (bv.in_xy[:, :, -1], bv.in_dxdy[:, :, -1], enc_h, soc,
                noise, gen_idxs)

    last_xy, last_dxdy, enc_h, soc, noise, gen_idxs = jax.block_until_ready(
        prep(g_params, g_state, batch, jax.random.PRNGKey(3)))

    @jax.jit
    def dec(g_params, last_xy, last_dxdy, enc_h, soc, noise, gen_idxs):
        return G_mod.decode_select(
            g_params, g_spec, last_xy, last_dxdy, enc_h, soc, noise,
            gen_idxs, None).abs.sum()

    dt = _timed_best(
        lambda: dec(g_params, last_xy, last_dxdy, enc_h, soc, noise,
                    gen_idxs))
    rows = K * S_SAMPLE * P
    fl = roofline.decoder_flops(
        g=cfg.num_gens, h=cfg.decoder_h_dim, in_dim=2,
        soc_f=g_spec.social_out_dim, rows=rows, pred_len=12, select=True)
    out["decode"] = {"ms": round(dt * 1e3, 2), **roofline.stage_report(
        fl["executed"], fl["min_bytes"], dt, flops_useful=fl["useful"])}
    return out


def bench_train_step(cache_dir=None, n_iters=30):
    """Fused D+G+PM step latency on the flagship config (4096 agents).

    ``cache_dir`` enables the persistent compilation cache (VERDICT r3 #6:
    measured to work through the axon remote-compile path — see the
    cold-start rows in BASELINE.md); a second process with the same dir
    deserializes executables instead of recompiling."""
    import jax

    from mggan_tpu.models import factory
    from mggan_tpu.training.state import init_train_state
    from mggan_tpu.training.steps import build_train_step

    if cache_dir:
        from mggan_tpu.utils.profiling import enable_compilation_cache

        enable_compilation_cache(cache_dir)

    cfg = _flagship_config(batch_size=S_TRAIN)
    g_pack, d_pack = factory.construct_model(cfg, jax.random.PRNGKey(0))
    state = init_train_state(cfg, g_pack, d_pack, jax.random.PRNGKey(1))
    step = build_train_step(cfg, g_pack[2], d_pack[2])
    batch = _make_batch(S_TRAIN, P)

    # Separate session init (backend/tunnel warmup — a TRIVIAL jit costs
    # ~75 s cold through axon, benchmarks/compile_attribution.py) from the
    # actual program compile, so compile_s measures the program.
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda x: (x * 2 + 1).sum())(jnp.ones((256, 256))))
    warmup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state, metrics = step(state, batch)  # compile
    float(metrics["train/gen_loss"])  # real sync (see bench_sampling note)
    compile_s = time.perf_counter() - t0

    dt = None
    if n_iters:
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = step(state, batch)
        float(metrics["train/gen_loss"])
        dt = (time.perf_counter() - t0) / n_iters

    # XLA's own HLO flop count for the compiled step (covers everything
    # except the Pallas custom-calls, which utils/roofline.py adds
    # analytically). May be unavailable through the remote backend.
    xla_flops = None
    try:
        ca = step.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        xla_flops = float(ca["flops"])
    except Exception:
        pass
    return dt, compile_s, warmup_s, xla_flops


def bench_train_step_guarded(timeout_s=1200, cache_dir=None, n_iters=30):
    """The full train step (with the Pallas fwd+bwd decoder) can take
    minutes to compile through the remote-compile tunnel; run it in a
    bounded subprocess so a slow compile service can't kill the whole
    benchmark."""
    import subprocess

    code = (
        "import sys, json; sys.path.insert(0, %r)\n"
        "import bench\n"
        "dt, cs, ws, xf = bench.bench_train_step(cache_dir=%r, n_iters=%d)\n"
        "print('TRAINBENCH ' + json.dumps("
        "{'step_s': dt, 'compile_s': cs, 'warmup_s': ws, 'xla_flops': xf}))\n"
        % (os.path.dirname(os.path.abspath(__file__)), cache_dir, n_iters)
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        for line in r.stdout.splitlines():
            if line.startswith("TRAINBENCH "):
                d = json.loads(line[len("TRAINBENCH "):])
                return (d["step_s"], d["compile_s"], d["warmup_s"],
                        d.get("xla_flops"))
    except subprocess.TimeoutExpired:
        pass
    return None, None, None, None


def bench_serving_guarded(timeout_s=1500):
    """Serving p50/p99 + scenes/s under concurrent micro-batched load,
    artifact vs live (benchmarks/serving_bench.py), in a bounded
    subprocess so a slow AOT export can't kill the benchmark."""
    import subprocess

    script = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "serving_bench.py",
    )
    try:
        r = subprocess.run(
            [sys.executable, script], capture_output=True, text=True,
            timeout=timeout_s,
        )
        for line in r.stdout.splitlines()[::-1]:
            if line.startswith("{"):
                return json.loads(line)
    except (subprocess.TimeoutExpired, json.JSONDecodeError):
        pass
    return None


def bench_host_pipeline():
    """Ingestion: batches/s through PaddedBatcher + Prefetcher, for the
    device-resident patch-bank feed (the default train path) and the
    host-assembly fallback."""
    import jax

    from mggan_tpu.data.batcher import PaddedBatcher
    from mggan_tpu.data.patch_bank import DevicePatchBank
    from mggan_tpu.data.prefetch import Prefetcher
    from mggan_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(num_windows=2048, max_peds=P, seed=0)
    rates = {}
    for name, kw in (
        ("bank", dict(patch_bank=DevicePatchBank(ds, max_peds=P))),
        ("host", dict()),
    ):
        import jax.numpy as jnp

        def sync(b):  # value fetch = the only real fence through the tunnel
            if name == "bank":
                float(jnp.sum(b["big_patches"].astype(jnp.int32)))

        loader = PaddedBatcher(ds, batch_size=S_TRAIN, shuffle=True, **kw)
        for batch in loader:  # warmup: bank HBM upload + gather compile
            pass
        sync(batch)
        n_batches = 0
        t0 = time.perf_counter()
        for _ in range(3):
            for batch in Prefetcher(loader):
                n_batches += 1
        sync(batch)
        dt = time.perf_counter() - t0
        rates[name] = n_batches / dt
    return rates


def _load_committed_json(name):
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks", name)
    if os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f)
        except json.JSONDecodeError:
            pass
    return None


def main():
    import jax.numpy as jnp

    traj_per_sec = bench_sampling()
    traj_per_sec_bf16 = bench_sampling(compute_dtype=jnp.bfloat16)
    stages = bench_stages()
    # decode dispatch-corrected headroom from the committed closure run
    # (benchmarks/decode_roofline.py — VERDICT r4 #3)
    dr = _load_committed_json("decode_roofline.json")
    if dr and "select" in dr:
        d = stages["decode"]
        d["dispatch_ms"] = dr["select"]["dispatch_ms"]
        d["sol_x_dispatch_corrected"] = round(
            max(d["ms"] - d["dispatch_ms"], 0.0) / d["sol_ms"], 1)
    # First cold process populates the persistent compilation cache; a
    # second cold process re-lowering the identical program measures the
    # cached cold-start (VERDICT r3 #6 — works through axon, BASELINE.md).
    cache_dir = os.path.join(
        tempfile.gettempdir(), "mggan_bench_jaxcache")
    step_s, compile_s, warmup_s, xla_flops = bench_train_step_guarded(
        cache_dir=cache_dir)
    _, compile_cached_s, warmup_cached_s, _ = bench_train_step_guarded(
        timeout_s=600, cache_dir=cache_dir, n_iters=0)
    serving = bench_serving_guarded()
    pipe = bench_host_pipeline()

    extra = {
        "sampling_bf16_traj_per_sec": round(traj_per_sec_bf16, 1),
        "decode_mfu_pct": stages["decode"]["mfu_pct"],
        "cnn_mfu_pct": stages["cnn_f32"]["mfu_pct"],
        "cnn_bf16_mfu_pct": stages["cnn_bf16"]["mfu_pct"],
        "stages": stages,
        "pipeline_bank_batches_per_sec": round(pipe["bank"], 2),
        "pipeline_bank_agents_per_sec": round(pipe["bank"] * S_TRAIN * P, 1),
        "pipeline_hostassembly_batches_per_sec": round(pipe["host"], 2),
    }
    if serving is not None:
        extra["serving"] = serving
    if step_s is not None:
        agents_per_sec = S_TRAIN * P / step_s
        extra.update(
            train_step_ms_4096_agents=round(step_s * 1e3, 3),
            train_agents_per_sec=round(agents_per_sec, 1),
            train_compile_s=round(compile_s, 1),
            session_warmup_s=round(warmup_s, 1),
        )
        if compile_cached_s is not None:
            # full cold-process cost to a ready train step, cache warm
            extra["cold_start_cached_s"] = round(
                warmup_cached_s + compile_cached_s, 1)
            extra["train_compile_cached_s"] = round(compile_cached_s, 1)
        if xla_flops:
            from mggan_tpu.config import Config
            from mggan_tpu.utils import roofline

            d = Config()  # flagship defaults used by _flagship_config
            rows_g = S_TRAIN * P * d.num_samples          # G-step, fwd+bwd
            rows_d = S_TRAIN * P * (1 + d.num_expectation_samples)  # D + PM
            tf = roofline.train_step_flops(
                xla_flops, g=4, h=32, in_dim=2, soc_f=32,
                rows_g=rows_g, rows_d=rows_d, pred_len=12)
            # min bytes: the dominant guaranteed HBM traffic is the train
            # kernel's (h, c) residual stream (write fwd + read bwd);
            # batch + 3x params are minor adders. A lower bound by design.
            resid = 2 * rows_g * 12 * 2 * 4 * 32 * 4
            extra["train_roofline"] = {
                "xla_flops": xla_flops, "pallas_flops": tf["pallas"],
                **roofline.stage_report(tf["executed"], resid, step_s),
            }
            extra["train_mfu_pct"] = extra["train_roofline"]["mfu_pct"]
            # dispatch-corrected headroom: the fixed per-step tunnel cost
            # measured by benchmarks/train_dispatch_floor.py (committed
            # JSON; a property of the dispatch path, stable across runs)
            # subtracted from the LIVE step time before comparing to SoL
            floor = _load_committed_json("train_dispatch_floor.json")
            if floor and floor.get("dispatch_ms") is not None:
                tr = extra["train_roofline"]
                tr["dispatch_ms"] = floor["dispatch_ms"]
                tr["sol_x_dispatch_corrected"] = round(
                    max(step_s - floor["dispatch_ms"] / 1e3, 0.0)
                    / (tr["sol_ms"] / 1e3), 1)
    else:
        agents_per_sec = None
        extra["train_bench"] = "timed out (remote compile service)"
    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "ref_torch_cpu.json",
    )
    if os.path.exists(ref_path) and agents_per_sec is not None:
        with open(ref_path) as f:
            ref = json.load(f)
        extra["ref_torch_cpu_step_s"] = ref["step_seconds"]
        extra["ref_torch_cpu_agents_per_sec"] = ref["agents_per_sec"]
        extra["train_speedup_vs_ref_torch_cpu"] = round(
            agents_per_sec / ref["agents_per_sec"], 1
        )
        extra["ref_caveat"] = ref.get("caveat", "")

    full = {
        "metric": "k20_sampling_throughput",
        "value": round(traj_per_sec, 1),
        "unit": "traj/s",
        "vs_baseline": round(traj_per_sec / 100_000.0, 3),
        "extra": extra,
    }
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "bench_full.json",
    )
    with open(full_path, "w") as f:
        json.dump(full, f, indent=2)
        f.write("\n")
    print("full extras written to", full_path)
    # the LAST stdout line is the compact driver contract — nothing may
    # print after this
    print(summary_line(traj_per_sec, extra))


if __name__ == "__main__":
    main()
