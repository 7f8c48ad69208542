"""The bench -> driver reporting contract (VERDICT r4 weak #1).

The driver captures only the tail of bench.py's stdout and json-parses the
LAST line; round 4 lost the headline metric because the single JSON line
outgrew that window. These tests pin the fix: ``bench.summary_line`` must
stay under ``SUMMARY_LINE_MAX`` chars for any plausible extras payload and
must carry the headline fields.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _bloated_extra():
    """Worst-case extras: every whitelisted key present with wide floats,
    plus the full round-4-sized payload of non-whitelisted junk that must
    NOT leak into the summary line."""
    extra = {
        "sampling_bf16_traj_per_sec": 14871234.8,
        "train_step_ms_4096_agents": 40.951,
        "train_agents_per_sec": 100022.2,
        "train_mfu_pct": 9.3512345,
        "train_compile_s": 19.8,
        "cold_start_cached_s": 63.7,
        "decode_mfu_pct": 19.6312345,
        "cnn_bf16_mfu_pct": 4.99,
        "train_speedup_vs_ref_torch_cpu": 909292.9,
        "pipeline_bank_agents_per_sec": 979125.8,
        "train_roofline": {
            "xla_flops": 121321144320.0,
            "pallas_flops": 632836587520,
            "sol_x": 10.7,
            "dispatch_ms": 20.123456,
            "sol_x_dispatch_corrected": 5.4321,
        },
        "stages": {
            "decode": {"ms": 63.85, "sol_x": 5.0987, "mfu_pct": 19.63},
            "cnn_f32": {"ms": 25.1, "sol_x": 17.5},
        },
        "serving": {
            "live": {"load_latency_ms_p50": 562.95,
                     "load_latency_ms_p99": 642.16},
            "bucketed": {"buckets": [1, 64], "latency_ms_p50": 34.13},
            "mixed": {"latency_ms_p50": 48.12345,
                      "latency_ms_p99": 120.54321,
                      "scenes_per_sec": 55.5},
        },
        # junk that must be excluded (simulates the r4 overflow)
        "ref_caveat": "x" * 600,
        "per_k_tables": {f"k{k}": [0.123456789] * 20 for k in range(1, 21)},
    }
    return extra


def test_summary_line_fits_driver_window():
    line = bench.summary_line(14871234.8, _bloated_extra())
    assert len(line) <= bench.SUMMARY_LINE_MAX
    assert "\n" not in line


def test_summary_line_carries_headline_fields():
    line = bench.summary_line(14871234.8, _bloated_extra())
    d = json.loads(line)
    assert d["metric"] == "k20_sampling_throughput"
    assert d["value"] == 14871234.8
    assert d["unit"] == "traj/s"
    assert d["vs_baseline"] == round(14871234.8 / 100_000.0, 3)
    e = d["extra"]
    assert e["full_results"] == "benchmarks/bench_full.json"
    assert e["train_agents_per_sec"] == 100022.2
    assert e["train_mfu_pct"] == 9.351
    assert e["serving_mixed_latency_ms_p50"] == 48.123
    assert e["train_roofline_dispatch_ms"] == 20.123
    # junk is whitelisted out
    assert "ref_caveat" not in e
    assert "per_k_tables" not in e


def test_summary_line_tolerates_missing_extras():
    # a timed-out train bench leaves most extras absent — the line must
    # still emit and parse
    line = bench.summary_line(1.0, {})
    d = json.loads(line)
    assert d["value"] == 1.0
    assert d["extra"]["full_results"] == "benchmarks/bench_full.json"


def test_whitelist_is_bounded():
    # every key budgeted at <= ~45 chars name + ~22 chars value keeps the
    # worst-case line under the cap with ~4x margin on growth; this guard
    # fails loudly if someone grows the whitelist past the budget
    assert len(bench.SUMMARY_KEYS) <= 24


def test_seed_band_aggregator_reproduces_wt_mgan_bands():
    """seed_band.py (benchmarks/convergence/) must reproduce the n=8
    wt_mgan bands BASELINE.md quotes from the checked-in summaries."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "convergence"))
    import seed_band  # noqa: E402

    cells = seed_band.collect(cell_filter="wt_mgan")
    ours = cells["wt_mgan"]["mggan_tpu-cpu"]
    ref = cells["wt_mgan"]["reference-torch-cpu"]
    assert len(ours) == 8 and len(ref) == 8
    # best seeds tie at 0.773; the reference's tail seed is s6=1.314
    assert round(min(ours.values()), 3) == 0.773
    assert round(min(ref.values()), 3) == 0.773
    assert round(ref[6], 3) == 1.314


def test_summary_line_degrades_instead_of_crashing():
    """An oversized whitelisted value must not lose the headline (the r4
    failure mode): summary_line drops trailing extras until it fits."""
    extra = _bloated_extra()
    extra["train_step_ms_4096_agents"] = "x" * (bench.SUMMARY_LINE_MAX + 100)
    line = bench.summary_line(13_000_000.0, extra)
    assert len(line) <= bench.SUMMARY_LINE_MAX
    parsed = json.loads(line)
    assert parsed["metric"] == "k20_sampling_throughput"
    assert parsed["extra"]["full_results"] == "benchmarks/bench_full.json"
