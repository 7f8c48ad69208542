"""Render the convergence-parity comparison table from the runners'
results.json files.

    python benchmarks/convergence/compare.py \
        --results /tmp/mggan_convergence/ref/results.json \
                  /tmp/mggan_convergence/ours/results.json \
                  /tmp/mggan_convergence/ours/results_in_reference.json \
                  /tmp/mggan_convergence/ref/results_in_ours.json \
        [--out benchmarks/convergence/results_summary.json]

Prints one markdown table per strategy (metric x framework column) and
writes a machine-readable summary. The first results file is the baseline
for the relative-delta column of the second (negative = better on ADE/FDE).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

LOWER_IS_BETTER = ("ADE", "FDE")
DEFAULT_RESULTS = [
    "/tmp/mggan_convergence/ref/results.json",
    "/tmp/mggan_convergence/ours/results.json",
    "/tmp/mggan_convergence/ours/results_in_reference.json",
    "/tmp/mggan_convergence/ref/results_in_ours.json",
]


def _metric_sort_key(k):
    name, _, kk = k.partition(" k=")
    return (name, int(kk) if kk else 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", nargs="+", default=DEFAULT_RESULTS)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    runs = []
    for p in args.results:
        if Path(p).is_file():
            runs.append(json.loads(Path(p).read_text()))
        else:
            print(f"(skipping missing {p})")
    assert runs, "need at least one results file"

    # single-run mode (ours-only arms, e.g. probgan — the reference
    # asserts it out of its trainable set): one column, no delta
    base, second = runs[0], runs[1] if len(runs) > 1 else runs[0]
    strip = lambda c: {k: v for k, v in c.items() if k != "seed"}
    assert strip(base["config"]) == strip(second["config"]), (
        f"hyperparameters differ: {base['config']} vs {second['config']}"
    )  # seeds may differ on purpose (GAN run-to-run variance is reported)
    names = [r["framework"] for r in runs]

    summary = {
        "config": base["config"],
        "train_seconds": {r["framework"]: r.get("train_seconds") for r in runs},
        "strategies": {},
    }
    strategies = [s for s in base["test_metrics"] if s in second["test_metrics"]]
    for strat in strategies:
        tables = [r["test_metrics"].get(strat, {}) for r in runs]
        keys = sorted(
            (k for k in tables[0] if all(k in t for t in tables[:2])),
            key=_metric_sort_key,
        )
        print(f"\n### strategy: {strat}\n")
        print("| metric | " + " | ".join(names) + " | delta (2nd vs 1st) |")
        print("|---" * (len(names) + 2) + "|")
        rows = {}
        for k in keys:
            vals = [t.get(k) for t in tables]
            cells = " | ".join("—" if v is None else f"{v:.4f}" for v in vals)
            rows[k] = {n: v for n, v in zip(names, vals)}
            if len(runs) > 1:
                rv, ov = vals[0], vals[1]
                delta = (ov - rv) / rv if rv else float("nan")
                print(f"| {k} | {cells} | {delta:+.1%} |")
                rows[k]["rel_delta"] = delta
            else:
                print(f"| {k} | {cells} | — |")
        summary["strategies"][strat] = rows

    print("\ntrain wall: " + ", ".join(
        f"{r['framework']} {r.get('train_seconds', float('nan')):.0f}s"
        for r in runs if "train_seconds" in r))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=2))
        print("wrote", args.out)


if __name__ == "__main__":
    main()
