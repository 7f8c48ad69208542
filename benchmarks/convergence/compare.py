"""Render the convergence-parity comparison table from the two runners'
results.json files.

    python benchmarks/convergence/compare.py \
        --ref /tmp/mggan_convergence/ref/results.json \
        --ours /tmp/mggan_convergence/ours/results.json \
        [--out benchmarks/convergence/results_summary.json]

Prints a markdown table (metric x framework) per strategy and writes a
machine-readable summary with relative deltas (ours vs reference; negative
delta = ours better on ADE/FDE, positive better on Mode).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

LOWER_IS_BETTER = ("ADE", "FDE")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/mggan_convergence/ref/results.json")
    ap.add_argument("--ours", default="/tmp/mggan_convergence/ours/results.json")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    ref = json.loads(Path(args.ref).read_text())
    ours = json.loads(Path(args.ours).read_text())

    assert ref["config"] == ours["config"], (
        f"hyperparameters differ: {ref['config']} vs {ours['config']}"
    )

    summary = {"config": ref["config"],
               "train_seconds": {"reference": ref["train_seconds"],
                                 "ours": ours["train_seconds"]},
               "strategies": {}}
    for strat in ref["test_metrics"]:
        if strat not in ours["test_metrics"]:
            continue
        rm, om = ref["test_metrics"][strat], ours["test_metrics"][strat]
        keys = [k for k in rm if k in om]
        print(f"\n### strategy: {strat}\n")
        print("| metric | reference (torch) | mggan_tpu | delta |")
        print("|---|---|---|---|")
        rows = {}
        for k in sorted(keys):
            rv, ov = rm[k], om[k]
            delta = (ov - rv) / rv if rv else float("nan")
            better = (ov <= rv) if k.startswith(LOWER_IS_BETTER) else (ov >= rv)
            mark = "ours" if better else "ref"
            print(f"| {k} | {rv:.4f} | {ov:.4f} | {delta:+.1%} ({mark}) |")
            rows[k] = {"reference": rv, "ours": ov, "rel_delta": delta}
        summary["strategies"][strat] = rows

    print(f"\ntrain wall: reference {ref['train_seconds']:.0f}s, "
          f"ours {ours['train_seconds']:.0f}s")
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=2))
        print("wrote", args.out)


if __name__ == "__main__":
    main()
