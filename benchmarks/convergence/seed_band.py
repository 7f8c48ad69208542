"""Aggregate per-seed convergence summaries into seed-band tables.

Reads every ``results/<cell>[_s<seed>]/summary.json`` (plus the loose
``results/<cell>_s<N>/reference_seed<N>.json`` files some cells carry for
reference-only extra seeds) and prints, per cell and framework, the
per-seed values, band (min-max), median, and mean for a chosen metric —
the numbers BASELINE.md's seed-band section quotes.

Usage:
    python seed_band.py                     # all cells, sampling ADE k=20
    python seed_band.py --cell wt_mgan      # one cell family
    python seed_band.py --metric "FDE k=20" --strategy sampling
"""
import argparse
import json
import re
import statistics
from collections import defaultdict
from pathlib import Path

HERE = Path(__file__).resolve().parent
RESULTS = HERE / "results"


def collect(cell_filter=None, strategy="sampling", metric="ADE k=20"):
    # cells[cell][framework] -> {seed: value}
    cells = defaultdict(lambda: defaultdict(dict))
    for d in sorted(RESULTS.iterdir()):
        if not d.is_dir():
            continue
        m = re.fullmatch(r"(.+?)(?:_s(\d+))?", d.name)
        cell, seed = m.group(1), int(m.group(2) or 0)
        if cell_filter and cell != cell_filter:
            continue
        summ = d / "summary.json"
        if summ.exists():
            s = json.loads(summ.read_text())
            strat = s.get("strategies", {}).get(strategy, {})
            for fw, val in strat.get(metric, {}).items():
                if fw != "rel_delta":
                    cells[cell][fw][seed] = val
        # reference-only extra seeds dropped next to a cell's results
        for extra in d.glob("reference_seed*.json"):
            n = int(re.search(r"(\d+)", extra.name).group(1))
            r = json.loads(extra.read_text())
            val = r["test_metrics"].get(strategy, {}).get(metric)
            if val is not None:
                cells[cell]["reference-torch-cpu"][n] = val
    return cells


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", default=None)
    ap.add_argument("--strategy", default="sampling")
    ap.add_argument("--metric", default="ADE k=20")
    ap.add_argument("--json", action="store_true", help="machine output")
    args = ap.parse_args()

    cells = collect(args.cell, args.strategy, args.metric)
    out = {}
    for cell, fws in sorted(cells.items()):
        out[cell] = {}
        for fw, by_seed in sorted(fws.items()):
            vals = [by_seed[s] for s in sorted(by_seed)]
            out[cell][fw] = {
                "seeds": {s: round(by_seed[s], 3) for s in sorted(by_seed)},
                "band": [round(min(vals), 3), round(max(vals), 3)],
                "median": round(statistics.median(vals), 3),
                "mean": round(statistics.mean(vals), 3),
                "n": len(vals),
            }
    if args.json:
        print(json.dumps(out, indent=1))
        return
    for cell, fws in out.items():
        print(f"== {cell} ({args.strategy} {args.metric})")
        for fw, r in fws.items():
            seeds = " ".join(f"s{s}={v}" for s, v in r["seeds"].items())
            print(f"  {fw:22s} n={r['n']} band={r['band'][0]}-{r['band'][1]}"
                  f" median={r['median']} mean={r['mean']}  [{seeds}]")


if __name__ == "__main__":
    main()
