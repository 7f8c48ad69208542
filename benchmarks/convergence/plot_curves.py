"""Plot the convergence-parity learning curves (val ADE k=20 vs epoch) for
every results.json pair and save a PNG next to the results.

    python benchmarks/convergence/plot_curves.py \
        [--results benchmarks/convergence/results/reference.json \
                   benchmarks/convergence/results/ours.json] \
        [--out benchmarks/convergence/results/curves.png]

Styling follows the dataviz method: change-over-time -> line form, one axis,
categorical identity colors from the validated default palette (slots 1-2 of
the documented fixed order, which passes the adjacency gates in light mode),
thin 2px lines with >=8px markers on the sparse validation points, legend +
direct end labels, recessive grid, text in ink tokens (never series color).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

# validated default palette (dataviz references/palette.md, light mode),
# fixed slot order 1-3 (blue, orange, aqua) — never cycled past the data
SERIES = ["#2a78d6", "#eb6834", "#1baf7a"]
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
GRID = "#e4e3e0"

VAL_KEY = "val/ADE k=20"


def _curve(results):
    xs, ys = [], []
    for row in results.get("epoch_log", []):
        if VAL_KEY in row:
            xs.append(row["epoch"])
            ys.append(row[VAL_KEY])
    return xs, ys


def main():
    ap = argparse.ArgumentParser()
    here = Path(__file__).parent
    ap.add_argument("--results", nargs="+", default=[
        str(here / "results" / "reference.json"),
        str(here / "results" / "ours.json"),
    ])
    ap.add_argument("--labels", nargs="+", default=None,
                    help="override the per-file legend labels")
    ap.add_argument("--out", default=str(here / "results" / "curves.png"))
    ap.add_argument("--title",
                    default="Validation ADE k=20 — identical data & hyperparameters")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = [json.loads(Path(p).read_text()) for p in args.results]
    labels = {
        "reference-torch-cpu": "reference (PyTorch)",
        "mggan_tpu-cpu": "mggan_tpu",
        "mggan_tpu-tpu": "mggan_tpu",
    }

    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    for i, run in enumerate(runs):
        xs, ys = _curve(run)
        if not xs:
            continue
        if args.labels:
            name = args.labels[i]
        else:
            name = labels.get(run["framework"], run["framework"])
        c = SERIES[i % len(SERIES)]
        ax.plot(xs, ys, color=c, linewidth=2, marker="o", markersize=4.5,
                label=name, zorder=3)
        # selective direct label at the curve end, ink does the text
        ax.annotate(f"{ys[-1]:.2f}", (xs[-1], ys[-1]),
                    textcoords="offset points", xytext=(6, -2),
                    color=INK_2, fontsize=8.5, zorder=4)

    ax.set_title(args.title, color=INK, fontsize=11, loc="left")
    ax.set_xlabel("epoch", color=INK_2, fontsize=9.5)
    ax.set_ylabel("val ADE k=20 (m)", color=INK_2, fontsize=9.5)
    ax.tick_params(colors=INK_2, labelsize=8.5)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.grid(True, color=GRID, linewidth=0.7, zorder=0)
    ax.set_ylim(bottom=0)
    leg = ax.legend(frameon=False, fontsize=9, loc="upper right")
    for t in leg.get_texts():
        t.set_color(INK)

    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
