"""Train + evaluate mggan_tpu on the shared convergence dataset and dump the
same JSON schema as run_reference.py.

Drives the real user surfaces — ``mggan_tpu.cli.train.main`` and the eval
stack (`get_predictions_multi` + `evaluate_ade_fde`) — with hyperparameters
identical to the reference runner. Defaults to CPU so the comparison is
hardware-independent and reproducible on this host (pass --platform tpu to
run on the chip instead; metric values are the comparison, wall time is
reported separately per framework).

    python benchmarks/convergence/run_ours.py \
        --data /tmp/mggan_convergence --out /tmp/mggan_convergence/ours
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/mggan_convergence")
    ap.add_argument("--out", default="/tmp/mggan_convergence/ours")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_gens", type=int, default=2)
    ap.add_argument("--num_samples", type=int, default=8)
    ap.add_argument("--val_every", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--eval_ks", type=int, nargs="+", default=[1, 5, 10, 20])
    ap.add_argument("--strategies", nargs="+",
                    default=["sampling", "expected", "smart_expected"])
    ap.add_argument("--extra", nargs="*", default=[], metavar="KEY=VALUE",
                    help="additional shared flags (mirror run_reference.py)")
    args = ap.parse_args()
    extra = dict(kv.split("=", 1) for kv in args.extra)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    data_root = str(Path(args.data) / "data" / "datasets")

    from mggan_tpu.cli import train as train_cli

    t0 = time.time()
    train_cli.main(
        [
            "--dataset", "eth",
            "--data_root", data_root,
            "--augment", "0",
            "--epochs", str(args.epochs),
            "--batch_size", str(args.batch_size),
            "--num_gens", str(args.num_gens),
            "--num_samples", str(args.num_samples),
            "--val_every", str(args.val_every),
            "--save_every", str(max(args.epochs, 1)),
            "--seed", str(args.seed),
            "--name", "convergence_ours",
            "--log_dir", str(out_dir / "logs"),
        ]
        # "key=" (empty value) means a value-less store_true flag
        # (e.g. --unconditional on both argparsers)
        + [t for k, v in extra.items()
           for t in ((f"--{k}", v) if v != "" else (f"--{k}",))]
    )
    train_s = time.time() - t0
    print(f"mggan_tpu training: {train_s:.1f}s for {args.epochs} epochs")

    # locate the version dir the writer created: version ids are random
    # (test_tube semantics), so lexicographic order is meaningless — pick
    # the newest by mtime (the run that just finished)
    experiment = extra.get("experiment", "multi_generator")
    exp_dir = out_dir / "logs" / experiment / "convergence_ours"
    version_dirs = sorted(exp_dir.glob("version_*"),
                          key=lambda p: p.stat().st_mtime)
    assert version_dirs, f"no version dir under {exp_dir}"
    version_dir = version_dirs[-1]

    from mggan_tpu.data.loaders import get_dataloader
    from mggan_tpu.eval.evaluate import evaluate_ade_fde, get_predictions_multi
    from mggan_tpu.eval.manifold import evaluate_precision_recall
    from mggan_tpu.training.loop import Trainer

    trainer, config = Trainer.load_from_path(version_dir, "best")
    loader = get_dataloader("eth", "test", batch_size=32, data_root=data_root)
    preds_by_strat = get_predictions_multi(
        trainer.predictor(), loader, max(args.eval_ks),
        strategies=tuple(args.strategies),
    )
    results = {}
    for strat in args.strategies:
        m = dict(evaluate_ade_fde(loader.ds, preds_by_strat[strat], args.eval_ks))
        try:
            m.update(evaluate_precision_recall(
                loader.ds, preds_by_strat[strat], 3.0, args.eval_ks))
        except Exception as e:  # pragma: no cover
            print("precision/recall failed:", e)
        results[strat] = {k: float(v) for k, v in m.items()}
        print(strat, results[strat])

    # epoch log from the writer's metrics CSV/JSONL
    epoch_log = []
    metrics_file = version_dir / "metrics.jsonl"
    if metrics_file.exists():
        for line in metrics_file.read_text().splitlines():
            epoch_log.append(json.loads(line))

    out = {
        "framework": "mggan_tpu-" + args.platform,
        "config": {
            "epochs": args.epochs, "batch_size": args.batch_size,
            "num_gens": args.num_gens, "num_samples": args.num_samples,
            "seed": args.seed, **extra,
        },
        "train_seconds": train_s,
        "epoch_log": epoch_log,
        "test_metrics": results,
        "version_dir": str(version_dir),
    }
    with open(out_dir / "results.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", out_dir / "results.json")


if __name__ == "__main__":
    main()
