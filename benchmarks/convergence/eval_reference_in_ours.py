"""Evaluate the model TRAINED BY THE REFERENCE with OUR eval stack.

Mirror of eval_ours_in_reference.py, closing the interop loop in the other
direction: run_reference.py leaves reference-format checkpoints
(checkpoint_best.pth) in its --out dir; this script converts them into one
of our version dirs (cli/convert.py forward direction, with the shared
experiment hyperparameters passed as --set overrides since the stub writer
does not produce meta_tags.csv) and runs our Predictor + metric stack on
the shared test set.

    python benchmarks/convergence/eval_reference_in_ours.py \
        --ref_out /tmp/mggan_convergence/ref [--data /tmp/mggan_convergence]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/mggan_convergence")
    ap.add_argument("--ref_out", default="/tmp/mggan_convergence/ref",
                    help="run_reference.py --out dir (reads results.json)")
    ap.add_argument("--checkpoint", default="checkpoint_best")
    ap.add_argument("--eval_ks", type=int, nargs="+", default=[1, 5, 10, 20])
    ap.add_argument("--strategies", nargs="+",
                    default=["sampling", "expected", "smart_expected"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    ref = json.loads((Path(args.ref_out) / "results.json").read_text())
    cfg = ref["config"]
    pth = Path(args.ref_out) / "checkpoints" / f"{args.checkpoint}.pth"
    assert pth.is_file(), pth

    from mggan_tpu.cli.convert import convert_torch_checkpoint

    # the shared hyperparameters run_reference.py trained with (its stub
    # writer does not emit meta_tags.csv, so pass them explicitly); extra
    # flags recorded in the results config (e.g. experiment=discrete) pass
    # through, string-coerced like meta_tags values would be
    from mggan_tpu.utils.logging import _convert

    overrides = {
        "name": "convergence_ref_imported",
        "dataset": "eth",
        "augment": 0,
        "data_root": str(Path(args.data) / "data" / "datasets"),
    }
    for k, v in cfg.items():
        if k != "seed":
            overrides[k] = _convert(v) if isinstance(v, str) else v
    vdir = convert_torch_checkpoint(
        pth, Path(args.ref_out) / "imported_ours_format",
        overrides=overrides, checkpoint_name="checkpoint_best",
    )

    from mggan_tpu.data.loaders import get_dataloader
    from mggan_tpu.eval.evaluate import evaluate_ade_fde, get_predictions_multi
    from mggan_tpu.eval.manifold import evaluate_precision_recall
    from mggan_tpu.training.loop import Trainer

    trainer, config = Trainer.load_from_path(vdir, "best")
    loader = get_dataloader(
        "eth", "test", batch_size=32,
        data_root=str(Path(args.data) / "data" / "datasets"),
    )
    preds_by_strat = get_predictions_multi(
        trainer.predictor(), loader, max(args.eval_ks),
        strategies=tuple(args.strategies),
    )
    results = {}
    for strat in args.strategies:
        m = dict(evaluate_ade_fde(loader.ds, preds_by_strat[strat],
                                  args.eval_ks))
        try:
            m.update(evaluate_precision_recall(
                loader.ds, preds_by_strat[strat], 3.0, args.eval_ks))
        except Exception as e:  # pragma: no cover
            print("precision/recall failed:", e)
        results[strat] = {k: float(v) for k, v in m.items()}
        print(strat, results[strat])

    out = {
        "framework": "reference-weights-in-mggan_tpu-eval",
        "config": cfg,
        "train_seconds": ref["train_seconds"],
        "test_metrics": results,
        "imported_dir": str(vdir),
    }
    path = Path(args.ref_out) / "results_in_ours.json"
    path.write_text(json.dumps(out, indent=2))
    print("wrote", path)


if __name__ == "__main__":
    main()
