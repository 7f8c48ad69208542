"""Evaluate a model TRAINED IN mggan_tpu with the REFERENCE's own code.

Closes the interop loop: run_ours.py trains a model; this script exports its
version dir as a reference-format torch checkpoint (cli/convert.py
--reverse), loads it through the reference's
``PiNetMultiGeneratorGAN.load_from_path`` (abstract_train.py:250-296), and
runs the reference's ``get_predictions`` + ``evaluate_ade_fde`` +
``evaluate_precision_recall`` on the shared test set. If the exported
weights reproduce comparable metrics under the reference's independent
implementation, weight-level interop is proven on REAL trained weights (not
just the synthesized twins of tests/test_torch_export.py).

    python benchmarks/convergence/eval_ours_in_reference.py \
        --ours /tmp/mggan_convergence/ours [--data /tmp/mggan_convergence]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root
sys.path.insert(0, str(Path(__file__).resolve().parent))

import run_reference  # noqa: E402  (stub installer + spec-bug patch)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--data", default="/tmp/mggan_convergence")
    ap.add_argument("--ours", default="/tmp/mggan_convergence/ours",
                    help="run_ours.py --out dir (reads results.json)")
    ap.add_argument("--eval_ks", type=int, nargs="+", default=[1, 5, 10, 20])
    ap.add_argument("--strategies", nargs="+",
                    default=["sampling", "expected", "smart_expected"])
    args = ap.parse_args()

    ours = json.loads((Path(args.ours) / "results.json").read_text())
    version_dir = ours["version_dir"]
    out_dir = Path(args.ours) / "exported_ref_format"

    # 1) export our trained version dir as a reference-format torch dir
    #    (CPU jax is enough to read the orbax checkpoint)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mggan_tpu.cli.convert import export_torch_checkpoint

    ref_vdir = export_torch_checkpoint(version_dir, out_dir)

    # 2) load + evaluate with the reference's code
    sys.path.insert(0, args.ref)
    import torch

    torch.set_num_threads(1)
    run_reference._OUT_DIR = Path(args.ours) / "ref_eval_scratch"
    run_reference._OUT_DIR.mkdir(parents=True, exist_ok=True)
    run_reference.install_stubs()

    import mggan.data_utils.experiments as experiments

    experiments.root_path = Path(args.data)

    import mggan.metrics as ref_metrics
    import mggan.evaluation as ref_evaluation

    orig_cmfb = ref_metrics.compute_metrics_from_batch

    def fixed_cmfb(preds, gt, sub_batches, mode="mean", mode_thresh=3.0):
        if mode is None and mode_thresh == "raw":
            mode, mode_thresh = "raw", 3.0
        return orig_cmfb(preds, gt, sub_batches, mode, mode_thresh)

    ref_metrics.compute_metrics_from_batch = fixed_cmfb
    ref_evaluation.compute_metrics_from_batch = fixed_cmfb

    from mggan.model.train import PiNetMultiGeneratorGAN
    from mggan.data_utils.data_loaders import get_dataloader
    from mggan.evaluation import evaluate_ade_fde, evaluate_precision_recall

    model, config = PiNetMultiGeneratorGAN.load_from_path(ref_vdir, "best")
    model.G.eval()
    model.D.eval()
    torch.set_grad_enabled(False)
    test_loader = get_dataloader("eth", "test", batch_size=32, shuffle=False)

    results = {}
    for strat in args.strategies:
        preds = model.get_predictions(test_loader, max(args.eval_ks),
                                      strategy=strat)
        m = dict(evaluate_ade_fde(test_loader.dataset, preds, args.eval_ks))
        try:
            m.update(evaluate_precision_recall(
                test_loader.dataset, preds, 3.0, args.eval_ks))
        except Exception as e:  # pragma: no cover
            print("precision/recall failed:", e)
        results[strat] = {k: float(v) for k, v in m.items()}
        print(strat, results[strat])

    out = {
        "framework": "mggan_tpu-weights-in-reference-eval",
        "config": ours["config"],
        "train_seconds": ours["train_seconds"],
        "test_metrics": results,
        "exported_dir": str(ref_vdir),
    }
    path = Path(args.ours) / "results_in_reference.json"
    path.write_text(json.dumps(out, indent=2))
    print("wrote", path)


if __name__ == "__main__":
    main()
