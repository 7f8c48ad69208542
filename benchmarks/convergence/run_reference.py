"""Train + evaluate the REFERENCE (torch CPU) on the shared convergence
dataset (make_dataset.py) and dump its metric table as JSON.

This drives the reference's own code end-to-end — ``construct_model`` →
``PiNetMultiGeneratorGAN.train()`` (abstract_train.py:87-231) →
``get_predictions`` + ``evaluate_ade_fde`` (scripts/evaluate.py:153-163) —
with the minimal runtime shims its 2020-era environment needs here:

* ``test_tube``/``shapely`` import stubs (not installed; writer surface is
  name/version/get_data_path/log/save — same stubbing approach as
  benchmarks/ref_torch_step.py),
* ``np.int`` and ``Image.ANTIALIAS`` aliases (removed by modern
  numpy/Pillow; trajectories_scene.py:184, BaseTrajectories.py:92),
* ``experiments.root_path`` pointed at the generated dataset root (the
  module-global resolves inside the read-only reference checkout,
  experiments.py:11),
* the SURVEY-documented spec bug in ``evaluate_ade_fde``
  (evaluation.py:64-70 passes the vestigial ``None, "raw"`` so
  ``mode_thresh`` becomes the *string* "raw"; metrics.py:136 then compares
  tensor-vs-str, a hard TypeError on modern torch): patched to the
  documented intent ``mode="raw", mode_thresh=3.0`` — exactly what our
  framework implements (mggan_tpu/eval/evaluate.py).

No reference code is modified on disk; everything is monkeypatched in this
process. Usage:

    python benchmarks/convergence/run_reference.py \
        --data /tmp/mggan_convergence --out /tmp/mggan_convergence/ref \
        --epochs 30 [shared hyperparameter flags...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types
from pathlib import Path


def install_stubs():
    import numpy as np
    from PIL import Image

    if not hasattr(np, "int"):
        np.int = int
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "bool"):
        np.bool = bool
    if not hasattr(Image, "ANTIALIAS"):
        Image.ANTIALIAS = Image.LANCZOS

    mod = types.ModuleType("test_tube")

    class Experiment:
        def __init__(self, *a, **k):
            self.name, self.version = "convergence_ref", 0

        def get_data_path(self, name, version):
            return str(_OUT_DIR)

        def log(self, metrics, epoch):
            _LOGGED.append({"epoch": epoch, **{k: float(v) for k, v in metrics.items()}})

        def save(self):
            pass

    class HyperOptArgumentParser(argparse.ArgumentParser):
        def __init__(self, *a, strategy=None, **k):
            super().__init__(*a, **k)

        def opt_list(self, *args, options=None, tunable=None, **kwargs):
            return self.add_argument(*args, **kwargs)

    mod.Experiment = Experiment
    mod.HyperOptArgumentParser = HyperOptArgumentParser
    sys.modules["test_tube"] = mod

    shp = types.ModuleType("shapely")
    geom = types.ModuleType("shapely.geometry")
    geom.Polygon = object
    geom.MultiPolygon = object
    ops = types.ModuleType("shapely.ops")
    ops.unary_union = lambda *a, **k: None
    shp.geometry, shp.ops = geom, ops
    shp.__path__ = []
    sys.modules.setdefault("shapely", shp)
    sys.modules.setdefault("shapely.geometry", geom)
    sys.modules.setdefault("shapely.ops", ops)
    return mod


_LOGGED = []
_OUT_DIR = None


def main():
    global _OUT_DIR
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--data", default="/tmp/mggan_convergence")
    ap.add_argument("--out", default="/tmp/mggan_convergence/ref")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_gens", type=int, default=2)
    ap.add_argument("--num_samples", type=int, default=8)
    ap.add_argument("--val_every", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval_ks", type=int, nargs="+", default=[1, 5, 10, 20])
    ap.add_argument("--strategies", nargs="+",
                    default=["sampling", "expected", "smart_expected"])
    ap.add_argument("--extra", nargs="*", default=[], metavar="KEY=VALUE",
                    help="additional shared flags passed to the trainer "
                         "(e.g. --extra experiment=discrete gan_type=mgan); "
                         "recorded in the results config for comparability")
    args = ap.parse_args()
    extra = dict(kv.split("=", 1) for kv in args.extra)

    _OUT_DIR = Path(args.out)
    _OUT_DIR.mkdir(parents=True, exist_ok=True)

    sys.path.insert(0, args.ref)

    import torch

    torch.set_num_threads(1)
    tt = install_stubs()

    import mggan.data_utils.experiments as experiments

    experiments.root_path = Path(args.data)  # module global read at class init

    # --- spec-bug patch: evaluate_ade_fde's vestigial (None, "raw") args ---
    import mggan.metrics as ref_metrics
    import mggan.evaluation as ref_evaluation

    orig_cmfb = ref_metrics.compute_metrics_from_batch

    def fixed_cmfb(preds, gt, sub_batches, mode="mean", mode_thresh=3.0):
        if mode is None and mode_thresh == "raw":
            mode, mode_thresh = "raw", 3.0
        return orig_cmfb(preds, gt, sub_batches, mode, mode_thresh)

    ref_metrics.compute_metrics_from_batch = fixed_cmfb
    ref_evaluation.compute_metrics_from_batch = fixed_cmfb

    from mggan.model.config import get_parser
    from mggan.model.model_factory import construct_model
    from mggan.model.train import PiNetMultiGeneratorGAN
    from mggan.data_utils.data_loaders import get_dataloader
    from mggan.evaluation import evaluate_ade_fde, evaluate_precision_recall

    cfg = get_parser().parse_args(
        [
            "--dataset", "eth",
            "--gpus", "",          # "0" is truthy -> would select cuda
            "--augment", "0",
            "--epochs", str(args.epochs),
            "--batch_size", str(args.batch_size),
            "--num_gens", str(args.num_gens),
            "--num_samples", str(args.num_samples),
            "--val_every", str(args.val_every),
            "--save_every", str(max(args.epochs, 1)),
            "--name", "convergence_ref",
        ]
        # "key=" (empty value) means a value-less store_true flag
        # (e.g. --unconditional on both argparsers)
        + [t for k, v in extra.items()
           for t in ((f"--{k}", v) if v != "" else (f"--{k}",))]
    )

    torch.manual_seed(args.seed)
    import numpy as np

    np.random.seed(args.seed)

    G, D = construct_model(cfg)
    model = PiNetMultiGeneratorGAN(G, D, cfg, tt.Experiment())

    if cfg.gan_obj == "W":
        # --- spec-bug patch #2: the reference's gan_obj=W is dead code —
        # calc_gradient_penalty (utils.py:42-68) calls netD(*inputs) without
        # the required seq_start_end (TypeError), and under gan_type=mgan/
        # infogan D returns a tuple so .size() would crash next. Minimal
        # repair keeping the reference's GP math as written: remember each
        # real D call's (seq_start_end, img, mask), inject them into the GP
        # call, and take scores from the tuple.
        import mggan.model.train as ref_train
        import mggan.utils as ref_utils
        from torch import autograd

        d_ctx = {}
        orig_D_forward = type(model.D).forward

        def recording_forward(self, in_xy, in_dxdy, pred_xy, pred_dxdy,
                              seq_start_end, *a, **kw):
            d_ctx["sse"] = seq_start_end
            d_ctx["img"] = kw.get("img")
            d_ctx["mask"] = kw.get("mask")
            return orig_D_forward(self, in_xy, in_dxdy, pred_xy, pred_dxdy,
                                  seq_start_end, *a, **kw)

        type(model.D).forward = recording_forward

        def patched_gp(netD, in_xy, in_dxdy, gt_xy, gt_dxdy, pred_xy,
                       pred_dxdy, gp_lambda=10):
            # Standard WGAN-GP on the interpolated FUTURES. The reference's
            # own norm target (gradients[0] = d D/d in_xy) is identically
            # zero under its default inp_format='rel' (encode() never reads
            # xy, discriminators.py:113-123), so 'as written' would be a
            # constant no-op; this repair matches mggan_tpu's documented
            # 'GP per intent' deviation so both frameworks train the same
            # objective.
            if pred_xy.dim() == 4:  # (T, num_samples=1, b, 2) from the D-step
                pred_xy, pred_dxdy = pred_xy[:, 0], pred_dxdy[:, 0]
            alpha = torch.rand(1, in_xy.size(1), 1)
            inter_xy = (alpha * gt_xy + (1 - alpha) * pred_xy).requires_grad_()
            inter_dxdy = (
                alpha * gt_dxdy + (1 - alpha) * pred_dxdy
            ).requires_grad_()
            inputs = (inter_xy, inter_dxdy)
            out = orig_D_forward(
                netD, in_xy, in_dxdy, inter_xy, inter_dxdy, d_ctx["sse"],
                img=d_ctx["img"], mask=d_ctx["mask"],
            )
            if isinstance(out, tuple):
                out = out[0]
            grads = autograd.grad(
                outputs=out, inputs=inputs,
                grad_outputs=torch.ones(out.size()),
                create_graph=True, retain_graph=True, only_inputs=True,
                allow_unused=True,
            )
            # per-agent norm over the (T, 2)-per-input gradient, matching
            # mggan_tpu's steps.py::_gradient_penalty (inputs are (T, b, 2))
            flat = torch.cat(
                [(g if g is not None else torch.zeros_like(i))
                 .permute(1, 0, 2).flatten(1)
                 for g, i in zip(grads, inputs)], dim=1)
            return ((flat.norm(2, dim=1) - 1) ** 2).mean() * gp_lambda

        ref_train.calc_gradient_penalty = patched_gp
        ref_utils.calc_gradient_penalty = patched_gp

        # W's phi_* collapse to scalars (abstract_train.py:76-79) but
        # generator_step reweights adv_loss ELEMENTWISE (train.py:93-96 —
        # IndexError on a 0-dim tensor); the other three objectives use
        # reduction='none' criteria. Make W elementwise too; the D-step's
        # own .mean() (train.py:157,198) and the G-step's reweight+.mean()
        # then reduce them identically to the intended Wasserstein terms.
        model.phi_1 = lambda dreal, lreal, lfake: -dreal
        model.phi_2 = lambda dfake, lreal, lfake: dfake
        model.phi_3 = lambda dfake, lreal, lfake: -dfake

    t0 = time.time()
    model.train()
    train_s = time.time() - t0
    print(f"reference training: {train_s:.1f}s for {args.epochs} epochs")

    torch.set_grad_enabled(False)
    model.G.eval()
    model.D.eval()
    test_loader = get_dataloader("eth", "test", batch_size=32, shuffle=False)

    results = {}
    for strat in args.strategies:
        preds = model.get_predictions(test_loader, max(args.eval_ks), strategy=strat)
        m = dict(evaluate_ade_fde(test_loader.dataset, preds, args.eval_ks))
        # Manifold math is pure numpy (shapely is plotting-only), so P/R runs
        # under the stub; guard anyway so a failure doesn't lose ADE/FDE.
        try:
            m.update(evaluate_precision_recall(
                test_loader.dataset, preds, 3.0, args.eval_ks))
        except Exception as e:  # pragma: no cover
            print("precision/recall failed:", e)
        results[strat] = {k: float(v) for k, v in m.items()}
        print(strat, results[strat])

    out = {
        "framework": "reference-torch-cpu",
        "config": {
            "epochs": args.epochs, "batch_size": args.batch_size,
            "num_gens": args.num_gens, "num_samples": args.num_samples,
            "seed": args.seed, **extra,
        },
        "train_seconds": train_s,
        "epoch_log": _LOGGED,
        "test_metrics": results,
    }
    with open(_OUT_DIR / "results.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", _OUT_DIR / "results.json")


if __name__ == "__main__":
    main()
