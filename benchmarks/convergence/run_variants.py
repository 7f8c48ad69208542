"""Drive the convergence-parity harness over the config-matrix variants
(VERDICT r3 #2): one reference-vs-ours pair per variant, each exercising a
training path that previously had only one-step tests:

* ``W``        — gan_obj=W: WGAN objective + gradient-penalty
                 grads-of-grads in anger (reference train.py:150-160; our
                 steps.py::_gradient_penalty). The reference's W path is
                 dead code as written — run_reference.py carries the
                 minimal monkeypatch repair (documented there).
* ``infogan``  — gan_type=infogan: the latent-code reconstruction branch
                 (reference train.py:120-138; our steps.py infogan terms).
* ``augment``  — augment=1: the full rotation/flip augmentation pipeline,
                 behaviourally validating the bilinear-vs-nearest patch
                 deviation (PARITY deviation 5).
* ``sgan``     — pool_type=sgan: PoolHiddenNet pooling end-to-end
                 (reference social_gan.py:157-250; our ops/social.py).
* ``LS``/``MM``— the remaining gan_obj arms (least-squares MSE / minimax
                 -BCE(fake), reference abstract_train.py:68-75; our
                 ops/losses.py), completing convergence coverage of every
                 gan_obj in {NS, MM, LS, W}.
* ``wt_l2``/``wt_endpoint``/``wt_mgan`` — the remaining implemented
                 weighting_target arms for the PM-net (reference
                 train.py:602-650; base runs pin ml).
* ``gan``      — gan_type=gan: vanilla D without branch heads, completing
                 the trainable gan_type set {mgan, infogan, gan}.

Each variant trains BOTH frameworks on the identical generated dataset and
identical hyperparameters, evaluates with each framework's own eval stack,
and writes ``benchmarks/convergence/results/<variant>/summary.json`` via
compare.py. Cross-framework checkpoint evals are exercised by the base
experiments (results/{,ng4,discrete}) and skipped here for wall-clock.

Serial by design: this host has ONE core; parallel runs would contend and
corrupt the wall-time columns.

    python benchmarks/convergence/run_variants.py \
        [--epochs 80] [--variants W infogan augment sgan]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent

VARIANTS = {
    "W": {"extra": ["gan_obj=W"]},
    # the reference's infogan asserts n_gs == 1 (train.py:188: the latent
    # code replaces the multi-generator mechanism) -> same on both sides
    "infogan": {"extra": ["gan_type=infogan"], "args": ["--num_gens", "1"]},
    "augment": {"extra": ["augment=1"]},
    "sgan": {"extra": ["pool_type=sgan"]},
    # the remaining gan_obj arms (reference abstract_train.py:61-85): least
    # squares and the minimax/hinge objective — with these the convergence
    # matrix covers every gan_obj in {NS (base runs), MM, LS, W}
    "LS": {"extra": ["gan_obj=LS"]},
    "MM": {"extra": ["gan_obj=MM"]},
    # weighting_target arms for the PM-net training signal (reference
    # train.py:602-650): the base runs pin ml (Bayes posterior); these
    # cover the remaining implemented targets — l2 (CE vs argmin per-gen
    # mean L2), endpoint (argmin FDE), mgan (CE vs softmax of the D
    # gen-id branch on GT + decayed entropy reg). disc_scores is
    # NotImplementedError in BOTH frameworks (reference train.py:602,
    # our steps.py) and probgan is excluded by the reference's own
    # trainable-set assert (train.py:21).
    "wt_l2": {"extra": ["weighting_target=l2"]},
    "wt_endpoint": {"extra": ["weighting_target=endpoint"]},
    "wt_mgan": {"extra": ["weighting_target=mgan"]},
    # vanilla gan_type=gan: D without branch heads, no classifier loss
    # (reference discriminators.py:198-209 plain path) — completes the
    # trainable gan_type set {mgan (base), infogan, gan}
    "gan": {"extra": ["gan_type=gan"]},
    # --- round-5 arms (VERDICT r4 next #5/#6) ---------------------------
    # remaining l2_loss_type cells with one-step parity but no convergence
    # arm (reference train.py:58-75: mse = per-sample MSE over ALL samples,
    # min_z = min over noise draws without the per-scene min)
    "l2_mse": {"extra": ["l2_loss_type=mse"]},
    "l2_min_z": {"extra": ["l2_loss_type=min_z"]},
    # --unconditional: PM-net off (use_pinet rule model_factory.py:36),
    # store_true on BOTH argparsers -> value-less extra
    "uncond": {"extra": ["unconditional="]},
    # unrolled GAN: D trains against its own lookahead copy
    # (abstract_train.py:136-162 backup/restore dance; our functional
    # D-param snapshot)
    "unroll": {"extra": ["num_unrolling_steps=1"]},
    # probgan (VERDICT r4 #5): OURS-ONLY — the reference asserts probgan
    # out of its trainable set (train.py:21), so this row substantiates
    # stability + sane metrics, not a comparison. 150 epochs like the base
    # runs; plus the SGHMC noise-term ablation (lambda = 0) for the
    # BASELINE note on its effect (reference utils.py:10-31 noise_loss,
    # config.py:100-117 lambdas).
    "probgan": {"extra": ["gan_type=probgan"], "ours_only": True,
                "epochs": 150},
    "probgan_nonoise": {
        "extra": ["gan_type=probgan", "g_noise_loss_lambda=0",
                  "d_noise_loss_lambda=0"],
        "ours_only": True, "epochs": 150},
    # A/B isolation of PARITY deviation 5 (bilinear vs the reference's
    # PIL-nearest patch resample) on the augment cell: ours-only arm with
    # --patch_interp nearest; compare against results/augment*'s ours
    # column (same seed) and the reference column.
    "augment_nearest": {
        "extra": ["augment=1", "patch_interp=nearest"], "ours_only": True},
    # A/B isolation of PARITY deviation 7 on the wt_mgan cell (r5):
    # "wt_mgan_compat" pins the reference's LITERAL degenerate objective
    # (b-scaled uniform-push; --wt_mgan_compat 1, the framework default
    # since the A/B measured it better at 4 of 5 overlapping seeds),
    # "wt_mgan_bayes" pins the r1-r4 Bayes-target intent. Compare against
    # the "wt_mgan" cell's reference column (results/wt_mgan*; seed bands
    # via seed_band.py).
    "wt_mgan_compat": {
        "extra": ["weighting_target=mgan", "wt_mgan_compat=1"],
        "ours_only": True},
    "wt_mgan_bayes": {
        "extra": ["weighting_target=mgan", "wt_mgan_compat=0"],
        "ours_only": True},
}


def run(cmd):
    print("+", " ".join(map(str, cmd)), flush=True)
    subprocess.run([str(c) for c in cmd], check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/mggan_convergence")
    ap.add_argument("--epochs", type=int, default=None,
                    help="explicit value beats the per-variant default "
                         "(None -> variant's own, else 80)")
    ap.add_argument("--val_every", type=int, default=10)
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    ap.add_argument("--skip_reference", action="store_true")
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed for both frameworks; seed!=0 "
                         "writes results/<variant>_s<seed>/ so mixed "
                         "single-seed cells gain seed-variance evidence")
    args = ap.parse_args()

    data = Path(args.data)
    if not (data / "data" / "datasets" / "eth" / "train").exists():
        run([sys.executable, HERE / "make_dataset.py", "--out", data])

    for name in args.variants:
        spec = VARIANTS[name]
        tag = name if args.seed == 0 else f"{name}_s{args.seed}"
        out = data / f"variant_{tag}"
        res_dir = HERE / "results" / tag
        res_dir.mkdir(parents=True, exist_ok=True)
        ours_only = args.skip_reference or spec.get("ours_only", False)
        # an explicitly-passed --epochs beats the per-variant default
        epochs = (args.epochs if args.epochs is not None
                  else spec.get("epochs", 80))
        common = [
            "--data", data, "--epochs", epochs,
            "--val_every", args.val_every, "--seed", args.seed,
            *spec.get("args", []),
            "--extra", *spec["extra"],
        ]
        if not ours_only:
            run([sys.executable, HERE / "run_reference.py",
                 "--out", out / "ref", *common])
        run([sys.executable, HERE / "run_ours.py",
             "--out", out / "ours", *common])
        results = ([] if ours_only else [out / "ref" / "results.json"]) + [
            out / "ours" / "results.json"
        ]
        run([sys.executable, HERE / "compare.py", "--results", *results,
             "--out", res_dir / "summary.json"])
        print(f"=== variant {tag} done ===", flush=True)

    print(json.dumps({"variants_done": args.variants}))


if __name__ == "__main__":
    main()
