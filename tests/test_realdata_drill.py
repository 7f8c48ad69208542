"""Real-data drop-in drills (VERDICT r3 #8): drive the ACTUAL user surfaces
``cli.train`` -> ``cli.evaluate`` over on-disk tmp-dir fixtures in the exact
formats of the two datasets nobody can download in this environment, so the
day real data lands nothing breaks:

* SDD ("stanford"): 12-column annotation schema + ``H_SDD.txt`` ratio csv +
  per-scene jpg, 30 fps -> 12-frame subsampling
  (reference experiments.py:194-223, BaseTrajectories.py:145-147).
* GOFP: 8-column schema with the ``is_active`` flag that NaNs occluded
  agents' futures, 10 fps -> 4-frame subsampling, pixel->meter ratio table
  (reference experiments.py:476-508).

Tiny dims keep each drill to ~1 min of CPU; the point is the full pipeline
(parse -> window -> patches -> train -> checkpoint -> eval CSV), not
convergence."""

import numpy as np
import pandas as pd

from mggan_tpu.cli import evaluate as ev_cli
from mggan_tpu.cli import train as train_cli

PHASES = ("train", "val", "test")

TRAIN_FLAGS = [
    "--epochs", "1", "--batch_size", "4", "--num_gens", "2",
    "--h_dim", "16", "--decoder_h_dim", "16", "--num_samples", "2",
    "--num_expectation_samples", "1", "--top_k_test", "2",
    "--val_every", "1", "--augment", "0",
]


def _write_jpg(path, size=120, fill=90):
    import cv2

    img = np.full((size, size, 3), fill, np.uint8)
    img[size // 3: size // 2] = 200  # non-uniform so patches carry signal
    cv2.imwrite(str(path), img)


def _run_cli_pair(root, dataset, tmp_path):
    """train CLI -> version dir -> evaluate CLI -> one finite CSV row."""
    log_dir = tmp_path / "logs"
    train_cli.main([
        "--dataset", dataset, "--data_root", str(root),
        "--name", "drill", "--log_dir", str(log_dir), *TRAIN_FLAGS,
    ])
    model_path = log_dir / "multi_generator" / "drill"
    versions = sorted(model_path.glob("version_*"))
    assert versions, f"train CLI wrote no version dir under {model_path}"
    assert (versions[-1] / "metrics.jsonl").exists()

    out = tmp_path / "results"
    ev_cli.main([
        "--model_path", str(model_path), "--output_folder", str(out),
        "--checkpoint", "best", "--phase", "test", "--num_preds", "3",
        "--pred_strat", "sampling", "--no-precision-recall",
        "--batch_size", "4", "--data_root", str(root),
    ])
    (csv,) = list(out.glob("*.csv"))
    df = pd.read_csv(csv)
    assert len(df) == 1
    for col in ("ADE k=2", "FDE k=2", "Mode k=2"):
        assert np.isfinite(float(df[col][0]))
    return df


def test_sdd_cli_train_eval_drill(tmp_path):
    """Exact SDD on-disk format end-to-end: 12-column rows (track, 4 bbox,
    frame, lost, occluded, generated, label, x, y), only ``Pedestrian``
    rows kept, 12-frame subsample, H_SDD.txt ratio -> meters
    (experiments.py:194-223)."""
    root = tmp_path / "data"
    (root / "stanford").mkdir(parents=True)
    (root / "stanford" / "H_SDD.txt").write_text(
        "File\tVersion\tRatio\nsc0.jpg\tA\t0.04\n"
    )
    rng = np.random.RandomState(0)
    for pi, phase in enumerate(PHASES):
        d = root / "stanford" / phase
        d.mkdir()
        rows = []
        # 30 fps * 0.4 s -> every 12th frame survives; 27 kept frames
        # per ped -> ceil((27-20)/1) = 7 windows of 3 peds
        for f in range(0, 12 * 27, 12):
            for p in range(3):
                x = 100 + p * 40 + f * (0.02 + 0.01 * pi) + rng.rand()
                y = 200 + f * 0.02 + rng.rand()
                rows.append(
                    f"{p}\t0\t0\t0\t0\t{f}\t0\t0\t0\tPedestrian\t{x}\t{y}"
                )
                # non-pedestrian rows must be filtered out, not crash
                rows.append(
                    f"{90 + p}\t0\t0\t0\t0\t{f}\t0\t0\t0\tBiker\t{x}\t{y}"
                )
        (d / f"{phase}_sc0.txt").write_text("\n".join(rows))
        _write_jpg(d / "sc0.jpg", size=400)

    _run_cli_pair(root, "stanford", tmp_path)


def test_gofp_cli_train_eval_drill(tmp_path):
    """Exact GOFP on-disk format end-to-end: 8-column rows (frame, ID, x_px,
    y_px, _, _, group, is_active), 4-frame subsample, ratio-table scaling,
    is_active=0 -> NaN future handled by the loss mask in training and by
    NaN-agent removal in eval (experiments.py:476-508)."""
    root = tmp_path / "data"
    for phase in PHASES:
        d = root / "gofp" / phase
        d.mkdir(parents=True)
        rows = []
        # 10 fps -> keep frames % 4 == 0; 26 kept frames -> 6 windows
        for f in range(0, 4 * 26, 4):
            for p in range(3):
                # ped 2 goes inactive once mid-sequence -> NaN futures in
                # the windows whose prediction span covers that frame
                active = 0 if (p == 2 and f == 4 * 13) else 1
                x = 60.0 + p * 30 + f * 0.6
                y = 80.0 + f * 0.5
                rows.append(
                    f"{float(f)}\t{float(p)}\t{x}\t{y}\t0\t0\t{p}\t{active}"
                )
        (d / f"{phase}_zara1.txt").write_text("\n".join(rows))
        _write_jpg(d / "zara1.jpg", size=300)

    # the fixture must actually exercise the NaN path
    from mggan_tpu.data import parsing

    ds = parsing.load_scene_dataset("gofp", "train", data_root=root)
    assert any(np.isnan(t).any() for t in ds.trajectories)

    _run_cli_pair(root, "gofp", tmp_path)
