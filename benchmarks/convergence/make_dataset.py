"""Generate the shared convergence-parity dataset (both frameworks read it).

Writes a tiny bimodal pedestrian dataset in the reference's on-disk BIWI
layout (experiments.py:177-191: tab-separated ``frame ID y x`` in meters at
0.05 m/px, one ``<prefix>_<scene>.txt`` + ``<scene>.jpg`` per phase dir), so
BOTH the reference's ``TrajectoryDatasetEval`` (trajectories_scene.py:81) and
our ``parsing.load_scene_dataset`` ingest the identical files:

    <out>/data/datasets/eth/{train,val,test}/{biwi_eth.txt, eth.jpg}

Scene construction: each 20-frame window holds 2-4 pedestrians walking as a
loose group at ~1.2 m/s. At the first prediction step (frame 8) the whole
scene turns by +60 deg or -60 deg — a per-scene latent mode, the exact
generative structure MG-GAN's multi-generator + PM-network targets
(README.md:12-17 of the reference). Every scene is emitted TWICE with
bitwise-identical observed frames and the two different mode futures
(GOFP-style repeated scenes, experiments.py:476-508): both frameworks'
``get_same_obs_indices`` grouping (evaluation.py:30-40) then pairs them, so
manifold Recall@k measures true mode coverage and Precision stays
meaningful for a bimodal predictor. A model that learns both modes reaches
k=20 ADE near the jitter floor; a mode-collapsed model pays the full turn
separation in ADE/FDE and half the Recall.

Window isolation trick: window w occupies frames [20w, 20w+20) and its ped
IDs appear ONLY in those frames, so the reference's sliding windower
(trajectories_scene.py:149-181, full-presence filter) keeps exactly the
intended windows (offsets not multiples of 20 have no full-presence ped and
are dropped via its ``num_peds > 0`` guard) — both frameworks see the same
scene list without sharing windowing code.

Usage: python benchmarks/convergence/make_dataset.py [--out /tmp/mggan_convergence]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

OBS_LEN, SEQ_LEN = 8, 20
SPEED = 0.48  # m per 0.4 s step = 1.2 m/s
TURN_DEG = 60.0
JITTER = 0.02  # m, gaussian per point
SCENES = {"train": 32, "val": 8, "test": 16}  # x2 windows (one per mode)
SEEDS = {"train": 10, "val": 11, "test": 12}
IMG_PX = 1000  # 1000 px @ 0.05 m/px = 50 m x 50 m world


def _rot(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]])


def make_scene_pair(rng):
    """Two windows (P, 20, 2) sharing bitwise-identical observed frames:
    one turns +60 deg at frame 8, the other -60 deg."""
    n_peds = rng.integers(2, 5)
    center = rng.uniform(15.0, 35.0, size=2)
    heading = rng.uniform(0, 2 * np.pi)
    d0 = np.array([np.cos(heading), np.sin(heading)])
    starts = [center + rng.uniform(-1.5, 1.5, size=2) for _ in range(n_peds)]
    speeds = [SPEED * rng.uniform(0.85, 1.15) for _ in range(n_peds)]
    obs_jitter = rng.normal(0, JITTER, size=(n_peds, OBS_LEN, 2))

    windows = []
    for mode in (1.0, -1.0):
        d1 = _rot(np.deg2rad(TURN_DEG) * mode) @ d0
        trajs = []
        for p in range(n_peds):
            pos = starts[p]
            pts = [pos]
            for t in range(1, SEQ_LEN):
                step = d0 if t <= OBS_LEN - 1 else d1
                pos = pos + speeds[p] * step
                pts.append(pos)
            traj = np.stack(pts)
            # identical jitter (and hence bitwise-identical txt rows) on the
            # observed frames; independent jitter on the future
            traj[:OBS_LEN] += obs_jitter[p]
            traj[OBS_LEN:] += rng.normal(0, JITTER, size=(SEQ_LEN - OBS_LEN, 2))
            trajs.append(traj)
        windows.append(np.stack(trajs))
    return windows  # [(P, 20, 2), (P, 20, 2)]


def write_phase(root: Path, phase: str):
    rng = np.random.default_rng(SEEDS[phase])
    d = root / "data" / "datasets" / "eth" / phase
    d.mkdir(parents=True, exist_ok=True)
    rows = []
    pid = 0
    w = 0
    for _ in range(SCENES[phase]):
        for scene in make_scene_pair(rng):
            for p in range(scene.shape[0]):
                pid += 1
                for t in range(SEQ_LEN):
                    x, y = scene[p, t]
                    # BIWI column order is (frame, ID, y, x) — y first
                    # (experiments.py:185; our registry.BIWI_COLUMNS).
                    rows.append((20 * w + t, pid, y, x))
            w += 1
    rows.sort()
    with open(d / "biwi_eth.txt", "w") as f:
        for fr, i, y, x in rows:
            f.write(f"{fr:.1f}\t{i}\t{y:.6f}\t{x:.6f}\n")

    # Mild fixed-seed texture (not uniform: keeps the scene-CNN input
    # non-degenerate) — identical image for every phase.
    img_rng = np.random.default_rng(7)
    img = np.full((IMG_PX, IMG_PX, 3), 128, np.uint8)
    for _ in range(40):
        cx, cy = img_rng.integers(0, IMG_PX, 2)
        r = int(img_rng.integers(20, 80))
        shade = int(img_rng.integers(60, 200))
        yy, xx = np.ogrid[:IMG_PX, :IMG_PX]
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        img[m] = shade
    from PIL import Image

    Image.fromarray(img).save(d / "eth.jpg", quality=90)
    return len(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mggan_convergence")
    args = ap.parse_args()
    root = Path(args.out)
    for phase in ("train", "val", "test"):
        n = write_phase(root, phase)
        print(f"{phase}: {2 * SCENES[phase]} windows ({SCENES[phase]} same-obs pairs), {n} rows")
    print(f"dataset root: {root}/data/datasets/eth")


if __name__ == "__main__":
    main()
