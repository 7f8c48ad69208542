"""The convergence-parity dataset generator (benchmarks/convergence/) must
produce files our ingestion reads with the intended structure — window
isolation via the full-presence filter, per-scene bimodal turns — since the
cross-framework comparison assumes both loaders see identical scenes."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks" / "convergence"))

import make_dataset  # noqa: E402

from mggan_tpu.data.loaders import get_dataset  # noqa: E402


def _turn_angles(ds):
    """Signed obs->pred heading change per window, degrees."""
    angles = []
    for traj in ds.trajectories:
        p = traj[0]  # first ped of the scene; mode is shared scene-wide
        d_obs = p[make_dataset.OBS_LEN - 1] - p[0]
        d_pred = p[-1] - p[make_dataset.OBS_LEN - 1]
        a = np.arctan2(d_pred[1], d_pred[0]) - np.arctan2(d_obs[1], d_obs[0])
        angles.append(np.rad2deg((a + np.pi) % (2 * np.pi) - np.pi))
    return np.array(angles)


def test_generated_dataset_structure(tmp_path):
    for phase in ("train", "test"):
        make_dataset.write_phase(tmp_path, phase)
    root = str(tmp_path / "data" / "datasets")

    train = get_dataset("eth", "train", data_root=root)
    test = get_dataset("eth", "test", data_root=root)

    # The sliding windower keeps exactly the intended windows minus the
    # final one (the reference's own ceil((F-20)/skip) off-by-one, mirrored
    # by our window_scene) — ingestion parity depends on this matching.
    assert len(train) == make_dataset.WINDOWS["train"] - 1
    assert len(test) == make_dataset.WINDOWS["test"] - 1
    assert train.format == "meter"
    sizes = [len(t) for t in train.trajectories]
    assert min(sizes) >= 2 and max(sizes) <= 4

    # Per-scene latent mode: turn of ~+/-60 deg at the prediction boundary,
    # both modes well represented.
    ang = _turn_angles(train)
    assert (np.abs(np.abs(ang) - make_dataset.TURN_DEG) < 10).all()
    frac_left = (ang > 0).mean()
    assert 0.25 < frac_left < 0.75

    # All peds of a scene share the mode (the PM-network's target signal).
    for traj in train.trajectories:
        per_ped = []
        for p in traj:
            d_obs = p[make_dataset.OBS_LEN - 1] - p[0]
            d_pred = p[-1] - p[make_dataset.OBS_LEN - 1]
            a = np.arctan2(d_pred[1], d_pred[0]) - np.arctan2(d_obs[1], d_obs[0])
            per_ped.append(np.sign((a + np.pi) % (2 * np.pi) - np.pi))
        assert len(set(per_ped)) == 1

    # Patches must come from inside the image (non-degenerate CNN input).
    assert train.big_patches[0].shape[-1] == 3
