"""The convergence-parity dataset generator (benchmarks/convergence/) must
produce files our ingestion reads with the intended structure — window
isolation via the full-presence filter, GOFP-style same-obs pairs carrying
the two mode futures — since the cross-framework comparison assumes both
loaders see identical scenes and group them identically."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks" / "convergence"))

import make_dataset  # noqa: E402

from mggan_tpu.data.loaders import get_dataset  # noqa: E402
from mggan_tpu.eval.manifold import get_same_obs_indices  # noqa: E402


def _turn_angle(p):
    """Signed obs->pred heading change of one ped trajectory, degrees."""
    d_obs = p[make_dataset.OBS_LEN - 1] - p[0]
    d_pred = p[-1] - p[make_dataset.OBS_LEN - 1]
    a = np.arctan2(d_pred[1], d_pred[0]) - np.arctan2(d_obs[1], d_obs[0])
    return np.rad2deg((a + np.pi) % (2 * np.pi) - np.pi)


def test_generated_dataset_structure(tmp_path):
    for phase in ("train", "test"):
        make_dataset.write_phase(tmp_path, phase)
    root = str(tmp_path / "data" / "datasets")

    train = get_dataset("eth", "train", data_root=root)
    test = get_dataset("eth", "test", data_root=root)

    # The sliding windower keeps exactly the intended windows minus the
    # final one (the reference's own ceil((F-20)/skip) off-by-one, mirrored
    # by our window_scene) — ingestion parity depends on this matching.
    assert len(train) == 2 * make_dataset.SCENES["train"] - 1
    assert len(test) == 2 * make_dataset.SCENES["test"] - 1
    assert train.format == "meter"
    sizes = [len(t) for t in train.trajectories]
    assert min(sizes) >= 2 and max(sizes) <= 4

    # Every window turns ~+/-60 deg; the mode is shared scene-wide.
    angles = []
    for traj in train.trajectories:
        per_ped = [_turn_angle(p) for p in traj]
        assert (np.abs(np.abs(per_ped) - make_dataset.TURN_DEG) < 10).all()
        assert len(set(np.sign(per_ped))) == 1
        angles.append(per_ped[0])
    angles = np.array(angles)
    assert 0.25 < (angles > 0).mean() < 0.75

    # GOFP-style pairing: identical observed frames -> our eval grouping
    # pairs the two mode windows (the final window's pair partner was
    # dropped by the windower, leaving exactly one singleton group).
    groups = get_same_obs_indices(train)  # list of [scene-agent-idx-lists]
    sizes = sorted(len(g) for g in groups)
    assert sizes.count(1) == 1 and set(sizes) == {1, 2}
    flat_agents = np.concatenate(train.trajectories)  # (N, 20, 2)
    for g in groups:
        if len(g) == 2:
            (a, b) = (g[0][0], g[1][0])  # first agent of each paired window
            assert np.sign(_turn_angle(flat_agents[a])) != np.sign(
                _turn_angle(flat_agents[b]))

    # Patches must come from inside the image (non-degenerate CNN input).
    assert train.big_patches[0].shape[-1] == 3
