"""Tests for trajectory tools (4D augmentation, similar-trajectory mining,
grad norms)."""

import numpy as np

from mggan_tpu.data.synthetic import make_synthetic_dataset
from mggan_tpu.utils import trajectory_tools as tt


def test_get_traj_4d():
    obs = np.cumsum(np.ones((2, 5, 2)), axis=1)
    p, v = tt.get_traj_4d(obs)
    np.testing.assert_allclose(v, 1.0)
    pred = obs[:, -1:] + np.cumsum(np.ones((2, 3, 2)), 1)
    p, v, pp, pv = tt.get_traj_4d(obs, pred)
    np.testing.assert_allclose(pv, 1.0)


def test_similar_trajectories():
    ds = make_synthetic_dataset(num_windows=12, max_peds=4, seed=3)
    out = tt.get_similar_trajectories(
        ds, distance_threshold=100.0, direction_threshold=-1.0,
        speed_threshold=100.0,
    )
    assert len(out) > 0
    for idx, futures in out.items():
        assert futures.ndim == 3 and futures.shape[1:] == (12, 2)
        # the trajectory itself (shifted by zero) must be among candidates
        gt = ds.pred_traj[idx]
        d = np.abs(futures - gt[None]).max((1, 2))
        assert d.min() < 1e-5


def test_grad_norm_logger():
    g = {"encoder": {"w": np.ones((2, 2))}, "decoders": {"w": np.zeros(3)}}
    log = tt.GradNormLogger()
    log.update(g)
    assert log.grad_norms["encoder"][0] == 2.0
    assert log.grad_norms["grad_norm_total"][0] == 2.0
