"""End-to-end odometry: synthetic corridor sequence -> SlamEngine -> ATE."""

import numpy as np
import pytest

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_sequence
from slam_toolkit_tpu.evaluation.traj import ate_rmse, rpe
from slam_toolkit_tpu.pipeline.engine import SlamEngine


@pytest.fixture(scope="module")
def run_sequence():
    cfg = SlamConfig.tiny()
    world, gt, frames = make_sequence(cfg, n_frames=10, seed=3, step=0.25)
    eng = SlamEngine(cfg)
    for left, right in frames:
        eng.process(left, right)
    return eng, gt


def test_trajectory_ate(run_sequence):
    eng, gt = run_sequence
    assert len(eng.trajectory) == len(gt)
    err = ate_rmse(eng.trajectory, gt, align=True)
    # 10 frames x 0.25 m steps = 2.25 m path on the 128px test camera
    assert err < 0.12, f"ATE RMSE {err:.3f} m"


def test_rpe(run_sequence):
    eng, gt = run_sequence
    t_err, r_err = rpe(eng.trajectory, gt)
    assert t_err < 0.15, t_err
    assert r_err < 0.03, r_err


def test_map_grows(run_sequence):
    eng, _ = run_sequence
    assert eng.n_keyframes >= 1
    assert eng.num_mappoints() > 50
