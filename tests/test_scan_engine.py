"""Chunked on-device scan driver vs the classic host driver."""

import numpy as np
import pytest

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_sequence
from slam_toolkit_tpu.evaluation.traj import ate_rmse
from slam_toolkit_tpu.pipeline.scan_engine import ChunkedSlamEngine


@pytest.fixture(scope="module")
def run_chunked():
    cfg = SlamConfig.tiny()
    world, gt, frames = make_sequence(cfg, n_frames=10, seed=3, step=0.25)
    eng = ChunkedSlamEngine(cfg, chunk_size=4)
    eng.run(frames)
    return eng, gt


def test_chunked_trajectory(run_chunked):
    eng, gt = run_chunked
    assert len(eng.trajectory) == len(gt)
    err = ate_rmse(eng.trajectory_refined(), gt, align=True)
    assert err < 0.15, f"ATE RMSE {err:.3f} m"


def test_chunked_creates_keyframes(run_chunked):
    eng, _ = run_chunked
    assert eng._host.n_keyframes >= 2
    assert int(eng.map.mp_valid.sum()) > 50
    kf_frames = [s for s in eng.frame_stats if s["kf"]]
    assert len(kf_frames) >= 1
