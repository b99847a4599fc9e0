"""DenseTracker (epip_cluster workload) e2e on a synthetic moving scene."""

import numpy as np
import pytest

from slam_toolkit_tpu.cluster.tracker import DenseConfig, DenseTracker
from slam_toolkit_tpu.config import CameraConfig


def make_scene(t: float, h=96, w=128, fx=120.0, baseline=0.5):
    """Textured background plane + a moving textured box, with disparity."""
    rng = np.random.default_rng(0)
    # static textures (fixed per test run)
    global _BG, _BOX
    try:
        _BG
    except NameError:
        _BG = np.kron(rng.uniform(20, 235, (h // 4 + 2, w // 4 + 2)),
                      np.ones((4, 4))).astype(np.float32)
        _BOX = np.kron(rng.uniform(20, 235, (8, 8)),
                       np.ones((4, 4))).astype(np.float32)

    z_bg, z_box = 20.0, 8.0
    def render(shift_x):
        img = _BG[:h, :w].copy()
        # box moves right at 3 px/frame, plus stereo disparity shift
        bx = int(30 + 3 * t - shift_x * fx * baseline / z_box / (
            fx * baseline / z_box)) if False else int(30 + 3 * t - shift_x)
        by = 30
        img[by:by + 32, bx:bx + 32] = _BOX
        return img
    d_bg = fx * baseline / z_bg
    d_box = fx * baseline / z_box
    left = render(0)
    # right eye: shift content by its disparity (approx: whole image by
    # bg disparity, box region by box disparity)
    right = np.roll(_BG[:h, :w], -int(round(d_bg)), axis=1).copy()
    bx, by = int(30 + 3 * t - d_box), 30
    if 0 <= bx < w - 32:
        right[by:by + 32, bx:bx + 32] = _BOX
    return left.astype(np.float32), right.astype(np.float32)


def test_dense_tracker_runs_and_segments():
    cam = CameraConfig(fx=120.0, fy=120.0, cx=64.0, cy=48.0, baseline=0.5,
                       width=128, height=96)
    cfg = DenseConfig(num_disparities=32, block_size=9, flow_levels=3,
                      flow_win=9, sample_stride=4, min_disparity=1.0,
                      max_disparity=30.0, min_flow_p95=1.0,
                      cluster_radius_3d=2.0, min_cluster_size=10,
                      max_points=1024)
    tr = DenseTracker(cam, cfg)
    out0 = tr.track(*make_scene(0))
    assert out0["skipped"]
    out1 = tr.track(*make_scene(1))
    out2 = tr.track(*make_scene(2))
    assert not out2["skipped"], out2
    assert out2["n_points"] > 50
    fits = [c for c in out2["clusters"] if c["ok"]]
    assert len(fits) >= 2, out2["clusters"]
    # per-cluster rigid motion (reference EpipPoint pairing: current 3D
    # vs flow-warped previous rays): the static background must fit
    # ~identity; the box (3 px/frame at z=8, fx=120 -> ~0.2 m/frame)
    # must fit a clearly x-dominant negative translation (T maps current
    # camera coords to the previous camera)
    fits.sort(key=lambda c: -c["size"])
    t_bg = np.asarray(fits[0]["T"])[:3, 3]
    t_box = np.asarray(fits[1]["T"])[:3, 3]
    assert np.linalg.norm(t_bg) < 0.05, t_bg
    assert t_box[0] < -0.1, t_box
    assert abs(t_box[0]) > 1.5 * max(abs(t_box[1]), abs(t_box[2])), t_box
