"""KITTI execution-path proof on checked-in fixtures.

The environment has no real KITTI dataset, so a 6-frame stereo sequence
rendered from the synthetic world is checked in under
tests/fixtures/kitti_mini/ in the exact KITTI odometry layout the
reference scans (ref src/dataset.cpp:48-63: sequences/<seq>/image_{0,1}
PNGs + poses/<seq>.txt 3x4 T_wc rows, :65-85). These tests prove the
whole chain — directory scan, pose parse/invert, PNG decode (cv2 AND
the native libpng prefetch ring), engine tracking — agrees end-to-end.
"""

import os

import numpy as np
import pytest

from slam_toolkit_tpu.data.kitti import KittiDataset

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "fixtures", "kitti_mini")


@pytest.fixture(scope="module")
def ds():
    return KittiDataset("00", root=ROOT)


def test_scan_and_poses(ds):
    assert len(ds) == 6
    gt = ds.ground_truth()
    assert len(gt) == 6
    # frame 0 pose is identity; later frames move forward (+z in cam)
    np.testing.assert_allclose(gt[0], np.eye(4), atol=1e-6)
    c0 = -gt[0][:3, :3].T @ gt[0][:3, 3]
    c5 = -gt[5][:3, :3].T @ gt[5][:3, 3]
    assert np.linalg.norm(c5 - c0) > 1.0


def test_image_roundtrip(ds):
    left, right = ds[0]
    assert left.shape == (96, 128)
    assert right.shape == (96, 128)
    assert left.dtype == np.float32
    assert 10 < left.mean() < 245          # real content, not blank
    assert not np.array_equal(left, right)  # stereo disparity exists


def test_native_prefetch_matches_cv2(ds):
    from slam_toolkit_tpu.data import native_loader
    loader = ds.prefetch_loader(height=96, width=128, ring=2)
    via_cv2 = [ds[i] for i in range(len(ds))]
    got = list(loader)
    assert len(got) == len(via_cv2)
    for (gl, gr), (tl, tr) in zip(got, via_cv2):
        np.testing.assert_array_equal(gl.astype(np.uint8),
                                      tl.astype(np.uint8))
        np.testing.assert_array_equal(gr.astype(np.uint8),
                                      tr.astype(np.uint8))
    if hasattr(loader, "close"):
        loader.close()


def test_engine_tracks_fixture(ds):
    """KittiDataset -> SlamEngine for all 6 frames, ATE sane."""
    from slam_toolkit_tpu.config import SlamConfig
    from slam_toolkit_tpu.evaluation.traj import ate_rmse
    from slam_toolkit_tpu.pipeline.engine import SlamEngine

    cfg = SlamConfig.tiny()   # fixture was rendered with this camera
    eng = SlamEngine(cfg)
    for i in range(len(ds)):
        left, right = ds[i]
        eng.process(left, right)
    err = ate_rmse(eng.trajectory, ds.ground_truth(), align=True)
    assert err < 0.1, f"fixture ATE {err:.3f} m"
