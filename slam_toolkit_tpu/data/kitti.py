"""KITTI odometry dataset loader.

Mirrors the reference's KittiDataset (ref src/dataset.cpp:31-124):
scans `<root>/sequences/<seq>/image_{0,1}/*.png`, parses GT poses from
`<root>/poses/<seq>.txt` (3x4 T_wc rows, inverted to T_cw like the
reference :65-85), and exposes the standard KITTI intrinsics
(fx=fy=718.856, cx=607.1928, cy=185.2157, baseline ~0.537 m from P1,
:87-105). Images load lazily in grayscale (:114-124).

Dataset root resolves from the KITTI_ROOT env var or an explicit path.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from slam_toolkit_tpu.config import CameraConfig, SlamConfig


KITTI_CAMERA = CameraConfig(
    fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
    baseline=386.1448 / 718.856,  # = t_x of P1 / fx ~ 0.537 m
    width=1241, height=376)


def kitti_config() -> SlamConfig:
    return SlamConfig(camera=KITTI_CAMERA)


class KittiDataset:
    def __init__(self, sequence: str = "00", root: Optional[str] = None):
        self.root = root or os.environ.get("KITTI_ROOT",
                                           "kitti_odometry_dataset")
        self.sequence = sequence
        seq_dir = os.path.join(self.root, "sequences", sequence)
        self.left_dir = os.path.join(seq_dir, "image_0")
        self.right_dir = os.path.join(seq_dir, "image_1")
        if not os.path.isdir(self.left_dir):
            raise FileNotFoundError(
                f"KITTI sequence not found: {self.left_dir} "
                f"(set KITTI_ROOT)")
        self.files = sorted(f for f in os.listdir(self.left_dir)
                            if f.endswith(".png"))
        self.T_cw: List[np.ndarray] = self._load_poses()

    def _load_poses(self) -> List[np.ndarray]:
        path = os.path.join(self.root, "poses", f"{self.sequence}.txt")
        poses = []
        if os.path.exists(path):
            data = np.loadtxt(path).reshape(-1, 3, 4)
            for row in data:
                T_wc = np.eye(4, dtype=np.float64)
                T_wc[:3, :] = row
                poses.append(np.linalg.inv(T_wc).astype(np.float32))
        return poses

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        import cv2
        lp = os.path.join(self.left_dir, self.files[idx])
        rp = os.path.join(self.right_dir, self.files[idx])
        left = cv2.imread(lp, cv2.IMREAD_GRAYSCALE)
        right = cv2.imread(rp, cv2.IMREAD_GRAYSCALE)
        if left is None or right is None:
            raise IOError(f"failed to read stereo pair {idx}")
        return left.astype(np.float32), right.astype(np.float32)

    def ground_truth(self) -> List[np.ndarray]:
        return self.T_cw

    def camera_config(self) -> CameraConfig:
        """Camera intrinsics for this sequence: the hardcoded standard
        KITTI calibration at the standard resolution (ref
        src/dataset.cpp:87-105); the tiny synthetic camera for the
        checked-in mini fixture's size."""
        h, w = self[0][0].shape
        if (h, w) == (KITTI_CAMERA.height, KITTI_CAMERA.width):
            return KITTI_CAMERA
        if (h, w) == (SlamConfig.tiny().camera.height,
                      SlamConfig.tiny().camera.width):
            return SlamConfig.tiny().camera
        raise ValueError(f"no builtin calibration for {w}x{h} frames")

    def prefetch_loader(self, height: int = 376, width: int = 1241,
                        ring: int = 4):
        """Native background-decoding iterator over stereo pairs
        (falls back to cv2 if native/libslamloader.so isn't built)."""
        from slam_toolkit_tpu.data.native_loader import PrefetchLoader
        lps = [os.path.join(self.left_dir, f) for f in self.files]
        rps = [os.path.join(self.right_dir, f) for f in self.files]
        return PrefetchLoader(lps, rps, height, width, ring)
