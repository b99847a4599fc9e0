"""Offline stereo calibration from chessboard images.

Capability parity with the reference's utility scripts
(ref examples/epip_cluster/scripts/calib.py — offline chessboard stereo
calibration): detect chessboard corners in stereo image pairs, calibrate
intrinsics + distortion per camera, then the stereo extrinsics, and emit
a slam_toolkit_tpu CameraConfig. Host-side tooling (cv2), not part of
any jitted pipeline.
"""

from __future__ import annotations

import glob
import json
import os
from typing import List, Optional, Tuple

import numpy as np

from slam_toolkit_tpu.config import CameraConfig


def find_corners(images: List[np.ndarray], pattern: Tuple[int, int],
                 square_size: float):
    import cv2
    objp = np.zeros((pattern[0] * pattern[1], 3), np.float32)
    objp[:, :2] = np.mgrid[0:pattern[0], 0:pattern[1]].T.reshape(-1, 2)
    objp *= square_size
    obj_pts, img_pts, used = [], [], []
    for i, img in enumerate(images):
        gray = img if img.ndim == 2 else cv2.cvtColor(img,
                                                      cv2.COLOR_BGR2GRAY)
        ok, corners = cv2.findChessboardCorners(gray.astype(np.uint8),
                                                pattern)
        if not ok:
            continue
        corners = cv2.cornerSubPix(
            gray.astype(np.uint8), corners, (5, 5), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 1e-3))
        obj_pts.append(objp)
        img_pts.append(corners)
        used.append(i)
    return obj_pts, img_pts, used


def calibrate_stereo(left_images: List[np.ndarray],
                     right_images: List[np.ndarray],
                     pattern: Tuple[int, int] = (9, 6),
                     square_size: float = 0.025) -> CameraConfig:
    """Returns a CameraConfig (left intrinsics + stereo baseline)."""
    import cv2
    h, w = left_images[0].shape[:2]
    ol, il, ul = find_corners(left_images, pattern, square_size)
    orr, ir, ur = find_corners(right_images, pattern, square_size)
    common = sorted(set(ul) & set(ur))
    if len(common) < 3:
        raise ValueError(f"only {len(common)} usable stereo pairs")
    idx_l = {u: i for i, u in enumerate(ul)}
    idx_r = {u: i for i, u in enumerate(ur)}
    obj = [ol[idx_l[u]] for u in common]
    ptl = [il[idx_l[u]] for u in common]
    ptr = [ir[idx_r[u]] for u in common]

    _, Kl, Dl, _, _ = cv2.calibrateCamera(obj, ptl, (w, h), None, None)
    _, Kr, Dr, _, _ = cv2.calibrateCamera(obj, ptr, (w, h), None, None)
    flags = cv2.CALIB_FIX_INTRINSIC
    _, _, _, _, _, R, T, _, _ = cv2.stereoCalibrate(
        obj, ptl, ptr, Kl, Dl, Kr, Dr, (w, h), flags=flags)
    baseline = float(np.linalg.norm(T))
    return CameraConfig(
        fx=float(Kl[0, 0]), fy=float(Kl[1, 1]),
        cx=float(Kl[0, 2]), cy=float(Kl[1, 2]),
        k1=float(Dl[0, 0]), k2=float(Dl[0, 1]),
        p1=float(Dl[0, 2]), p2=float(Dl[0, 3]),
        baseline=baseline, width=w, height=h)


def main(left_glob: str, right_glob: str, out_path: Optional[str] = None,
         pattern=(9, 6), square_size=0.025):
    import cv2
    lp = sorted(glob.glob(left_glob))
    rp = sorted(glob.glob(right_glob))
    left = [cv2.imread(p, cv2.IMREAD_GRAYSCALE) for p in lp]
    right = [cv2.imread(p, cv2.IMREAD_GRAYSCALE) for p in rp]
    cfg = calibrate_stereo(left, right, pattern, square_size)
    data = {k: getattr(cfg, k) for k in
            ("fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2",
             "baseline", "width", "height")}
    text = json.dumps(data, indent=2)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
    print(text)
    return cfg


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
