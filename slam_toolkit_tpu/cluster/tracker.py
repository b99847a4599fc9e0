"""Dense motion clustering: the epip_cluster workload, TPU-native.

Replaces DenseTracker (ref examples/epip_cluster/src/tracker.cpp):
per stereo pair — Sobel edge mask (:76-87), dense block-matching
disparity (:106-128), dense optical flow vs the previous frame
(:130-145), a p95 flow-magnitude skip gate (:147-164,722-724), stride-5
point sampling with disparity gates (:166-200), then motion clustering:
flow-propagated labels + per-cluster rigid-model RANSAC + Euclidean
clustering of residual points (:202-392, :518-693).

The per-cluster solvePnPRansac loops become one batched RANSAC per
cluster slot; FLANN clustering becomes masked label propagation. All
device compute is jitted with fixed shapes; the host driver only keeps
the cluster bookkeeping between frames.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.cluster import flow as flow_mod
from slam_toolkit_tpu.cluster import ransac as ransac_mod
from slam_toolkit_tpu.cluster import stereo_bm
from slam_toolkit_tpu.config import CameraConfig


class DenseConfig(NamedTuple):
    num_disparities: int = 128
    block_size: int = 19
    flow_levels: int = 5
    flow_win: int = 13
    sample_stride: int = 5
    min_disparity: float = 2.0
    max_disparity: float = 50.0
    min_flow_p95: float = 20.0
    cluster_radius_3d: float = 0.5
    min_cluster_size: int = 50
    max_points: int = 8192            # padded sample capacity
    max_clusters: int = 16


class DenseFrame(NamedTuple):
    """Per-frame device outputs."""
    disparity: jnp.ndarray      # (H, W)
    flow: jnp.ndarray           # (H, W, 2)
    edge_mask: jnp.ndarray      # (H, W) bool
    pts_uv: jnp.ndarray         # (P, 2) sampled pixel coords
    pts_xyz: jnp.ndarray        # (P, 3) camera-frame 3D points
    pts_valid: jnp.ndarray      # (P,) bool
    flow_p95: jnp.ndarray       # ()


def _sample_grid(h: int, w: int, stride: int, max_points: int):
    ys = np.arange(stride // 2, h, stride)
    xs = np.arange(stride // 2, w, stride)
    uu, vv = np.meshgrid(xs, ys)
    pts = np.stack([uu.ravel(), vv.ravel()], axis=-1).astype(np.int32)
    if pts.shape[0] > max_points:
        pts = pts[:max_points]
    pad = max_points - pts.shape[0]
    mask = np.ones(pts.shape[0], bool)
    if pad > 0:
        pts = np.pad(pts, ((0, pad), (0, 0)))
        mask = np.pad(mask, (0, pad))
    return pts, mask


def dense_frame(gray_l: jnp.ndarray, gray_r: jnp.ndarray,
                prev_gray: jnp.ndarray, cam: CameraConfig,
                cfg: DenseConfig) -> DenseFrame:
    """One jittable per-pair pass: edges, disparity, flow, samples."""
    h, w = gray_l.shape
    edge = stereo_bm.sobel_edge_mask(gray_l)
    disp = stereo_bm.disparity(gray_l, gray_r, cfg.num_disparities,
                               cfg.block_size)
    disp = jnp.where(edge, disp, 0.0)
    flw = flow_mod.farneback_flow(prev_gray, gray_l,
                                  levels=cfg.flow_levels, win=cfg.flow_win)
    mag = jnp.linalg.norm(flw, axis=-1)
    p95 = jnp.percentile(mag.reshape(-1), 95.0)

    grid, gmask = _sample_grid(h, w, cfg.sample_stride, cfg.max_points)
    grid_j = jnp.asarray(grid)
    d = disp[grid_j[:, 1], grid_j[:, 0]]
    ok = jnp.asarray(gmask) & (d > cfg.min_disparity) & \
        (d < cfg.max_disparity)
    z = cam.fx * cam.baseline / jnp.maximum(d, 1e-3)
    x = (grid_j[:, 0] - cam.cx) / cam.fx * z
    y = (grid_j[:, 1] - cam.cy) / cam.fy * z
    xyz = jnp.stack([x, y, z], axis=-1)
    return DenseFrame(disparity=disp, flow=flw, edge_mask=edge,
                      pts_uv=grid_j.astype(jnp.float32),
                      pts_xyz=jnp.where(ok[:, None], xyz, 0.0),
                      pts_valid=ok, flow_p95=p95)


class DenseTracker:
    """Host driver holding previous-frame state and cluster labels."""

    def __init__(self, cam: CameraConfig, cfg: Optional[DenseConfig] = None):
        self.cam = cam
        self.cfg = cfg or DenseConfig()
        self.prev_gray: Optional[jnp.ndarray] = None
        self.prev_frame: Optional[DenseFrame] = None
        self.frame_idx = 0
        cfg_ = self.cfg
        cam_ = cam

        @jax.jit
        def _frame(gl, gr, pg):
            return dense_frame(gl, gr, pg, cam_, cfg_)

        @jax.jit
        def _cluster(xyz, valid):
            return ransac_mod.euclidean_cluster(
                xyz, valid, cfg_.cluster_radius_3d,
                min_size=cfg_.min_cluster_size)

        @jax.jit
        def _rigid(prev_xyz, cur_norm, member, key):
            return ransac_mod.pnp_ransac(prev_xyz, cur_norm, member, key)

        self._frame, self._cluster, self._rigid = _frame, _cluster, _rigid

    def track(self, gray_l: np.ndarray, gray_r: np.ndarray) -> dict:
        """Process one stereo pair; returns cluster summary (host dict)."""
        gl = jnp.asarray(gray_l, jnp.float32)
        gr = jnp.asarray(gray_r, jnp.float32)
        if self.prev_gray is None:
            self.prev_gray = gl
            self.frame_idx += 1
            return {"skipped": True, "reason": "first frame"}

        f = self._frame(gl, gr, self.prev_gray)
        self.prev_gray = gl
        self.frame_idx += 1
        if float(f.flow_p95) < self.cfg.min_flow_p95:
            self.prev_frame = f
            return {"skipped": True, "reason": "low motion",
                    "flow_p95": float(f.flow_p95)}

        labels, sizes = self._cluster(f.pts_xyz, f.pts_valid)
        lab = np.asarray(labels)
        uniq = [int(u) for u in np.unique(lab) if u >= 0]
        uniq = uniq[:self.cfg.max_clusters]

        clusters = []
        if self.prev_frame is not None:
            # rigid-model fit per cluster: CURRENT 3D (from disparity)
            # against the flow-warped PREVIOUS pixel rays — the
            # reference's EpipPoint pairing (img0 = img1 - flow, obj1
            # from current disparity; ref tracker.cpp:166-200), fit per
            # cluster by PnP-RANSAC (:518-693). The recovered T maps
            # current camera coords to the previous camera: inverse
            # per-cluster motion.
            uv = f.pts_uv
            iy = jnp.clip(uv[:, 1].astype(jnp.int32), 0, gl.shape[0] - 1)
            ix = jnp.clip(uv[:, 0].astype(jnp.int32), 0, gl.shape[1] - 1)
            prev_uv = uv - f.flow[iy, ix]
            in_img = ((prev_uv[:, 0] >= 0) & (prev_uv[:, 0] < gl.shape[1])
                      & (prev_uv[:, 1] >= 0) & (prev_uv[:, 1] < gl.shape[0]))
            prev_norm = jnp.stack(
                [(prev_uv[:, 0] - self.cam.cx) / self.cam.fx,
                 (prev_uv[:, 1] - self.cam.cy) / self.cam.fy], axis=-1)
            key = jax.random.PRNGKey(self.frame_idx)
            for ci, u in enumerate(uniq):
                member = jnp.asarray(lab == u) & f.pts_valid & in_img
                if int(member.sum()) < 8:
                    continue
                res = self._rigid(f.pts_xyz, prev_norm, member,
                                  jax.random.fold_in(key, ci))
                clusters.append({
                    "label": u, "size": int((lab == u).sum()),
                    "rigid_inliers": int(res.n_inliers),
                    "ok": bool(res.ok),
                    "T": np.asarray(res.T_cw),
                })
        self.prev_frame = f
        return {"skipped": False, "flow_p95": float(f.flow_p95),
                "n_points": int(f.pts_valid.sum()), "clusters": clusters}
