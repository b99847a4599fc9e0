"""The SLAM engine: host driver around jitted device programs.

TPU-native counterpart of the reference Pipeline (ref src/pipeline.cpp):
the two-thread producer/consumer design (tracking thread + mapping
thread over one mutex-protected map, :95-141) becomes a handful of
jitted pure functions over an immutable MapState pytree, dispatched
asynchronously by the JAX runtime — tracking of frame N+1 can overlap
local BA of keyframe N without locks because states are values, not
shared memory.

Per-frame hot path (ref Track(), :143-225):
  build_frame -> constant-velocity predict -> gather local landmarks ->
  track_pose (match + LM + filter) -> keyframe rule
Keyframe path (ref :198-204 producer + AddMappoints :243-262):
  add_stereo -> insert_keyframe (supply mappoints) -> local BA
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.frontend.frame import FrameState, add_stereo, build_frame
from slam_toolkit_tpu.frontend.tracker import TrackResult, track_pose
from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.mapping import keyframe as kf_rule
from slam_toolkit_tpu.mapping.ba_adapter import local_ba_step
from slam_toolkit_tpu.mapping.map_state import (MapState, empty_map,
                                                gather_local_landmarks,
                                                insert_keyframe)


class SlamEngine:
    """Stereo visual odometry / SLAM over a fixed-capacity device map."""

    def __init__(self, cfg: Optional[SlamConfig] = None,
                 cam: Optional[StereoCamera] = None):
        self.cfg = cfg or SlamConfig()
        self.cam = cam or StereoCamera.from_config(self.cfg.camera)
        self.map = empty_map(self.cfg)
        self.T_cw = jnp.eye(4)
        self.velocity = jnp.eye(4)          # dT: T_cur = dT @ T_prev
        self.frame_id = 0
        self.n_keyframes = 0
        self.trajectory: List[np.ndarray] = []
        self.frame_stats: List[dict] = []
        self._compile()

    # ----- jitted programs -------------------------------------------------
    def _compile(self):
        cfg, cam = self.cfg, self.cam

        @jax.jit
        def _build(img):
            return build_frame(img, cam, cfg)

        @jax.jit
        def _stereo(frame, img_l, img_r):
            return add_stereo(frame, img_l, img_r, cam, cfg)

        @jax.jit
        def _track(m: MapState, frame: FrameState, T_pred):
            Xw, desc, ids, valid = gather_local_landmarks(
                m, cfg.map.track_landmarks, cfg.map.track_recent_kfs)
            res = track_pose(frame, Xw, desc, valid, T_pred, cam, cfg)
            matched_xy = frame.feats.xy[res.mp_kpt]
            needs = kf_rule.needs_keyframe(
                matched_xy, res.mp_inlier, cfg.camera.width,
                cfg.camera.height, cfg.keyframe)
            return res, ids, needs

        @jax.jit
        def _insert(m, frame, T_cw, frame_id, ids, kpts, inliers):
            return insert_keyframe(m, frame, T_cw, frame_id, ids, kpts,
                                   inliers, cfg)

        @jax.jit
        def _ba(m):
            return local_ba_step(m, cam, cfg)

        self._build, self._stereo = _build, _stereo
        self._track, self._insert, self._ba = _track, _insert, _ba

    # ----- driver -----------------------------------------------------------
    def process(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        """Track one stereo pair; returns the estimated T_cw (4, 4)."""
        img_l = jnp.asarray(left, jnp.float32)
        img_r = jnp.asarray(right, jnp.float32)
        frame = self._build(img_l)

        if self.n_keyframes == 0:
            self._make_keyframe(frame, img_l, img_r, self.T_cw,
                                ids=None, kpts=None, inliers=None,
                                run_ba=False)
            self._finish_frame(self.T_cw, n_inliers=0, is_kf=True)
            return np.asarray(self.T_cw)

        T_pred = self.velocity @ self.T_cw
        res, ids, needs_kf = self._track(self.map, frame, T_pred)

        tracked_ok = bool(res.ok)
        T_new = res.T_cw if tracked_ok else T_pred
        self.velocity = se3.normalize(T_new @ se3.inv(self.T_cw))

        if bool(needs_kf) or not tracked_ok:
            self._make_keyframe(frame, img_l, img_r, T_new,
                                ids=ids, kpts=res.mp_kpt,
                                inliers=res.mp_inlier, run_ba=True)
            # poses may have shifted in BA; re-read the current one
            slot = self._latest_slot()
            T_new = self.map.kf_T_cw[slot]
        self._finish_frame(T_new, int(res.n_inliers), bool(needs_kf))
        return np.asarray(T_new)

    def _latest_slot(self) -> int:
        fid = jnp.where(self.map.kf_valid, self.map.kf_frame_id, -1)
        return int(jnp.argmax(fid))

    def _make_keyframe(self, frame, img_l, img_r, T_cw, ids, kpts, inliers,
                       run_ba: bool):
        frame = self._stereo(frame, img_l, img_r)
        K = frame.feats.xy.shape[0]
        if ids is None:
            L = self.cfg.map.track_landmarks
            ids = jnp.zeros((L,), jnp.int32)
            kpts = jnp.zeros((L,), jnp.int32)
            inliers = jnp.zeros((L,), bool)
        self.map, _ = self._insert(self.map, frame, T_cw,
                                   jnp.int32(self.frame_id), ids, kpts,
                                   inliers)
        self.n_keyframes += 1
        if run_ba and self.n_keyframes >= 3:
            self.map = self._ba(self.map)

    def _finish_frame(self, T_cw, n_inliers: int, is_kf: bool):
        self.T_cw = T_cw
        self.trajectory.append(np.asarray(T_cw))
        self.frame_stats.append(
            {"frame": self.frame_id, "inliers": n_inliers, "kf": is_kf})
        self.frame_id += 1

    # ----- introspection ----------------------------------------------------
    def num_mappoints(self) -> int:
        return int(self.map.mp_valid.sum())

    def keyframe_poses(self) -> np.ndarray:
        valid = np.asarray(self.map.kf_valid)
        return np.asarray(self.map.kf_T_cw)[valid]
