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


MAX_CLOSED_LOOPS = 16


class SlamEngine:
    """Stereo visual odometry / SLAM over a fixed-capacity device map.

    Pass a trained Vocabulary to enable loop detection + closing
    (the mapping()-thread work of ref src/pipeline.cpp:98-141).
    """

    def __init__(self, cfg: Optional[SlamConfig] = None,
                 cam: Optional[StereoCamera] = None,
                 vocab=None):
        self.cfg = cfg or SlamConfig()
        self.cam = cam or StereoCamera.from_config(self.cfg.camera)
        self.vocab = vocab
        self.map = empty_map(self.cfg)
        self.T_cw = jnp.eye(4)
        self.velocity = jnp.eye(4)          # dT: T_cur = dT @ T_prev
        self.frame_id = 0
        self.n_keyframes = 0
        self.trajectory: List[np.ndarray] = []      # poses as processed
        # keyframe-anchored trajectory: (kf_slot, T_frame . T_kf^-1) per
        # frame, so loop-closure corrections to keyframes retro-correct
        # every frame (the reference's rigid non-KF re-attachment,
        # ref src/loopcloser.cpp:195-208)
        self._traj_anchor: List[tuple] = []
        self.frame_stats: List[dict] = []
        self.loop_events: List[dict] = []
        if vocab is not None:
            from slam_toolkit_tpu.loop.detector import ConsistencyTracker
            f = self.cfg.map.max_keyframes
            self.bow_db = jnp.zeros((f, vocab.num_words))
            self.consistency = ConsistencyTracker(
                self.cfg.loop.consistency_threshold)
            self.closed_i = jnp.zeros(MAX_CLOSED_LOOPS, jnp.int32)
            self.closed_j = jnp.zeros(MAX_CLOSED_LOOPS, jnp.int32)
            self.closed_T = jnp.tile(jnp.eye(4), (MAX_CLOSED_LOOPS, 1, 1))
            self.closed_valid = jnp.zeros(MAX_CLOSED_LOOPS, bool)
            self.n_closed = 0
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

        if self.vocab is not None:
            from slam_toolkit_tpu.loop import closer as closer_mod
            from slam_toolkit_tpu.loop import detector as det_mod
            from slam_toolkit_tpu.loop import vocab as vocab_mod
            voc = self.vocab

            @jax.jit
            def _bow(desc, valid):
                return vocab_mod.bow_vector(voc, desc, valid)

            @jax.jit
            def _loop_score(m, bow_db, query, slot):
                return det_mod.score_query(m, bow_db, query, slot, cfg.loop)

            @jax.jit
            def _covis(m, slot):
                return det_mod.covisibility_counts(m, slot)

            @jax.jit
            def _relpose(m, cur, cand):
                return closer_mod.relative_pose(m, cur, cand, cam, cfg)

            @jax.jit
            def _close(m, cur, cand, T_loop, ci, cj, cT, cv):
                m = closer_mod.close_loop(m, cur, cand, T_loop, ci, cj, cT,
                                          cv, cfg)
                return closer_mod.merge_mappoints(m, cur, cand, cam, cfg)

            self._bow, self._loop_score, self._covis = _bow, _loop_score, _covis
            self._relpose, self._close = _relpose, _close

    # ----- driver -----------------------------------------------------------
    def process(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        """Track one stereo pair; returns the estimated T_cw (4, 4)."""
        import time
        self._t_frame0 = time.perf_counter()
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
        if self.n_keyframes >= self.cfg.map.max_keyframes:
            # capacity guard: first-free-slot allocation would silently
            # overwrite slot 0; refuse instead (culling lands later)
            raise RuntimeError(
                f"keyframe capacity {self.cfg.map.max_keyframes} exhausted")
        frame = self._stereo(frame, img_l, img_r)
        if ids is None:
            L = self.cfg.map.track_landmarks
            ids = jnp.zeros((L,), jnp.int32)
            kpts = jnp.zeros((L,), jnp.int32)
            inliers = jnp.zeros((L,), bool)
        self.map, slot = self._insert(self.map, frame, T_cw,
                                      jnp.int32(self.frame_id), ids, kpts,
                                      inliers)
        self.n_keyframes += 1
        if self.vocab is not None:
            self._loop_step(frame, int(slot))
        if run_ba and self.n_keyframes >= 3:
            self.map = self._ba(self.map)

    # ----- loop closing (the mapping-thread work) ----------------------------
    def _loop_step(self, frame, slot: int):
        q = self._bow(frame.feats.desc, frame.feats.valid)
        self.bow_db = self.bow_db.at[slot].set(q)
        if self.n_keyframes < 3:
            return
        sc = self._loop_score(self.map, self.bow_db, q, jnp.int32(slot))
        cand_mask = np.asarray(sc.candidates)
        if not cand_mask.any():
            self.consistency.update([])
            return
        scores = np.asarray(sc.scores)
        cand_slots = np.flatnonzero(cand_mask)
        # covisibility group per candidate (candidate + its neighbors)
        groups = []
        for cs in cand_slots:
            cov = np.asarray(self._covis(self.map, jnp.int32(int(cs))))
            grp = set(np.flatnonzero(
                cov >= self.cfg.loop.min_covisibility).tolist())
            grp.add(int(cs))
            groups.append(grp)
        accepted = self.consistency.update(groups)
        if not accepted:
            return
        # strongest consistent candidate first (ref picks most matches)
        accepted.sort(key=lambda ci: -scores[cand_slots[ci]])
        for ci in accepted:
            cand = int(cand_slots[ci])
            rel = self._relpose(self.map, jnp.int32(slot), jnp.int32(cand))
            if not bool(rel.ok):
                continue
            # the loop *measurement* uses the pre-closure candidate pose
            loop_T = rel.T_cw @ se3.inv(self.map.kf_T_cw[cand])
            self.map = self._close(
                self.map, jnp.int32(slot), jnp.int32(cand), rel.T_cw,
                self.closed_i, self.closed_j, self.closed_T,
                self.closed_valid)
            k = self.n_closed % MAX_CLOSED_LOOPS
            self.closed_i = self.closed_i.at[k].set(cand)
            self.closed_j = self.closed_j.at[k].set(slot)
            self.closed_T = self.closed_T.at[k].set(loop_T)
            self.closed_valid = self.closed_valid.at[k].set(True)
            self.n_closed += 1
            self.consistency.reset()
            self.loop_events.append(
                {"frame": self.frame_id, "kf_slot": slot, "cand": cand,
                 "inliers": int(rel.n_inliers)})
            break

    def _finish_frame(self, T_cw, n_inliers: int, is_kf: bool):
        self.T_cw = T_cw
        T_np = np.asarray(T_cw)
        self.trajectory.append(T_np)
        slot = self._latest_slot()
        T_kf = np.asarray(self.map.kf_T_cw[slot])
        self._traj_anchor.append((slot, T_np @ np.linalg.inv(T_kf)))
        import time
        elapsed_ms = 1000.0 * (time.perf_counter()
                               - getattr(self, "_t_frame0", time.perf_counter()))
        # per-frame wall clock, the reference's FrameInfo::elapsed_ms_
        # (ref src/pipeline.cpp:144,209-212)
        self.frame_stats.append(
            {"frame": self.frame_id, "inliers": n_inliers, "kf": is_kf,
             "elapsed_ms": round(elapsed_ms, 2)})
        self.frame_id += 1

    def trajectory_refined(self) -> List[np.ndarray]:
        """Per-frame poses re-expressed against CURRENT keyframe poses,
        so pose-graph/BA corrections propagate to the whole trajectory."""
        kf_T = np.asarray(self.map.kf_T_cw)
        return [rel @ kf_T[slot] for slot, rel in self._traj_anchor]

    # ----- introspection ----------------------------------------------------
    def num_mappoints(self) -> int:
        return int(self.map.mp_valid.sum())

    def keyframe_poses(self) -> np.ndarray:
        valid = np.asarray(self.map.kf_valid)
        return np.asarray(self.map.kf_T_cw)[valid]
