"""Chunked on-device SLAM driver: lax.scan over frames, zero per-frame
host round-trips.

This is the design SURVEY.md §3.5 prescribes: everything from ORB
extraction through pose LM and local BA lives inside ONE jitted program;
the host touches the device once per CHUNK (upload C stereo pairs, read
back C packed result rows). The keyframe decision — the reference's only
host-side branch (ref src/pipeline.cpp:302-306) — runs on-device inside
lax.cond, including stereo extraction, landmark supply, local BA, and
the landmark-snapshot refresh.

Loop detection/closing and keyframe culling remain host-orchestrated
between chunks (they are rare and need small host bookkeeping), exactly
like the reference's second thread.
"""

from __future__ import annotations

import os
import queue as queue_mod
import sys
import threading
import time as time_mod
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.frontend.frame import add_stereo, build_frame
from slam_toolkit_tpu.frontend.tracker import track_pose
from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.mapping import keyframe as kf_rule
from slam_toolkit_tpu.mapping.ba_adapter import local_ba_step
from slam_toolkit_tpu.mapping.map_state import (MapState, camera_frustum,
                                                empty_map,
                                                gather_local_landmarks,
                                                insert_keyframe)


class ChunkCarry(NamedTuple):
    m: MapState
    T_cw: jnp.ndarray          # (4, 4)
    velocity: jnp.ndarray      # (4, 4)
    lm_Xw: jnp.ndarray         # (L, 3) landmark snapshot
    lm_desc: jnp.ndarray       # (L, 8)
    lm_ids: jnp.ndarray        # (L,)
    lm_valid: jnp.ndarray      # (L,)
    latest_slot: jnp.ndarray   # () int32
    latest_T: jnp.ndarray      # (4, 4) pose of the latest keyframe
    frame_id: jnp.ndarray      # () int32
    inlier_peak: jnp.ndarray   # () f32 running max inliers since last KF
    # photometric anchor (tracker.method "direct"/"hybrid" only; None —
    # an empty pytree node — for the indirect method, so the indirect
    # carry's shape and the vmapped mesh layouts are unchanged)
    kf_img: Optional[jnp.ndarray] = None   # (H, W) latest keyframe image
    kf_ab: Optional[jnp.ndarray] = None    # (2,) affine brightness (a, b)
    # hybrid only: anchor pattern intensities per landmark (L, 8),
    # hoisted to the keyframe event so the per-frame polish skips the
    # reference_values pass
    kf_refvals: Optional[jnp.ndarray] = None


PACK_WIDTH = 16 + 16 + 4  # T, T_rel, [slot, ok, kf, n_inliers]


def make_frame_body(cfg: SlamConfig, cam: StereoCamera):
    """The complete per-frame step as a pure scan body:
    (carry, (frame, left, right)) -> (carry, packed(36,)).

    Tracking, keyframe rule, and — under lax.cond — stereo supply,
    keyframe insertion, weak-mappoint culling, local BA, and the
    landmark-snapshot refresh. Used sequentially by the chunked scan
    driver below and vmapped over sequences by parallel/mesh.py (where
    the batched cond lowers to masked execution of both branches —
    the honest SPMD cost of divergent control flow)."""

    import os as _os
    # trace-time profiling knobs (scripts/profile_bench_stages.py):
    # SLAM_SCAN_STAGE=extract  -> extraction only (response sum packed so
    #                             XLA cannot dead-code the extractor)
    # SLAM_SCAN_STAGE=track    -> extraction + tracking, KF branch skipped
    # unset/full               -> the real engine body
    # SLAM_SCAN_SKIP=a,b       -> skip KF-branch components (stereo,
    #                             insert, cull, snapshot) for cost splits
    # SLAM_SCAN_FORCE_KF=1     -> keyframe every frame (fixes the KF rate
    #                             across skip variants so deltas are
    #                             per-event costs, not workload shifts)
    _stage = _os.environ.get("SLAM_SCAN_STAGE", "full")
    _skip = set(filter(None,
                       _os.environ.get("SLAM_SCAN_SKIP", "").split(",")))
    _force_kf = bool(_os.environ.get("SLAM_SCAN_FORCE_KF"))
    _direct = cfg.tracker.method == "direct"
    _hybrid = cfg.tracker.method == "hybrid"
    if _direct or _hybrid:
        from slam_toolkit_tpu.frontend.direct_tracker import track_direct
        from slam_toolkit_tpu.frontend.matching import projection_match
        from slam_toolkit_tpu.frontend.tracker import TrackResult
        from slam_toolkit_tpu.geometry import camera as cam_mod
        from slam_toolkit_tpu.optim import direct_lm
        from slam_toolkit_tpu.optim.direct_lm import DirectState

    def _direct_track(carry: ChunkCarry, frame, left, T_pred):
        """Photometric pose against the latest keyframe image carried in
        the chunk (ref BrightenDirectPoseTracker, src/posetracker.cpp:
        250-353), then post-hoc keypoint binding for the same map
        bookkeeping the indirect path produces (ref :278-317) — the
        scan-body twin of pipeline/engine._track_dir, with the anchor
        image device-resident in ChunkCarry.kf_img so the whole method
        stays inside the fused chunk program."""
        ref_state = DirectState(T_cw=carry.latest_T, a=carry.kf_ab[0],
                                b=carry.kf_ab[1])
        dres = track_direct(carry.kf_img, ref_state, left, T_pred,
                            cam.left, carry.lm_Xw, carry.lm_valid)
        T_dir = se3.normalize(dres.state.T_cw)
        mm = projection_match(carry.lm_Xw, carry.lm_desc, carry.lm_valid,
                              frame.feats, T_dir, cam, cfg.matcher,
                              cfg.tracker.direct_bind_px)
        Xc = se3.transform(T_dir, carry.lm_Xw)
        uv = cam_mod.project(cam.left, Xc)
        err_px = jnp.linalg.norm(uv - frame.feats.xy[mm.kpt_idx], axis=-1)
        inlier = mm.ok & (Xc[..., 2] > 0.0) & \
            (err_px <= cfg.tracker.direct_bind_px)
        n_in = jnp.sum(inlier)
        ok = n_in >= cfg.tracker.min_matches
        res = TrackResult(T_cw=T_dir, mp_kpt=mm.kpt_idx,
                          mp_xy=frame.feats.xy[mm.kpt_idx],
                          mp_inlier=inlier, n_matches=mm.n_matches,
                          n_inliers=n_in, ok=ok)
        return res, jnp.stack([dres.state.a, dres.state.b])

    def _hybrid_polish(carry: ChunkCarry, left, res0):
        """Indirect seed + a short full-resolution photometric polish
        against the carried anchor keyframe (r4 verdict #5; ref
        BrightenDirectPoseTracker src/posetracker.cpp:250-353 wired as
        a REFINEMENT instead of a replacement: the 8-point-pattern
        basin cannot absorb KITTI's 0.8 m/frame motion — measured ATE
        2.454 m for full direct — but a seeded polish starts inside
        the basin and only sharpens sub-pixel alignment). The anchor's
        pattern intensities ride the carry (kf_refvals, computed once
        per keyframe event), so the per-frame cost is the LM
        iterations only. A polish that moves the camera center more
        than hybrid_max_shift_m is rejected: centimeters mean
        refinement, more means the photometric model disagreed
        (occlusion / brightness break)."""
        st0 = DirectState(T_cw=res0.T_cw, a=carry.kf_ab[0],
                          b=carry.kf_ab[1])
        dres = direct_lm.optimize_direct(
            st0, left, cam.left, carry.lm_Xw, carry.kf_refvals,
            carry.lm_valid, 1.0, iters=cfg.tracker.hybrid_iters)
        T_dir = se3.normalize(dres.state.T_cw)
        c0 = -res0.T_cw[:3, :3].T @ res0.T_cw[:3, 3]
        c1 = -T_dir[:3, :3].T @ T_dir[:3, 3]
        okp = res0.ok & (jnp.linalg.norm(c1 - c0)
                         < cfg.tracker.hybrid_max_shift_m)
        T = jnp.where(okp, T_dir, res0.T_cw)
        ab = jnp.where(okp, jnp.stack([dres.state.a, dres.state.b]),
                       carry.kf_ab)
        return res0._replace(T_cw=T), ab

    def frame_body(carry: ChunkCarry, xs):
        frame, left, right = xs
        if _stage == "extract":
            packed = jnp.zeros((PACK_WIDTH,), jnp.float32).at[0].set(
                jnp.sum(frame.feats.response) + jnp.sum(left) * 0.0
                + jnp.sum(right) * 0.0)
            return carry, packed
        T_pred = se3.compose(carry.velocity, carry.T_cw)
        if _direct:
            res, ab_new = _direct_track(carry, frame, left, T_pred)
        elif _hybrid:
            res = track_pose(frame, carry.lm_Xw, carry.lm_desc,
                             carry.lm_valid, T_pred, cam, cfg)
            res, ab_new = _hybrid_polish(carry, left, res)
        else:
            res = track_pose(frame, carry.lm_Xw, carry.lm_desc,
                             carry.lm_valid, T_pred, cam, cfg)
            ab_new = None
        matched_xy = res.mp_xy
        n_inl = res.n_inliers.astype(jnp.float32)
        needs = (kf_rule.needs_keyframe(
            matched_xy, res.mp_inlier, cfg.camera.width, cfg.camera.height,
            cfg.keyframe) | ~res.ok |
            (n_inl < cfg.keyframe.decay_ratio * carry.inlier_peak))
        if _force_kf:
            needs = jnp.bool_(True)
        peak_new = jnp.where(needs, 0.0,
                             jnp.maximum(carry.inlier_peak, n_inl))
        T_new = jnp.where(res.ok, res.T_cw, T_pred)
        vel_new = se3.normalize(se3.compose(T_new, se3.inv(carry.T_cw)))

        def kf_branch(op):
            from slam_toolkit_tpu.mapping.culling import cull_weak_mappoints
            m, fr = op
            fr2 = fr if "stereo" in _skip else \
                add_stereo(fr, left, right, cam, cfg)
            if "insert" in _skip:
                m2, slot = m, carry.latest_slot
            else:
                m2, slot = insert_keyframe(m, fr2, T_new, carry.frame_id,
                                           carry.lm_ids, res.mp_kpt,
                                           res.mp_inlier, cfg,
                                           lm_snapshot=(carry.lm_Xw,
                                                        carry.lm_valid))
            if "cull" not in _skip:
                m2 = cull_weak_mappoints(m2, carry.frame_id,
                                         cfg.map.mp_cull_grace_frames,
                                         cfg.map.mp_cull_min_obs)
            # local BA runs unconditionally: with <3 keyframes every
            # window pose is gauge-fixed and the solve is a no-op.
            # (SLAM_SCAN_NO_BA: profiling knob, scripts/profile_scan_*)
            if _os.environ.get("SLAM_SCAN_NO_BA"):
                m3 = m2
            else:
                m3 = local_ba_step(m2, cam, cfg)
            if "snapshot" in _skip:
                lm = (carry.lm_Xw, carry.lm_desc, carry.lm_ids,
                      carry.lm_valid)
            else:
                lm = gather_local_landmarks(
                    m3, cfg.map.track_landmarks, cfg.map.track_recent_kfs,
                    cfg.map.track_covis_kfs, cfg.map.track_covis_min,
                    camera_frustum(cfg.camera))
            # direct/hybrid: this keyframe becomes the photometric
            # anchor — its image paired with the BA-refined pose (the
            # best estimate of where the image was captured). Hybrid
            # additionally hoists the anchor's pattern intensities for
            # the NEW landmark snapshot here, so per-frame polishes
            # skip the reference_values pass.
            if _hybrid:
                ref_st = DirectState(T_cw=m3.kf_T_cw[slot],
                                     a=ab_new[0], b=ab_new[1])
                refvals = direct_lm.reference_values(
                    ref_st, left, cam.left, lm[0], lm[3], 1.0)
            else:
                refvals = None
            return (m3, lm, slot.astype(jnp.int32), m3.kf_T_cw[slot],
                    left if (_direct or _hybrid) else None, refvals)

        def no_branch(op):
            m, _ = op
            lm = (carry.lm_Xw, carry.lm_desc, carry.lm_ids, carry.lm_valid)
            return (m, lm, carry.latest_slot, carry.latest_T,
                    carry.kf_img, carry.kf_refvals)

        if _stage == "track":
            m_new, lm, slot, latest_T, kf_img, refvals = no_branch(
                (carry.m, frame))
        else:
            m_new, lm, slot, latest_T, kf_img, refvals = jax.lax.cond(
                needs, kf_branch, no_branch, (carry.m, frame))
        # the keyframe pose may have moved in BA; report the map's version
        T_out = jnp.where(needs, latest_T, T_new)
        T_rel = se3.compose(T_out, se3.inv(latest_T))
        packed = jnp.concatenate([
            T_out.reshape(-1), T_rel.reshape(-1),
            jnp.stack([slot.astype(jnp.float32),
                       res.ok.astype(jnp.float32),
                       needs.astype(jnp.float32),
                       res.n_inliers.astype(jnp.float32)])])
        new_carry = ChunkCarry(
            m=m_new, T_cw=T_out, velocity=vel_new,
            lm_Xw=lm[0], lm_desc=lm[1], lm_ids=lm[2], lm_valid=lm[3],
            latest_slot=slot, latest_T=latest_T,
            frame_id=carry.frame_id + 1,
            inlier_peak=peak_new, kf_img=kf_img,
            # (a, b) carries forward EVERY frame — the anchor's
            # brightness is the latest tracked estimate, exactly like
            # engine.process's per-frame `self._kf_ab = packed[35:37]`
            kf_ab=ab_new, kf_refvals=refvals)
        return new_carry, packed

    return frame_body


def make_chunk_fn(cfg: SlamConfig, cam: StereoCamera):
    """Returns jit(chunk)(carry, images (C, 2, H, W)) -> (carry, (C, 36)).

    Extraction is streamed inside the scan (batching it ahead was
    measured slower; see the NOTE below); the scan body is the full
    per-frame step from make_frame_body."""

    frame_body = make_frame_body(cfg, cam)

    from functools import partial

    # donate the carry: without donation every chunk call must preserve
    # its input buffers, so the first in-place update of each map array
    # inside the scan forces a full copy (one copy of kf_xy/kf_desc/
    # kf_obs/mp_* per chunk — tens of MB of HBM traffic and several
    # copy-start stalls per dispatch, visible in scripts/trace_chunk.py)
    @partial(jax.jit, donate_argnums=0)
    def chunk(carry: ChunkCarry, images: jnp.ndarray):
        # NOTE: batching extraction over the chunk with vmap before the
        # scan was tried and is SLOWER (136 -> 119 fps): materializing
        # C FrameStates + pyramids to HBM costs more than the small-level
        # utilization gain. Keep extraction streamed inside the scan.
        def body(c, stereo):
            frame = build_frame(stereo[0], cam, cfg)
            return frame_body(c, (frame, stereo[0], stereo[1]))
        return jax.lax.scan(body, carry, images)

    return chunk


class ChunkedSlamEngine:
    """Host driver over device chunks; loop closing between chunks."""

    def __init__(self, cfg: Optional[SlamConfig] = None,
                 cam: Optional[StereoCamera] = None, vocab=None,
                 chunk_size: int = 8):
        self.cfg = cfg or SlamConfig()
        self.cam = cam or StereoCamera.from_config(self.cfg.camera)
        self.vocab = vocab
        self.chunk_size = chunk_size
        self._chunk = make_chunk_fn(self.cfg, self.cam)
        # device-resident carry reused across chunks; None whenever host
        # machinery (bootstrap / loop closure / culling) mutated the map,
        # forcing a rebuild from host mirrors. The chunk program DONATES
        # its input carry (avoids per-chunk copies of the map arrays), so
        # this cache — and the host mirrors synced right after each
        # dispatch — are the ONLY live device references; pending chunks
        # hold packed outputs, never carries.
        self._carry_cache: Optional[ChunkCarry] = None
        # in-flight chunk queue (oldest first). Depth 2: dispatching two
        # chunks ahead of the readback hides the host<->device round-trip
        # behind device execution (at depth 1 every fold waits a full
        # RTT; on this environment's TCP relay that was ~half the wall
        # time). Host-side mapping work (loop closure) lags one more
        # chunk — the same staleness the reference's mapping thread has.
        self._pending: List[dict] = []
        self._queue_depth = int(os.environ.get("SLAM_QUEUE_DEPTH", "2"))
        # phase-1 detections awaiting their covis prefetch (consumed one
        # fold later by _loop_phase2)
        self._loop_stash: List[dict] = []
        # accepted loop candidates whose relative-pose measurement is in
        # flight: dispatched at detection time, consumed one fold later
        # (_finish_pending_closures) — the closure pipeline never blocks
        # a fold on the relpose/close programs, the same tracking-never-
        # waits-for-mapping property as the reference's second thread
        # (ref src/pipeline.cpp:98-141)
        self._closure_pend: List[dict] = []
        # host mirror of keyframe frame-ids (slot -> fid), filled at fold
        # time from the packed rows — closure dedup reads it instead of
        # syncing kf_frame_id off the newest in-flight chunk
        self._kf_fid_host = np.full(
            (self.cfg.map.max_keyframes,), -1, np.int64)
        # closure-snapshot counts awaiting consumption at the next carry
        # rebuild (see _finish_pending_closures / _carry)
        self._pending_counts = None
        self.n_replays = 0                         # closures that landed while
        #                                            chunks were in flight (the
        #                                            tracking head re-seeded
        #                                            through its anchor)
        # chunked relocalization (VERDICT r3 #6): consecutive lost
        # frames across folds; fold-time BoW reloc fires at
        # cfg.loop.reloc_lost_streak, then blocks until the correction
        # has propagated through the in-flight chunks
        self._lost_streak = 0
        self._reloc_block_fid = -1

        # tracking-head re-seed across a closure: the head pose relative
        # to the latest keyframe is preserved, the keyframe itself moved
        @jax.jit
        def _reseed(T_cw, latest_T_old, latest_T_new):
            return se3.compose(se3.compose(T_cw, se3.inv(latest_T_old)),
                               latest_T_new)

        self._reseed_fn = _reseed
        if self.cfg.tracker.method == "hybrid":
            from slam_toolkit_tpu.optim import direct_lm as _dlm
            cam_left = self.cam.left

            @jax.jit
            def _refvals(img, T, ab, Xw, valid):
                st = _dlm.DirectState(T_cw=T, a=ab[0], b=ab[1])
                return _dlm.reference_values(st, img, cam_left, Xw,
                                             valid, 1.0)

            self._refvals_fn = _refvals
        # reuse the classic engine for bootstrap + loop/cull machinery
        from slam_toolkit_tpu.pipeline.engine import SlamEngine
        self._host = SlamEngine(self.cfg, self.cam, vocab=vocab)
        # the pose-graph tier must cover keyframes the in-flight chunks
        # may have inserted beyond the host mirror's count
        self._host._tier_margin = 2 + self._queue_depth * chunk_size
        self.trajectory: List[np.ndarray] = []
        self._traj_anchor: List[tuple] = []
        self.frame_stats: List[dict] = []
        # rows folded by _ensure_headroom's internal flush, owed to the
        # caller on the next process_chunk/flush return
        self._owed_rows: List[np.ndarray] = []

        # ---- mapping worker (the reference's second thread, ref
        # src/pipeline.cpp:95,98-141): loop detection phases run on a
        # background thread so a FOLD never blocks on closure host work
        # (~170 ms of sync/dispatch stalls clustered around the closure
        # event, scripts/profile_consume.py r4). The lock serializes
        # every h.map/bow_db READER-DISPATCHER against the worker's
        # closure mutations — mandatory because chunk dispatches DONATE
        # the map buffers the closure programs read. Blocking device
        # syncs stay off the lock path via the is_ready aging in
        # _finish_pending_closures. SLAM_LOOP_THREAD=0 restores the
        # inline (deterministic) order for debugging.
        #
        # SINGLE-WRITER INVARIANT (r4 advisor): the plain host counters
        # h.frame_id / h.n_keyframes / _kf_fid_host / frame_stats are
        # written by the MAIN thread only (_fold_one, lock-free) and
        # only READ by the worker (closure cooldown gate, closure dedup)
        # — scalar/ndarray-cell reads that are each individually atomic
        # under the GIL. A worker that ever WRITES one of these fields
        # must first take _loop_lock AND _fold_one must start locking
        # its mutation block; don't add such a write casually.
        self._loop_lock = threading.RLock()
        # SLAM_FOLD_PROF=1: accumulate wall time per pipeline segment
        # (dispatch, fold readback, fold host loop, loop phases) and
        # print the totals at flush — attributes the host/relay side of
        # the loop-vs-headline fps gap (the device side is profiled by
        # scripts/profile_loop_overhead.py)
        self._prof: Optional[dict] = \
            {} if os.environ.get("SLAM_FOLD_PROF") else None
        self._loop_thread_on = (vocab is not None and
                                os.environ.get("SLAM_LOOP_THREAD", "1")
                                == "1")
        self._loop_worker_err: Optional[BaseException] = None
        if self._loop_thread_on:
            self._loop_jobs: queue_mod.Queue = queue_mod.Queue()
            t = threading.Thread(target=self._loop_worker_main,
                                 daemon=True, name="slam-mapping")
            t.start()
            self._loop_worker = t

    def _pf(self, name: str, t0: float) -> None:
        """Accumulate wall time into the SLAM_FOLD_PROF profile (no-op
        when profiling is off). GIL-atomic float add — safe from both
        the main thread and the mapping worker."""
        if self._prof is not None:
            self._prof[name] = self._prof.get(name, 0.0) \
                + (time_mod.perf_counter() - t0)

    def _loop_worker_main(self) -> None:
        while True:
            job = self._loop_jobs.get()
            try:
                if job is None:
                    return
                kind, args = job
                tp = time_mod.perf_counter()
                with self._loop_lock:
                    self._pf("wk_lock_wait", tp)
                    tp = time_mod.perf_counter()
                    if kind == "p1":
                        self._loop_phase1(*args)
                        self._pf("wk_p1", tp)
                    elif kind == "p2":
                        self._loop_phase2()
                        self._pf("wk_p2", tp)
            except BaseException as e:     # surfaced at the next flush
                self._loop_worker_err = e
            finally:
                self._loop_jobs.task_done()

    def _drain_loop_jobs(self) -> None:
        if self._loop_thread_on:
            self._loop_jobs.join()
        if self._loop_worker_err is not None:
            err, self._loop_worker_err = self._loop_worker_err, None
            raise err

    @property
    def map(self) -> MapState:
        self.flush()
        return self._host.map

    def warmup(self):
        """Pre-compile the rare-path programs (loop closure) so their
        first real firing doesn't stall the timed pipeline."""
        self._host.warmup_loop_programs()
        eye = jnp.eye(4, dtype=jnp.float32)
        jax.block_until_ready(self._reseed_fn(eye, eye, eye))

    @property
    def loop_events(self):
        return self._host.loop_events

    def _carry(self) -> ChunkCarry:
        h = self._host
        if self._pending_counts is not None:
            # a closure's snapshot counts landed (async copy had a fold
            # of device time): sync the latest-slot mirror so the carry's
            # latest_slot matches the latest_T it ships with
            h._latest_slot_host = int(np.asarray(self._pending_counts)[0])
            self._pending_counts = None
        lm = h._lm
        photo = self.cfg.tracker.method in ("direct", "hybrid")
        kf_img = jnp.asarray(h._kf_img, jnp.float32) if photo else None
        kf_ab = jnp.asarray(h._kf_ab, jnp.float32) if photo else None
        refvals = None
        if self.cfg.tracker.method == "hybrid":
            # carry rebuilds are rare (bootstrap / closure / cull); one
            # jitted dispatch recomputes the anchor pattern intensities
            refvals = self._refvals_fn(kf_img, h._latest_kf_T_dev,
                                       kf_ab, lm[0], lm[3])
        return ChunkCarry(
            m=h.map, T_cw=h.T_cw, velocity=h.velocity,
            lm_Xw=lm[0], lm_desc=lm[1], lm_ids=lm[2], lm_valid=lm[3],
            latest_slot=jnp.int32(h._latest_slot_host),
            latest_T=h._latest_kf_T_dev,
            # h.frame_id advances at FOLD time; a carry rebuilt while
            # chunks are still in flight (pipelined closure) must seed
            # the device counter past their frames or keyframes of the
            # next chunk get duplicate/backdated frame ids, skewing the
            # min_kf_gap insertion gate and cull-grace arithmetic (r3
            # advisor, medium)
            frame_id=jnp.int32(h.frame_id
                               + sum(p["n"] for p in self._pending)),
            # conservative reset on carry rebuilds (bootstrap / loop
            # closure / cull): only delays the next decay-rule keyframe
            inlier_peak=jnp.float32(0.0),
            # direct/hybrid: the photometric anchor mirrors (set by the
            # host bootstrap / refreshed at dispatch time)
            kf_img=kf_img, kf_ab=kf_ab, kf_refvals=refvals)

    def process_chunk(self, images) -> np.ndarray:
        """images: (C, 2, H, W) float32 (numpy or device).

        Pipelined: dispatches THIS chunk, then folds any chunk beyond the
        queue depth (whose readback overlaps newer chunks' device
        execution — the device never idles between chunks). Returns that
        chunk's (C, 36) packed rows [T(16), T_rel(16), slot, ok, kf,
        n_inliers] (empty while the queue fills); call flush() (or any
        state-reading helper, which flushes for you) to drain.
        """
        import time
        t0 = time.perf_counter()
        if self._host.n_keyframes == 0:
            # bootstrap the first keyframe through the host engine
            first = np.asarray(images[0])
            self._host.process(first[0], first[1])
            self.trajectory.append(self._host.trajectory[-1])
            self._traj_anchor.append(self._host._traj_anchor[-1])
            self.frame_stats.append(self._host.frame_stats[-1])
            self._kf_fid_host[self._host._latest_slot_host] = 0
            images = images[1:]
            if len(images) == 0:
                return np.zeros((0, PACK_WIDTH), np.float32)

        self._ensure_headroom(len(images))
        imgs = images if isinstance(images, jnp.ndarray) \
            else jnp.asarray(images, jnp.float32)
        self._dispatch(imgs, t0)

        self._reissue_copies()
        rows, self._owed_rows = self._owed_rows, []
        # SLAM_FOLD_BATCH=k (default 1): let the queue grow k-1 chunks
        # deeper and fold k chunks per drain cycle. Through a
        # high-latency relay the first fetch of a fold cycle pays a
        # queue-drain barrier (~21 ms here regardless of async copies);
        # batching folds amortizes that barrier over k chunks at the
        # cost of k-1 chunks of extra host-state staleness.
        batch = int(os.environ.get("SLAM_FOLD_BATCH", "1"))
        if len(self._pending) > self._queue_depth + (batch - 1):
            while len(self._pending) > self._queue_depth:
                rows.append(self._fold_one())
        return np.concatenate(rows, axis=0) if rows else \
            np.zeros((0, PACK_WIDTH), np.float32)

    def _dispatch(self, imgs, t0: float) -> None:
        """Run one chunk and re-point every host device-state mirror at
        the output carry — the input carry's buffers are DONATED to the
        call and dead the moment it is issued. Holds the loop lock: the
        mapping worker dispatches closure programs against the SAME
        buffers this call donates."""
        tp = time_mod.perf_counter()
        with self._loop_lock:
            self._pf("dispatch_lock_wait", tp)
            self._dispatch_locked(imgs, t0)

    def _dispatch_locked(self, imgs, t0: float) -> None:
        tp = time_mod.perf_counter()
        carry_in = self._carry_cache if self._carry_cache is not None \
            else self._carry()
        carry, packed = self._chunk(carry_in, imgs)
        self._carry_cache = carry
        self._pf("dispatch_chunk", tp)
        tp = time_mod.perf_counter()
        sc_entry = None
        if self.vocab is not None:
            # dispatch this chunk's BoW registration + scoring NOW (it
            # reads keyframe slots from the packed DEVICE output — no
            # host data needed). By the time this chunk is folded, two
            # more chunks of device time have passed, so the score
            # readback in _loop_phase1 is a cheap sync instead of
            # blocking on in-flight chunks. The entry rides in the
            # chunk's OWN pending dict so fold-order perturbations (the
            # reloc drain's reentrant _fold_one) can never pair a
            # chunk's packed rows with another chunk's scores (r4
            # advisor, medium).
            sc_entry = self._loop_dispatch(carry.m, packed)
        self._pf("dispatch_bow", tp)
        # start the device->host copy of the packed per-frame outputs
        # NOW: by the time this chunk is folded (queue_depth dispatches
        # later) the bytes are already host-side, so _fold_one's
        # np.asarray doesn't pay a synchronous device round-trip per
        # chunk (through this environment's TCP relay that round-trip
        # was ~30 ms — larger than the chunk's device time)
        try:
            packed.copy_to_host_async()
        except Exception:   # non-jax arrays in tests / older runtimes
            pass
        h = self._host
        h.map = carry.m
        h.T_cw = carry.T_cw
        h.velocity = carry.velocity
        h._lm = (carry.lm_Xw, carry.lm_desc, carry.lm_ids, carry.lm_valid)
        h._latest_kf_T_dev = carry.latest_T
        if carry.kf_img is not None:      # direct-method anchor mirrors
            h._kf_img, h._kf_ab = carry.kf_img, carry.kf_ab
        self._pending.append({"packed": packed, "t0": t0,
                              "n": int(imgs.shape[0]),
                              "sc": sc_entry,
                              # last stereo pair, kept on device for a
                              # possible fold-time relocalization (no
                              # copy — chunk images are never donated)
                              "last_img": imgs[-1]})

    def flush(self) -> np.ndarray:
        """Drain every in-flight chunk (no-op when nothing is pending).
        Loop-score entries are 1:1 with pending chunks and drain with
        them. Rows folded early by _ensure_headroom are returned here."""
        rows, self._owed_rows = self._owed_rows, []
        while self._pending:
            rows.append(self._fold_one())
        if self._owed_rows:
            # a fold above triggered a reloc drain of the chunks behind
            # it — their rows landed in _owed_rows, in order
            rows.extend(self._owed_rows)
            self._owed_rows = []
        if self.vocab is not None:
            self._drain_loop_jobs()      # mapping worker catches up
            with self._loop_lock:
                if self._loop_stash:
                    # the last chunks' detections are still a fold or
                    # two behind
                    self._loop_phase2(force=True)
                # a relpose dispatched by the final phase2 has no later
                # fold to land in — finish it now (blocks on its result)
                self._finish_pending_closures()
        if self._prof:
            sys.stderr.write("[fold-prof] " + "  ".join(
                f"{k}={v * 1000.0:.0f}ms"
                for k, v in sorted(self._prof.items())) + "\n")
        return np.concatenate(rows, axis=0) if rows else \
            np.zeros((0, PACK_WIDTH), np.float32)

    def _reissue_copies(self) -> None:
        """Re-issue device->host async copies for pending results whose
        COMPUTATION has had a chunk of device time to finish.

        copy_to_host_async only populates the host cache when the value
        already exists; issued at dispatch time (before the program
        runs) it is silently lost, and the eventual np.asarray pays a
        full synchronous relay round trip (~23 ms here — measured:
        fetch-after-landed-async-copy 0.2 ms vs 23 ms without). Called
        once per process_chunk; a redundant re-copy of an
        already-cached value costs microseconds."""
        for p in self._pending[:-1]:
            targets = [p["packed"]]
            sc = p.get("sc")
            if sc is not None:
                targets.append(sc["sc"])
            for a in targets:
                try:
                    jax.tree_util.tree_map(
                        lambda x: x.copy_to_host_async(), a)
                except Exception:       # non-jax arrays in tests
                    pass

    def _fold_one(self) -> np.ndarray:
        """Fold the oldest pending chunk's results into host state — all
        host arithmetic; an extra device sync here would pay the relay
        round-trip a second time. Device-state mirrors (map, poses,
        landmark snapshot) were already re-pointed at dispatch time (the
        carry is donated chunk-to-chunk); this folds the packed PER-FRAME
        outputs only."""
        import time
        if not self._pending:
            return np.zeros((0, PACK_WIDTH), np.float32)
        p = self._pending.pop(0)
        tp = time_mod.perf_counter()
        packed_np = np.asarray(p["packed"])       # ONE readback per chunk
        self._pf("fold_readback", tp)
        tp = time_mod.perf_counter()

        h = self._host
        h.frame_id += len(packed_np)
        n_new_kf = int(packed_np[:, 34].sum())
        h.n_keyframes += n_new_kf
        if not p.get("counted", False):
            # a _refresh_kf_mirrors (closure / cull) may have recounted
            # the valid keyframes from the map, which already contains
            # this chunk's insertions — adding them again would inflate
            # the mirror and force spurious capacity culls
            h._n_kf_valid_host += n_new_kf
        h._latest_slot_host = int(packed_np[-1, 32])

        dt_ms = 1000.0 * (time.perf_counter() - p["t0"]) \
            / max(len(packed_np), 1)
        base_fid = h.frame_id - len(packed_np)
        for i, row in enumerate(packed_np):
            self.trajectory.append(row[:16].reshape(4, 4))
            self._traj_anchor.append((int(row[32]), row[16:32].reshape(4, 4)))
            if row[34] > 0.5:
                self._kf_fid_host[int(row[32])] = base_fid + i
            self.frame_stats.append({"inliers": int(row[35]),
                                     "kf": bool(row[34] > 0.5),
                                     "ok": bool(row[33] > 0.5),
                                     "elapsed_ms": round(dt_ms, 2)})

        self._pf("fold_host_rows", tp)
        tp = time_mod.perf_counter()
        # host-side mapping-thread work between chunks, two phases so no
        # fold ever blocks on a fresh dispatch: consume the PREVIOUS
        # chunk's stashed detection (its covis rows were dispatched one
        # fold ago and async-copied — by now they're host-side), then
        # read this chunk's scores and dispatch ITS covis prefetch. The
        # extra chunk of detection lag is the same staleness the
        # reference's mapping thread has (ref src/pipeline.cpp:98-141).
        if self.vocab is not None:
            # ---- chunked relocalization (VERDICT r3 #6) --------------
            # the reference has NO recovery at all (constant velocity
            # forever, ref src/pipeline.cpp:154-166); the per-frame
            # engine relocs per lost frame — here a lost STREAK at fold
            # time triggers one BoW reloc on the chunk's last image
            # any >=threshold run of lost rows triggers reloc — even if
            # later rows flipped back to ok: the forced-keyframe path
            # re-locks tracking LOCALLY onto a garbage-pose keyframe
            # within ~2 frames, so a trailing-only streak never sees a
            # sustained loss (the global pose is still wrong)
            ok_rows = packed_np[:, 33] > 0.5
            streak, fire = self._lost_streak, False
            for okf in ok_rows:
                streak = 0 if okf else streak + 1
                if streak >= self.cfg.loop.reloc_lost_streak:
                    fire = True
            self._lost_streak = streak
            if (fire and h.frame_id >= self._reloc_block_fid
                    and h.n_keyframes >= 2):
                # reloc against the NEWEST dispatched image, not the
                # folded one: the recovered pose re-seeds the tracking
                # HEAD, which is queue_depth chunks ahead of this fold
                head_img = self._pending[-1]["last_img"] \
                    if self._pending else p["last_img"]
                self._try_chunked_reloc(head_img)

            # base_fid is captured NOW: the worker may run phase1 after
            # later folds have advanced h.frame_id
            base_fid = h.frame_id - len(packed_np)
            self._pf("fold_reloc_gate", tp)
            tp = time_mod.perf_counter()
            if self._loop_thread_on:
                self._loop_jobs.put(("p2", ()))
                if p["sc"] is not None:
                    self._loop_jobs.put(("p1", (p["sc"], packed_np,
                                                base_fid)))
            else:
                self._loop_phase2()
                if p["sc"] is not None:
                    self._loop_phase1(p["sc"], packed_np, base_fid)
            self._pf("fold_phases", tp)
            if n_new_kf:
                self._host._precompile_tiers_async()
        return packed_np

    def _try_chunked_reloc(self, last_img) -> None:
        """Fold-time BoW relocalization for the chunked engine: extract
        the folded chunk's last image, rank keyframes via the BoW db,
        re-track the best (engine._try_relocalize), and on success
        re-seed the tracking head with the recovered pose. The frames
        in flight tracked garbage from the lost pose — their packed
        rows stay as recorded (the reference records garbage forever,
        having no recovery at all); the NEXT dispatched chunk starts
        from the recovered pose at zero velocity. While the occlusion
        itself persists the attempt fails cheaply and retries next
        fold."""
        h = self._host
        with self._loop_lock:
            frame = h._build(last_img[0])
            reloc_T = h._try_relocalize(frame)
            if reloc_T is None:
                return
            h.T_cw = reloc_T
            h.velocity = jnp.eye(4, dtype=jnp.float32)
            self._carry_cache = None
            self._lost_streak = 0
            # block re-attempts until the correction has flowed through
            # the queued chunks (they still fold with pre-reloc poses)
            self._reloc_block_fid = h.frame_id \
                + sum(p["n"] for p in self._pending) + self.chunk_size
        # drain the in-flight chunks NOW (their rows are garbage-pose
        # bookkeeping anyway): the next dispatched chunk then starts
        # immediately after the image the pose was recovered FROM —
        # without the drain, queue_depth*chunk frames of staleness sit
        # between the recovered pose and the next chunk's first frame,
        # which re-loses tracking under fast motion. Reentrant on
        # purpose (called from _fold_one); the drained rows are owed to
        # the caller.
        while self._pending:
            self._owed_rows.append(self._fold_one())

    def _ensure_headroom(self, n_next: int):
        """Cull redundant keyframes when the ring nears capacity (the scan
        program inserts blindly; headroom must exist before dispatch).
        n_next: frame count of the batch about to be dispatched — every
        frame of it may become a keyframe."""
        h = self._host
        cap = self.cfg.map.max_keyframes
        in_flight = sum(p["n"] for p in self._pending)
        est = h._n_kf_valid_host + in_flight
        if est < cap - n_next - 2:
            return
        rows = self.flush()              # mirrors must be fresh to cull
        if len(rows):
            self._owed_rows.append(rows)
        # the cull path refreshes mirrors directly; stale closure counts
        # must not overwrite the fresher slot mirror at the next rebuild
        self._pending_counts = None
        while h._n_kf_valid_host >= cap - n_next - 2:
            kf_T_pre = np.asarray(h.map.kf_T_cw)
            h.map, slot = h._cull(h.map)
            s = int(slot)
            if s < 0:
                # forced eviction (see engine._make_keyframe): degrade,
                # don't crash, when nothing clears the redundancy bar
                h.map, slot = h._cull_any(h.map)
                s = int(slot)
            if s < 0:
                raise RuntimeError(
                    f"keyframe capacity {cap} exhausted (all protected)")
            h._refresh_kf_mirrors()
            new_anchor = h._latest_slot_host
            T_new_inv = np.linalg.inv(kf_T_pre[new_anchor])
            for i, (sl, rel) in enumerate(self._traj_anchor):
                if sl == s:
                    self._traj_anchor[i] = (
                        new_anchor, (rel @ kf_T_pre[s]) @ T_new_inv)
        self._carry_cache = None

    def _loop_dispatch(self, map_dev, packed_dev) -> None:
        """BoW-register + score one chunk's new keyframes in ONE batched
        dispatch (engine._bow_register) fed the chunk's DEVICE output
        (zero uploads; keyframe slots/flags are sliced on device), queued
        with an async readback. Dispatched right after the chunk program
        itself (_dispatch), consumed when the chunk is folded — by then
        the queue-depth pipeline has given the scores two chunks of
        device time to land host-side, so the fold's sync is nearly
        free. The per-KF eager version of this (kf_desc[slot] gather,
        bow_db.at[slot].set, one _loop_score dispatch each) compiled a
        fresh remote program per distinct slot and paid a relay
        round-trip per keyframe — it dominated loop-mode wall time
        (scripts/profile_loop_stages.py). Returns the score entry; the
        caller stores it in the chunk's _pending dict (structural
        chunk<->score pairing, r4 advisor medium)."""
        h = self._host
        h.bow_db, sc = h._bow_register(map_dev, h.bow_db, packed_dev)
        try:
            jax.tree_util.tree_map(lambda x: x.copy_to_host_async(), sc)
        except Exception:       # non-jax arrays in tests
            pass
        return {"sc": sc}

    def _loop_phase1(self, entry: dict, packed_np: np.ndarray,
                     base_fid: Optional[int] = None) -> None:
        """Read one folded chunk's scores (already host-side via the
        dispatch-time async copy), dispatch the covis prefetch for ALL
        its candidates, and stash the detection for the NEXT fold —
        the covis readback then overlaps a full chunk of device time
        instead of blocking this fold (~30 ms through the relay,
        scripts/profile_consume.py).

        Also dispatches a SPECULATIVE relative pose for each keyframe's
        top-scoring candidate: if phase 2's consistency check accepts
        that candidate next fold, its measurement has already overlapped
        a chunk of device time and the closure lands on the same fold
        the old synchronous flow closed on — with none of its blocking.
        A wrong guess costs one wasted rare-event dispatch."""
        from slam_toolkit_tpu.pipeline.engine import BOW_ROWS
        h = self._host
        kf_rows = np.flatnonzero(packed_np[:, 34] > 0.5)
        if len(kf_rows) == 0:
            return
        # sc rows are the chunk's keyframe rows in ascending order —
        # the top_k priority in _bow_register guarantees exactly this
        n_cap = min(len(kf_rows), BOW_ROWS)
        cand_np = np.asarray(entry["sc"].candidates)[:n_cap]
        scores_np = np.asarray(entry["sc"].scores)[:n_cap]
        if len(kf_rows) > BOW_ROWS:
            # the batched register/score program processes the first
            # BOW_ROWS keyframes per chunk (engine._bow_register).
            # Overflow rows are registered AND scored here in
            # fixed-shape batches (rare path; no recompiles) and feed
            # the same detection flow below — the reference detects on
            # EVERY keyframe (ref src/loopdetector.cpp:38-154); the
            # old registration-only fallback silently skipped detection
            # for keyframes 5+ of a chunk (r4 verdict #6). Registration
            # itself is mandatory regardless: an unregistered dense BoW
            # row is all-zero and scores 0.5 against every normalized
            # query, a persistent false loop/reloc candidate (r3
            # advisor, medium). The np.asarray reads are synchronous —
            # acceptable on a path the ~1-KF-per-5-frames decay rule
            # almost never takes.
            extra = packed_np[kf_rows[BOW_ROWS:], 32].astype(np.int32)
            ex_c, ex_s = [], []
            for j in range(0, len(extra), BOW_ROWS):
                batch = extra[j:j + BOW_ROWS]
                pad = np.zeros(BOW_ROWS, np.int32)
                pad[:len(batch)] = batch
                vmask = np.zeros(BOW_ROWS, bool)
                vmask[:len(batch)] = True
                h.bow_db, sc2 = h._bow_register_only(
                    h.map, h.bow_db, jnp.asarray(pad),
                    jnp.asarray(vmask))
                ex_c.append(np.asarray(sc2.candidates)[:len(batch)])
                ex_s.append(np.asarray(sc2.scores)[:len(batch)])
            cand_np = np.concatenate([cand_np] + ex_c, axis=0)
            scores_np = np.concatenate([scores_np] + ex_s, axis=0)
            sys.stderr.write(f"[loop] chunk with {len(kf_rows)} "
                             f"keyframes; {len(extra)} overflow rows "
                             f"registered + scored synchronously\n")
        slots = packed_np[kf_rows, 32].astype(np.int32)
        covis_dev, cand_all = None, None
        spec = {}
        if h.n_keyframes >= 3:
            cand_all = np.unique(np.concatenate(
                [np.flatnonzero(cand_np[i]) for i in range(len(kf_rows))]))
            if len(cand_all):
                padn = 8 * ((len(cand_all) + 7) // 8)
                pad = np.zeros(padn, np.int32)
                pad[:len(cand_all)] = cand_all
                covis_dev = h._covis(h.map, jnp.asarray(pad))
                try:
                    covis_dev.copy_to_host_async()
                except Exception:       # non-jax arrays in tests
                    pass
            # speculate ONLY when the consistency tracker is one step
            # from accepting (a live group at streak >= threshold-1):
            # the relpose program costs ~50+ ms of DEVICE time, and
            # speculating on every BoW candidate measurably slowed the
            # non-closure folds it was meant to protect
            hot = any(n >= h.consistency.threshold - 1
                      for _, n in h.consistency.groups)
            for i, s in enumerate(slots) if hot else ():
                mask = cand_np[i]
                if not mask.any():
                    continue
                top = int(np.argmax(np.where(mask, scores_np[i], -1.0)))
                rel, pk = h._relpose(h.map, jnp.int32(int(s)),
                                     jnp.int32(top))
                try:
                    pk.copy_to_host_async()
                except Exception:       # non-jax arrays in tests
                    pass
                spec[int(s)] = (top, (rel, pk))
        self._loop_stash.append({
            "kf_rows": kf_rows, "slots": slots, "cand_np": cand_np,
            "scores_np": scores_np, "covis_dev": covis_dev,
            "cand_all": cand_all, "spec": spec,
            "base_fid": (h.frame_id - len(packed_np)
                         if base_fid is None else base_fid)})

    def _loop_phase2(self, force: bool = False) -> None:
        """Consistency + (pipelined) closure for the stashed detection
        (TWO folds old): engine._detect_accept per keyframe with covis
        rows from the phase-1 prefetch; an accepted candidate's relative
        pose is DISPATCHED here and consumed one fold later
        (_finish_pending_closures) so no fold ever blocks on the
        relpose or close programs — closure latency rides the same
        mapping-thread staleness as everything else
        (ref src/pipeline.cpp:98-141).

        Stash entries age one EXTRA fold before consumption (force=True
        at flush consumes regardless): with one fold of aging the covis
        np.asarray still cost ~16 ms/chunk through this environment's
        relay while the score readback — aged 2-3 folds by the
        dispatch-time async copy — was free (SLAM_FOLD_PROF r5). The
        extra chunk of detection latency is the reference's own
        mapping-thread staleness."""
        h = self._host
        tp = time_mod.perf_counter()
        self._finish_pending_closures()
        self._pf("p2_finish", tp)
        for st in self._loop_stash:
            st["age"] = st.get("age", 0) + 1
            if st["age"] == 1 and st["covis_dev"] is not None:
                # the covis program has now had a fold of device time —
                # re-issue the async copy so next fold's consumption is
                # a host-cache hit (see _reissue_copies)
                try:
                    st["covis_dev"].copy_to_host_async()
                except Exception:       # non-jax arrays in tests
                    pass
        while self._loop_stash and (force or
                                    self._loop_stash[0]["age"] >= 2):
            st = self._loop_stash.pop(0)
            covis_of = None
            tp = time_mod.perf_counter()
            if st["covis_dev"] is not None:
                rows = np.asarray(st["covis_dev"])[:len(st["cand_all"])]
                covis_of = {int(s): rows[i]
                            for i, s in enumerate(st["cand_all"])}
            self._pf("p2_covis_read", tp)
            tp = time_mod.perf_counter()
            for i, (r, s) in enumerate(zip(st["kf_rows"], st["slots"])):
                fid = st["base_fid"] + int(r)
                cands = h._detect_accept(int(s), st["cand_np"][i],
                                         st["scores_np"][i], covis_of,
                                         fid)
                if cands:
                    # EVERY accepted keyframe queues its candidates —
                    # two keyframes of one chunk can both accept, and
                    # only the second may measure ok (observed on the
                    # bench clothoid: slot 16's attempt failed at 34
                    # inliers, slot 17's 122-inlier closure was the one
                    # that mattered); the finisher walks pends in order
                    # and the post-closure cooldown drops the rest.
                    # The sync flow tried EVERY accepted candidate in
                    # score order until one measured ok — missing a
                    # fallback here silently skips closures. Keep the
                    # speculative hit first (already a fold old =
                    # ready), fresh-dispatch the rest as fallbacks
                    # consumed only if it fails.
                    spec = st["spec"].get(int(s))
                    hit = spec is not None and spec[0] == cands[0]
                    rels = [spec] if hit else []
                    for cand in cands[0 if not hit else 1:4]:
                        rel, pk = h._relpose(h.map, jnp.int32(int(s)),
                                             jnp.int32(cand))
                        try:
                            pk.copy_to_host_async()
                        except Exception:   # non-jax arrays in tests
                            pass
                        rels.append((int(cand), (rel, pk)))
                    self._closure_pend.append(
                        {"slot": int(s), "fid": fid, "rels": rels,
                         "ready": hit})
        self._finish_pending_closures(ready_only=True)

    def _finish_pending_closures(self, ready_only: bool = False) -> None:
        """Consume relative-pose measurements dispatched one fold ago
        (their results are host-side via the async copy): dedup, close,
        refresh the device mirrors WITHOUT any readback (a closure moves
        poses/landmarks but never changes slot validity), and re-seed
        the tracking head through the latest-keyframe anchor. The old
        drain-and-replay path folded every in-flight chunk synchronously
        here (~1.9 s per closure through the relay — the entire gap
        between loop-mode and headline fps); in-flight chunks now keep
        folding normally, their packed outputs being anchor-relative.

        ready_only: only consume entries whose measurements have aged a
        fold (speculative hits are born ready) AND whose device results
        have actually LANDED (jax.Array.is_ready) — a fold must not
        block on a relpose the busy device hasn't delivered yet
        (observed ~50 ms stalls one fold after detection,
        scripts/profile_consume.py r4). Entries are force-consumed
        after 3 extra folds so a wedged readiness probe cannot starve
        the closure."""
        h = self._host
        remaining = []
        while self._closure_pend:
            pc = self._closure_pend.pop(0)
            if ready_only:
                age = pc.get("age", 1 if pc.get("ready", True) else 0)
                pc["age"] = age + 1
                landed = age >= 1
                if landed and age < 4:
                    try:
                        landed = all(pk.is_ready()
                                     for _, (_, pk) in pc["rels"])
                    except AttributeError:
                        pass        # backend without is_ready: block
                if not landed:
                    # computation pending or just landed — (re-)issue
                    # the async copies so the eventual consumption hits
                    # the host cache (see _reissue_copies)
                    for _, (_, pk2) in pc["rels"]:
                        try:
                            pk2.copy_to_host_async()
                        except Exception:   # non-jax arrays in tests
                            pass
                    remaining.append(pc)
                    continue
            if (h.n_keyframes - h._last_closure_nkf
                    < h.cfg.loop.closure_cooldown_kfs):
                continue        # a closure landed since this detection
            for cand, (rel, pk) in pc["rels"]:
                # ONE fetch per measurement: [T(16), n, ok, scale,
                # n_near] — per-field reads cost a ~30 ms relay round
                # trip EACH (the closure event spent ~0.5 s in small
                # fetches, SLAM_FOLD_PROF r5)
                vals = np.asarray(pk)
                if os.environ.get("SLAM_LOOP_DEBUG"):
                    sys.stderr.write(
                        f"[fin] fid={pc['fid']} slot={pc['slot']} "
                        f"cand={cand} ok={vals[17] > 0.5} "
                        f"inl={int(vals[16])} "
                        f"near={int(vals[19])}\n")
                if not vals[17] > 0.5:
                    continue
                fid_cand = int(self._kf_fid_host[cand])
                if h._closure_is_dup(pc["fid"], fid_cand,
                                     int(vals[16])):
                    continue
                latest_T_old = h._latest_kf_T_dev
                h._dispatch_close(pc["slot"], cand, rel, pc["fid"],
                                  fid_cand, vals=vals)
                # mirrors: landmark snapshot + latest-KF pose from the
                # corrected map — one dispatch. The snapshot's latest
                # slot INCLUDES in-flight chunks' inserts, while the
                # folded host mirror lags — rebuilding the carry with
                # the snapshot's latest_T but the stale mirror slot
                # mismatched every post-closure frame's packed anchor
                # (measured: clothoid seam 1.647 -> 2.805 m). Stash the
                # counts with an async copy; _carry() consumes them at
                # the rebuild, one fold later, without ever blocking.
                h._lm, h._latest_kf_T_dev, counts = h._snapshot(h.map)
                try:
                    counts.copy_to_host_async()
                except Exception:       # non-jax arrays in tests
                    pass
                self._pending_counts = counts
                h.T_cw = self._reseed_fn(h.T_cw, latest_T_old,
                                         h._latest_kf_T_dev)
                self._carry_cache = None     # next dispatch re-seeds
                self.n_replays += 1
                # prefetched covis rows (pre-merge counts) are stale
                # and would silently shape the NEXT detection's accScore
                # groups (VERDICT r2 weak #5). RE-DISPATCH them now
                # against the corrected map (the close program is
                # already in the device stream, so these read post-merge
                # counts) instead of just dropping: the None fallback
                # made the next fold's _detect_accept dispatch + read
                # covis SYNCHRONOUSLY (~100 ms observed at the closure
                # fold, scripts/profile_consume.py r4)
                for later in self._loop_stash:
                    ca = later.get("cand_all")
                    if ca is None or not len(ca):
                        later["covis_dev"] = None
                        continue
                    padn = 8 * ((len(ca) + 7) // 8)
                    pad = np.zeros(padn, np.int32)
                    pad[:len(ca)] = ca
                    later["covis_dev"] = h._covis(h.map,
                                                  jnp.asarray(pad))
                    try:
                        later["covis_dev"].copy_to_host_async()
                    except Exception:   # non-jax arrays in tests
                        pass
                break
        self._closure_pend = remaining

    def trajectory_refined(self) -> List[np.ndarray]:
        self.flush()
        kf_T = np.asarray(self._host.map.kf_T_cw)
        return [rel @ kf_T[slot] for slot, rel in self._traj_anchor]

    def run(self, frames) -> None:
        """Convenience: iterate (left, right) pairs in chunks."""
        buf = []
        for left, right in frames:
            buf.append(np.stack([left, right]))
            if len(buf) == self.chunk_size:
                self.process_chunk(np.stack(buf))
                buf = []
        if buf:
            self.process_chunk(np.stack(buf))
        self.flush()
