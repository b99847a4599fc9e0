"""End-to-end loop closure, relocalization, and scan-engine replay.

CI protection for the full detect -> consistency -> relative-pose ->
pose-graph -> mappoint-merge path (ref src/loopdetector.cpp:38-154 +
src/loopcloser.cpp:104-299) that previously lived only in
scripts/verify_loop.py, plus the engine's relocalization (absent from
the reference) and the chunked scan engine's closure-replay machinery
(pipeline/scan_engine.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_world, render_stereo
from slam_toolkit_tpu.evaluation.traj import ate_rmse
from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.loop import vocab as V
from slam_toolkit_tpu.ops.extractor import extract
from slam_toolkit_tpu.pipeline.engine import SlamEngine


def _circle_T_cw(n, radius):
    step = 2 * np.pi * radius / n
    yaw = 2 * np.pi / n
    T = np.eye(4, dtype=np.float32)
    out = []
    dT = np.asarray(se3.exp(jnp.asarray([0, 0, step, 0, yaw, 0.0],
                                        dtype=jnp.float32)))
    for _ in range(n):
        out.append(T.copy())
        T = np.asarray(se3.normalize(jnp.asarray(dT @ T)))
    return out


@pytest.fixture(scope="module")
def circle_setup():
    """Box room, 1.5 laps of a circle; a blind window mid-lap forces
    drift so the revisit genuinely needs explicit loop closure."""
    cfg = SlamConfig.tiny()
    # tex period (tex_size / texels_per_m) must exceed the 30 m wall
    # span: the default 21 m tiling creates REAL repeated structure, and
    # loop relative-pose locks onto texture-period-shifted solutions
    # whose aliased matches outnumber the true ones (measured 75 vs 54
    # on this circle — no robust estimator can reject a majority).
    # Real imagery does not tile; the synthetic world must not either
    # (same fix as bench.py's loop world).
    world = make_world(cfg, seed=5, half_width=15.0, half_length=15.0,
                      ground_y=1.6, tex_size=1024)
    n = 48
    gt = _circle_T_cw(n, radius=6.0)
    gt = gt + gt[:24]
    frames = [render_stereo(world, T) for T in gt]
    blind = np.random.default_rng(0)
    for i in range(24, 36):
        l, r = frames[i]
        frames[i] = (blind.uniform(0, 255, l.shape).astype(np.float32),
                     blind.uniform(0, 255, r.shape).astype(np.float32))
    ex = jax.jit(lambda im: extract(im, cfg.extractor))
    corpus = []
    for lf, _ in frames[::4]:
        f = ex(jnp.asarray(lf))
        corpus.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = V.train(np.concatenate(corpus), k=6, levels=3, seed=0)
    return cfg, world, gt, frames, voc


@pytest.fixture(scope="module")
def closed_run(circle_setup):
    cfg, world, gt, frames, voc = circle_setup
    eng = SlamEngine(cfg, vocab=voc)
    for lf, rf in frames:
        eng.process(lf, rf)
    return eng, gt


@pytest.mark.slow
def test_closure_fires(closed_run):
    eng, gt = closed_run
    closures = [e for e in eng.loop_events if "cand" in e]
    assert closures, f"no loop closure fired; events={eng.loop_events}"


def _seam_error(eng, n_revisit=24):
    """Mean distance between both visits' estimated centers of the same
    physical poses (frames i and 48+i). Odometry drift vs GT is large on
    this aggressive circle for closed and open runs alike, so map
    SELF-consistency at the seam is the signal loop closure owns."""
    traj = eng.trajectory_refined()

    def c(T):
        return np.linalg.inv(T)[:3, 3]

    return float(np.mean([np.linalg.norm(c(traj[48 + i]) - c(traj[i]))
                          for i in range(n_revisit)]))


@pytest.mark.slow
def test_closure_improves_seam_consistency(closed_run, circle_setup):
    cfg, world, gt, frames, voc = circle_setup
    eng, _ = closed_run
    seam_closed = _seam_error(eng)
    eng_open = SlamEngine(cfg)          # no vocab -> no loop closing
    for lf, rf in frames:
        eng_open.process(lf, rf)
    seam_open = _seam_error(eng_open)
    assert seam_closed < 3.0, f"closed seam {seam_closed:.2f} m"
    assert seam_closed < 0.7 * seam_open, \
        f"closure didn't help: {seam_closed:.2f} vs open {seam_open:.2f}"


@pytest.mark.slow
def test_closure_never_degrades_low_drift_loop(circle_setup):
    """Regression: on a LOW-drift revisit (no blind window) repeated
    re-closures of the already-consistent seam used to walk it from
    0.19 m to 5.9 m (each re-measurement injected its noise at full
    edge weight; one 27-inlier edge carried a 3.8 m error). The
    post-closure cooldown (the reference's unfinished last_loop_kf_,
    ORB-SLAM2's mLastLoopKFid+10), the ORB-SLAM2 min_matches=40 gate,
    the inlier-weighted loop edges, and the same-seam dedup must keep
    the closed seam at least as good as the open-loop one."""
    cfg, world, gt, frames, voc = circle_setup
    # un-blind the drift window: this is the low-drift variant
    clean = list(frames)
    for i in range(24, 36):
        clean[i] = render_stereo(world, gt[i])
    eng = SlamEngine(cfg, vocab=voc)
    for lf, rf in clean:
        eng.process(lf, rf)
    closures = [e for e in eng.loop_events if "cand" in e]
    assert closures, "no closure on the clean revisit"
    seam_closed = _seam_error(eng)
    eng_open = SlamEngine(cfg)
    for lf, rf in clean:
        eng_open.process(lf, rf)
    seam_open = _seam_error(eng_open)
    assert seam_closed <= seam_open + 0.05, \
        f"closure degraded a consistent map: {seam_closed:.2f} vs " \
        f"open {seam_open:.2f}"


@pytest.mark.slow
def test_closure_sim3_mode(circle_setup):
    """cfg.loop.pose_graph_group="sim3" (the reference's own TODO,
    ref src/loopcloser.cpp:107) must close the same loop end-to-end:
    the 7-DoF essential graph with a depth-ratio scale measurement.
    On stereo data the detected scale is ~1, so the correction must
    match the SE(3) graph's quality — this guards the full sim3 path
    (scale estimate -> sim3 loop edge -> solver -> t/s conversion ->
    invd rescale) against wiring regressions."""
    import dataclasses

    cfg, world, gt, frames, voc = circle_setup
    cfg3 = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, pose_graph_group="sim3"))
    eng = SlamEngine(cfg3, vocab=voc)
    for lf, rf in frames:
        eng.process(lf, rf)
    closures = [e for e in eng.loop_events if "cand" in e]
    assert closures, f"no sim3 closure fired; events={eng.loop_events}"
    seam = _seam_error(eng)
    assert seam < 3.0, f"sim3-mode seam error {seam:.2f} m"
    assert all(np.isfinite(T).all() for T in eng.trajectory_refined())
    # the closed-loop ring must record POST-correction UNIT-scale edges:
    # close_loop rescales anchored depths, so replaying the original
    # scaled measurement in a later solve would re-assert the removed
    # drift and re-multiply invd by it
    from slam_toolkit_tpu.geometry import sim3 as sim3_mod
    rec = np.asarray(sim3_mod.scale_of(eng.closed_T))
    valid = np.asarray(eng.closed_valid)
    np.testing.assert_allclose(rec[valid], 1.0, atol=1e-4)


@pytest.mark.slow
def test_global_match_fallback_when_projection_finds_nothing():
    """FeatureVector-equivalent fallback (loop/closer.relative_pose):
    when the revisit viewpoint offset exceeds the projection gate the
    projective seed finds nothing; the pose-prior-free global descriptor
    match must still recover the relative pose (the reference seeds loop
    matching from DBoW2 node groups for exactly this reason,
    TemplatedVocabulary.h:135-146). The gate is forced shut here with a
    sub-pixel projection radius."""
    import dataclasses

    from slam_toolkit_tpu.data.synthetic import make_sequence
    from slam_toolkit_tpu.geometry.camera import StereoCamera
    from slam_toolkit_tpu.loop.closer import relative_pose

    cfg = SlamConfig.tiny()
    cam = StereoCamera.from_config(cfg.camera)
    world, gt, frames = make_sequence(cfg, n_frames=8, seed=3, step=0.25)
    eng = SlamEngine(cfg)
    for lf, rf in frames:
        eng.process(lf, rf)
    m = eng.map
    fid = np.asarray(m.kf_frame_id)
    valid = np.asarray(m.kf_valid)
    slots = np.flatnonzero(valid)[np.argsort(fid[valid])]
    assert len(slots) >= 2
    cand, cur = int(slots[0]), int(slots[-1])

    # 0.05 px radius: the projective seed cannot match anything, so only
    # the global descriptor path can produce the relative pose (accept
    # threshold relaxed: this tiny 8-frame scene yields ~30 matches and
    # the test targets the fallback mechanism, not the production gate)
    shut = dataclasses.replace(
        cfg, matcher=dataclasses.replace(cfg.matcher,
                                         projection_radius=0.05),
        loop=dataclasses.replace(cfg.loop, min_matches=20))
    rel = relative_pose(m, jnp.int32(cur), jnp.int32(cand), cam, shut)
    assert bool(rel.ok), \
        f"global fallback failed: {int(rel.n_inliers)} inliers"
    T_got = np.asarray(rel.T_cw)
    T_true = np.asarray(m.kf_T_cw[cur])
    c_got = -T_got[:3, :3].T @ T_got[:3, 3]
    c_true = -T_true[:3, :3].T @ T_true[:3, 3]
    assert np.linalg.norm(c_got - c_true) < 0.3, \
        f"recovered center {c_got} vs true {c_true}"


@pytest.mark.slow
def test_relpose_refine_inert_when_initial_solve_rejected():
    """The re-match refinement (LoopConfig.relpose_refine_rounds) must
    be INERT when the initial solve fails the acceptance gate: on the
    bench clothoid an UNGATED refine re-matched around a wrong 34-inlier
    solve and manufactured 46 self-consistent inliers at a 4.3 m-wrong
    edge, stealing the closure from the genuine candidate one keyframe
    later (BASELINE.md r5). Gated correctly, rounds=1 must return the
    rounds=0 result bit-for-bit on a pair whose solve is rejected."""
    import dataclasses

    from slam_toolkit_tpu.data.synthetic import make_sequence
    from slam_toolkit_tpu.geometry.camera import StereoCamera
    from slam_toolkit_tpu.loop.closer import relative_pose

    cfg = SlamConfig.tiny()
    cam = StereoCamera.from_config(cfg.camera)
    world, gt, frames = make_sequence(cfg, n_frames=14, seed=3, step=0.25)
    eng = SlamEngine(cfg)
    for lf, rf in frames:
        eng.process(lf, rf)
    m = eng.map
    fid = np.asarray(m.kf_frame_id)
    valid = np.asarray(m.kf_valid)
    slots = np.flatnonzero(valid)[np.argsort(fid[valid])]
    assert len(slots) >= 3
    cand, cur = int(slots[1]), int(slots[-1])
    # starve the candidate group (landmarks anchored at cand dropped) so
    # the solve cannot reach min_matches — the rejected-solve scenario
    m_starved = m._replace(mp_valid=m.mp_valid & (m.mp_ref_kf != cand))

    def run(rounds):
        c = dataclasses.replace(cfg, loop=dataclasses.replace(
            cfg.loop, relpose_refine_rounds=rounds,
            relpose_stereo_aug=False))
        return relative_pose(m_starved, jnp.int32(cur), jnp.int32(cand),
                             cam, c)

    r0, r1 = run(0), run(1)
    assert not bool(r0.ok), \
        f"scenario failed to produce a rejected solve ({int(r0.n_inliers)})"
    assert not bool(r1.ok)
    assert int(r0.n_inliers) == int(r1.n_inliers)
    np.testing.assert_array_equal(np.asarray(r0.T_cw), np.asarray(r1.T_cw))


@pytest.mark.slow
def test_relpose_stereo_aug_geometry_exact():
    """The candidate-stereo augmentation (relpose_stereo_aug) must
    triangulate keyframe stereo rows to the SAME world positions the
    anchored-landmark parameterization stores: for every augmented
    keypoint that anchors a live landmark, the two positions coincide
    (same ray, same disparity depth)."""
    import dataclasses

    from slam_toolkit_tpu.data.synthetic import make_sequence
    from slam_toolkit_tpu.loop.closer import _candidate_group_landmarks
    from slam_toolkit_tpu.mapping.map_state import mappoint_positions_at

    cfg = SlamConfig.tiny()
    cfg = dataclasses.replace(cfg, loop=dataclasses.replace(
        cfg.loop, relpose_stereo_aug=True))
    world, gt, frames = make_sequence(cfg, n_frames=6, seed=3, step=0.25)
    eng = SlamEngine(cfg)
    for lf, rf in frames:
        eng.process(lf, rf)
    m = eng.map
    kfv = np.asarray(m.kf_valid)
    cand = int(np.flatnonzero(kfv)[0])
    cur = int(np.flatnonzero(kfv)[-1])

    L = cfg.loop.relpose_landmarks
    Xw, desc, valid = _candidate_group_landmarks(
        m, jnp.int32(cur), jnp.int32(cand), cfg)
    K = m.kf_norm.shape[1]
    assert Xw.shape[0] == L + K
    Xw_aug = np.asarray(Xw)[L:]
    aug_ok = np.asarray(valid)[L:]
    assert aug_ok.sum() > 50, f"too few augmented points: {aug_ok.sum()}"

    row = np.asarray(m.kf_obs[cand])
    ref = np.asarray(m.mp_ref_kf)
    mpv = np.asarray(m.mp_valid)
    kpt = np.asarray(m.mp_kpt)
    errs = []
    for k in range(K):
        mid = row[k]
        if mid < 0 or not mpv[mid] or ref[mid] != cand or not aug_ok[k] \
                or kpt[mid] != k:
            continue
        Xl = np.asarray(mappoint_positions_at(m, jnp.asarray([mid])))[0]
        errs.append(np.linalg.norm(Xl - Xw_aug[k]))
    assert len(errs) > 20, f"too few anchored pairs compared: {len(errs)}"
    assert np.median(errs) < 0.01, \
        f"aug triangulation disagrees with anchors: median {np.median(errs)}"


@pytest.mark.slow
def test_relocalization_recovers():
    """Blind the engine for a stretch while teleporting the camera back:
    constant velocity cannot recover, BoW relocalization must
    (pipeline/engine.py _try_relocalize; no reference counterpart —
    the reference always trusts constant velocity, src/pipeline.cpp
    :154-166)."""
    cfg = SlamConfig.tiny()
    world = make_world(cfg, seed=7, half_width=15.0, half_length=15.0,
                      ground_y=1.6)
    n = 24
    gt = _circle_T_cw(n, radius=6.0)
    # revisit the first 8 poses after 3 blind frames
    seq = gt + gt[:8]
    frames = [render_stereo(world, T) for T in seq]
    rng = np.random.default_rng(1)
    for i in range(n, n + 3):
        l, r = frames[i]
        frames[i] = (rng.uniform(0, 255, l.shape).astype(np.float32),
                     rng.uniform(0, 255, r.shape).astype(np.float32))
    ex = jax.jit(lambda im: extract(im, cfg.extractor))
    corpus = [np.asarray(f.desc)[np.asarray(f.valid)]
              for f in (ex(jnp.asarray(lf)) for lf, _ in frames[::4])]
    voc = V.train(np.concatenate(corpus), k=6, levels=3, seed=0)
    eng = SlamEngine(cfg, vocab=voc)
    for lf, rf in frames:
        eng.process(lf, rf)
    relocs = [e for e in eng.loop_events if "reloc_to" in e]
    assert relocs, f"no relocalization event; events={eng.loop_events}"
    # after recovery the tail must track again (finite, near GT)
    tail = eng.trajectory_refined()[n + 4:]
    tail_gt = seq[n + 4:]
    assert ate_rmse(tail, tail_gt) < 1.0


@pytest.mark.slow
def test_scan_engine_replay(circle_setup):
    """A closure landing while chunks are in flight rides the scan
    engine's pipelined finisher (_finish_pending_closures): no drain,
    the tracking head re-seeds through its anchor, and the run still
    produces a full-length, closure-corrected trajectory with every
    async resource (pends, stash, snapshot counts) consumed by flush."""
    from slam_toolkit_tpu.pipeline.scan_engine import ChunkedSlamEngine

    cfg, world, gt, frames, voc = circle_setup
    eng = ChunkedSlamEngine(cfg, vocab=voc, chunk_size=8)
    arr = np.stack([np.stack([l, r]) for l, r in frames])
    for i in range(0, len(arr), 8):
        eng.process_chunk(jnp.asarray(arr[i:i + 8], jnp.float32))
    eng.flush()
    closures = [e for e in eng.loop_events if "cand" in e]
    assert closures, "no closure through the scan engine"
    assert eng.n_replays >= 1, "closure never landed while chunks in flight"
    traj = eng.trajectory_refined()
    assert len(traj) == len(frames)
    assert all(np.isfinite(T).all() for T in traj)
    seam = _seam_error(eng)
    assert seam < 3.5, f"scan-engine seam error {seam:.2f} m"
    # the async closure pipeline leaves nothing dangling after flush
    assert eng._closure_pend == [], "unconsumed pending closures"
    assert eng._loop_stash == [], "unconsumed detection stash"
    # post-closure, any stashed covis prefetch from the pre-merge map
    # must have been dropped before shaping later accScore groups
    # (VERDICT r2 weak #5) — covered structurally: the finisher nulls
    # covis_dev on every remaining stash entry the moment it closes
    # (scan_engine._finish_pending_closures), and detection falls back
    # to a fresh covis dispatch (engine._detect_accept)


@pytest.mark.slow
def test_topw_dbow2_roundtrip_closure(circle_setup, tmp_path):
    """ORBvoc-format interop + sparse BoW, end to end: the trained
    vocabulary round-trips through the DBoW2 text format
    (ref TemplatedVocabulary.h:1338+ save/load), the engine is forced
    onto the top-w sparse BoW database (SURVEY §7.3 — the ORBvoc-scale
    representation), and a loop closure still fires on the revisit
    circle with seam quality comparable to the dense run."""
    import dataclasses
    cfg, world, gt, frames, voc = circle_setup
    p = str(tmp_path / "voc_dbow2.txt")
    V.save_dbow2_text(voc, p)
    voc2 = V.load_dbow2_text(p)
    assert voc2.num_words == voc.num_words

    cfg2 = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, bow_mode="topw",
                                      bow_top_words=256))
    eng = SlamEngine(cfg2, vocab=voc2)
    assert eng._bow_sparse
    assert isinstance(eng.bow_db, V.TopWBow)
    for lf, rf in frames:
        eng.process(lf, rf)
    closures = [e for e in eng.loop_events if "cand" in e]
    assert closures, \
        f"no closure via topw + dbow2 roundtrip; events={eng.loop_events}"
    seam = _seam_error(eng)
    assert seam < 3.0, f"topw closed seam {seam:.2f} m"


def test_chunked_relocalization_recovers():
    """The CHUNKED engine (the production path every benchmark runs)
    must also recover from sustained tracking loss: a lost streak in
    the packed fold output triggers a BoW relocalization on the folded
    chunk's last image and re-seeds the tracking head
    (scan_engine._try_chunked_reloc; VERDICT r3 #6 — previously only
    the per-frame engine could relocalize, and a sustained occlusion
    in chunked mode drifted forever)."""
    from slam_toolkit_tpu.pipeline.scan_engine import ChunkedSlamEngine

    cfg = SlamConfig.tiny()
    world = make_world(cfg, seed=7, half_width=15.0, half_length=15.0,
                      ground_y=1.6)
    n = 48                              # 7.5 deg/frame — trackable
    gt = _circle_T_cw(n, radius=6.0)
    # 32 frames of the circle, 6 blind frames DURING WHICH THE CAMERA
    # TELEPORTS back to gt[4], then 20 more frames: constant velocity
    # predicts the far side of the circle, so only BoW relocalization
    # can recover (a short blind window without the teleport recovers
    # by itself / by closure — verified while building this test)
    seq = gt[:32] + gt[32:38] + gt[4:24]
    frames = [render_stereo(world, T) for T in gt[:32]] \
        + [None] * 6 \
        + [render_stereo(world, T) for T in gt[4:24]]
    rng = np.random.default_rng(1)
    shape = frames[0][0].shape
    for i in range(32, 38):
        frames[i] = (rng.uniform(0, 255, shape).astype(np.float32),
                     rng.uniform(0, 255, shape).astype(np.float32))
    ex = jax.jit(lambda im: extract(im, cfg.extractor))
    corpus = [np.asarray(f.desc)[np.asarray(f.valid)]
              for f in (ex(jnp.asarray(lf)) for lf, _ in frames[::4])]
    voc = V.train(np.concatenate(corpus), k=6, levels=3, seed=0)
    eng = ChunkedSlamEngine(cfg, vocab=voc, chunk_size=4)
    eng.run(frames)
    relocs = [e for e in eng.loop_events if "reloc_to" in e]
    assert relocs, f"no chunked reloc event; events={eng.loop_events}"
    # after the reloc + pipeline drain the tail must track near GT
    # again (the teleported revisit, well clear of the recovery window)
    tail = eng.trajectory_refined()[48:]
    assert ate_rmse(tail, seq[48:]) < 1.0, \
        f"tail ATE {ate_rmse(tail, seq[48:]):.2f} m"


@pytest.mark.slow
def test_figure_eight_multiple_closures():
    """Figure-eight world: TWO distinct loop seams (each lobe closes at
    the shared junction) plus a revisit pass AFTER both corrections —
    exercises repeated closures with the closed-loop replay ring
    (ref src/loopcloser.cpp:160-191), the covis-prefetch staleness
    window across back-to-back closures, and closure-after-correction,
    all through the production chunked engine (VERDICT r3 #4)."""
    import dataclasses

    from slam_toolkit_tpu.data.synthetic import fig8_track
    from slam_toolkit_tpu.pipeline.scan_engine import ChunkedSlamEngine

    cfg = SlamConfig.tiny()
    # the blind windows exist to CREATE drift for the closures to fix;
    # chunked relocalization would recover the pose first and change
    # the scenario — disable it here (closure machinery under test)
    cfg = dataclasses.replace(cfg, loop=dataclasses.replace(
        cfg.loop, reloc_lost_streak=10 ** 6))
    world = make_world(cfg, seed=5, half_width=15.0, half_length=15.0,
                      ground_y=1.6, tex_size=1024)
    f8 = fig8_track(48, step=0.35)
    lobe1, lobe2 = f8[:48], f8[48:96]
    # two laps of lobe 1 (the second lap is a long continuous revisit
    # -> first closure), then lobe 2 (drift re-accumulates; its end
    # returns to the junction -> second closure AFTER the first
    # correction), then a final pass over lobe 1's start
    gt = lobe1 + lobe1 + lobe2 + lobe1[:28]
    frames = [render_stereo(world, T) for T in gt]
    blind = np.random.default_rng(0)
    for i in list(range(18, 22)) + list(range(114, 118)):
        l, r = frames[i]
        frames[i] = (blind.uniform(0, 255, l.shape).astype(np.float32),
                     blind.uniform(0, 255, r.shape).astype(np.float32))
    ex = jax.jit(lambda im: extract(im, cfg.extractor))
    corpus = [np.asarray(f.desc)[np.asarray(f.valid)]
              for f in (ex(jnp.asarray(lf)) for lf, _ in frames[::4])]
    voc = V.train(np.concatenate(corpus), k=6, levels=3, seed=0)

    eng = ChunkedSlamEngine(cfg, vocab=voc, chunk_size=8)
    eng.run(frames)
    closures = [e for e in eng.loop_events if "cand" in e]
    assert len(closures) >= 2, \
        f"expected >=2 closures on the figure-eight; events=" \
        f"{eng.loop_events}"
    # the second closure must land AFTER the first correction
    assert closures[1]["frame"] > closures[0]["frame"]
    traj = eng.trajectory_refined()
    assert all(np.isfinite(T).all() for T in traj)

    def c(T):
        return np.linalg.inv(np.asarray(T))[:3, 3]

    # both seams + the revisit pass must be self-consistent after the
    # closures: compare against an OPEN-loop run of the same frames
    def seams(tr):
        s1 = np.mean([np.linalg.norm(c(tr[48 + i]) - c(tr[i]))
                      for i in range(0, 48, 4)])        # lap-2 seam
        s2 = np.linalg.norm(c(tr[143]) - c(tr[0]))      # lobe-2 seam
        s3 = np.mean([np.linalg.norm(c(tr[144 + i]) - c(tr[i]))
                      for i in range(28)])              # final pass
        return s1, s2, s3

    eng_open = ChunkedSlamEngine(cfg, chunk_size=8)
    eng_open.run(frames)
    s_closed = seams(traj)
    s_open = seams(eng_open.trajectory_refined())
    # the FINAL pass is the seam the last closure directly measured and
    # corrected — it must improve; every seam is bounded by 2.5x the
    # worst open-loop seam. Tighter per-seam bounds were attempted in
    # r5 and REVERTED as un-assertable: closure timing on this scenario
    # is scheduling-dependent (the mapping worker's is_ready aging is
    # wall-clock sensitive — runs close 2, 3, or 4 loops with seam
    # spreads of 1.3-3.5x open on identical inputs), and pinning
    # SLAM_LOOP_THREAD=0 for determinism lands in a WORSE 4-closure
    # regime (lobe-2 seam 9.5 vs 6.6 m open). The replay-edge
    # information boost built for this (LoopConfig.replay_edge_boost)
    # helps the 2-closure regime and hurts the 3-closure one — default
    # off; full sweep in its config comment / BASELINE.md r5.
    assert s_closed[2] < s_open[2], \
        f"final-pass seam degraded: {s_closed} vs open {s_open}"
    assert max(s_closed) < 2.5 * max(s_open), \
        f"closures blew up a seam: {s_closed} vs open {s_open}"


def test_decoupled_rt_refine_breaks_ambiguity_valley():
    """closer._decoupled_rt_refine must recover a pose perturbed along
    the yaw/lateral-translation valley — the failure mode the r4/r5
    bench seam dissections measured (1.5 m lateral loop-edge error at
    1.03 deg passing 122 reprojection inliers): with most landmarks at
    similar far depth, yaw and lateral translation compensate and the
    joint solve stalls in the valley. Rotation is depth-free and
    translation is near-point-dominated, so the alternating solve must
    escape."""
    from slam_toolkit_tpu.loop.closer import _decoupled_rt_refine

    rng = np.random.default_rng(3)
    n_far, n_near = 200, 40
    z_far = rng.uniform(40.0, 80.0, n_far)
    z_near = rng.uniform(5.0, 15.0, n_near)
    z = np.concatenate([z_far, z_near])
    x = rng.uniform(-0.5, 0.5, z.size) * z
    y = rng.uniform(-0.2, 0.2, z.size) * z
    Xw = jnp.asarray(np.stack([x, y, z], -1), jnp.float32)
    near = jnp.asarray(z < 21.0)
    baseline = 0.5
    z_norm = Xw[:, :2] / Xw[:, 2:3]
    z_r = (Xw[:, 0] - baseline) / Xw[:, 2]
    use = jnp.ones((z.size,), bool)
    inv_sig = jnp.ones((z.size,), jnp.float32)
    stereo = (z_r, near.astype(jnp.float32), baseline)  # stereo on near

    # perturb along the valley: yaw theta with compensating lateral
    # shift -z_mid * theta keeps far-point residuals tiny
    theta = np.radians(1.0)
    z_mid = 55.0
    T0 = np.eye(4, dtype=np.float32)
    c, s = np.cos(theta), np.sin(theta)
    T0[:3, :3] = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                            np.float32)
    T0[0, 3] = -z_mid * theta
    T = np.asarray(_decoupled_rt_refine(
        jnp.asarray(T0), Xw, z_norm, inv_sig, use, near, stereo,
        huber_delta=0.1, rounds=3))
    t_err = float(np.linalg.norm(T[:3, 3]))
    ang = np.degrees(np.arccos(np.clip((np.trace(T[:3, :3]) - 1) / 2,
                                       -1, 1)))
    assert t_err < 0.08, f"translation error {t_err:.3f} m (was 0.96)"
    assert ang < 0.1, f"rotation error {ang:.3f} deg (was 1.0)"
