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


@pytest.mark.slow
def test_carry_frame_id_includes_inflight():
    """A carry rebuilt while chunks are in flight (the pipelined-closure
    path sets _carry_cache=None without draining) must seed the device
    frame counter past the pending chunks' frames — h.frame_id only
    advances at fold time (r3 advisor, medium)."""
    cfg = SlamConfig.tiny()
    world, gt, frames = make_sequence(cfg, n_frames=12, seed=3, step=0.25)
    eng = ChunkedSlamEngine(cfg, chunk_size=4)
    imgs = np.stack([np.stack([l, r]) for l, r in frames])
    eng.process_chunk(imgs[1:5])     # frame 0 consumed by bootstrap
    eng.process_chunk(imgs[5:9])     # queue_depth 2: both still pending
    pend = sum(p["n"] for p in eng._pending)
    assert pend > 0, "test needs in-flight chunks"
    eng._carry_cache = None          # what a mid-flight closure does
    c = eng._carry()
    assert int(c.frame_id) == eng._host.frame_id + pend
    eng.flush()


@pytest.mark.slow
def test_bow_overflow_rows_register_and_detect():
    """A chunk with more than BOW_ROWS keyframes must still REGISTER
    every keyframe row in the BoW database (an unregistered dense row
    is all-zero and scores 0.5 against every normalized query, a
    persistent false loop candidate — r3 advisor, medium) AND run
    DETECTION on the overflow rows (the reference detects on every
    keyframe, ref src/loopdetector.cpp:38-154 — r4 verdict #6: before
    the fix, keyframe 5+ of a chunk silently skipped its own detection
    round, so a closure whose candidate keyframe landed there never
    fired)."""
    import jax.numpy as jnp
    from slam_toolkit_tpu.loop import vocab as V
    from slam_toolkit_tpu.pipeline.engine import BOW_ROWS
    from slam_toolkit_tpu.pipeline.scan_engine import PACK_WIDTH

    cfg = SlamConfig.tiny()
    rng = np.random.default_rng(0)
    desc = rng.integers(0, 2 ** 32, (512, 8), dtype=np.uint32)
    voc = V.train(desc, k=4, levels=2, seed=0)
    world, gt, frames = make_sequence(cfg, n_frames=40, seed=3, step=0.3)
    eng = ChunkedSlamEngine(cfg, chunk_size=4, vocab=voc)
    eng.run(frames)
    h = eng._host
    assert not h._bow_sparse, "test assumes the dense backend"
    kf_slots = np.flatnonzero(np.asarray(h.map.kf_valid))
    need = BOW_ROWS + 2
    assert len(kf_slots) >= need, \
        f"sequence produced only {len(kf_slots)} keyframes"
    # wipe the db, then present ONE crafted chunk claiming `need`
    # keyframe rows — more than the BOW_ROWS detection cap
    h.bow_db = jnp.zeros_like(h.bow_db)
    eng._loop_stash.clear()
    packed_np = np.zeros((8, PACK_WIDTH), np.float32)
    packed_np[:, 16:32] = np.eye(4, dtype=np.float32).reshape(-1)
    for i, s in enumerate(kf_slots[:need]):
        packed_np[i, 32] = s
        packed_np[i, 34] = 1.0
    entry = eng._loop_dispatch(h.map, jnp.asarray(packed_np))
    eng._loop_phase1(entry, packed_np)
    db = np.asarray(h.bow_db)
    for s in kf_slots[:need]:
        assert np.abs(db[s]).sum() > 0, \
            f"keyframe slot {s} left unregistered (all-zero BoW row)"
    # detection must cover ALL rows of the chunk, including overflow
    st = eng._loop_stash[-1]
    assert len(st["slots"]) == need, \
        f"stash covers {len(st['slots'])} of {need} keyframe rows"
    assert st["cand_np"].shape[0] == need
    assert st["scores_np"].shape[0] == need
    # ...and phase2 must run _detect_accept on the overflow slots
    seen = []
    orig = h._detect_accept

    def spy(slot, *a, **k):
        seen.append(int(slot))
        return orig(slot, *a, **k)

    h._detect_accept = spy
    try:
        eng._loop_phase2()
    finally:
        h._detect_accept = orig
    for s in kf_slots[BOW_ROWS:need]:
        assert int(s) in seen, \
            f"overflow keyframe slot {int(s)} never reached detection"
