"""Checkpoint/resume: state roundtrip and continued operation."""

import numpy as np

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_sequence
from slam_toolkit_tpu.pipeline import checkpoint
from slam_toolkit_tpu.pipeline.engine import SlamEngine


def test_save_load_and_continue(tmp_path):
    cfg = SlamConfig.tiny()
    _, gt, frames = make_sequence(cfg, n_frames=8, seed=3, step=0.2)
    eng = SlamEngine(cfg)
    for left, right in frames[:5]:
        eng.process(left, right)
    path = str(tmp_path / "state.npz")
    checkpoint.save(eng, path)

    eng2 = SlamEngine(cfg)
    checkpoint.load(eng2, path)
    assert eng2.frame_id == eng.frame_id
    assert eng2.n_keyframes == eng.n_keyframes
    np.testing.assert_allclose(np.asarray(eng2.T_cw), np.asarray(eng.T_cw))
    np.testing.assert_array_equal(np.asarray(eng2.map.kf_valid),
                                  np.asarray(eng.map.kf_valid))

    # both engines must continue identically on the next frames
    for left, right in frames[5:]:
        Ta = eng.process(left, right)
        Tb = eng2.process(left, right)
        np.testing.assert_allclose(Ta, Tb, atol=1e-5)


def test_loop_state_roundtrip(tmp_path):
    """Closure bookkeeping (closed-loop ring incl. edge weights, the
    post-closure cooldown marker, and the same-seam dedup pairs) must
    survive save/load — a resumed engine that forgot them would re-close
    corrected seams or replay loop edges at the wrong weight."""
    import jax.numpy as jnp

    from slam_toolkit_tpu.loop import vocab as V

    cfg = SlamConfig.tiny()
    _, gt, frames = make_sequence(cfg, n_frames=6, seed=3, step=0.2)
    rng = np.random.default_rng(0)
    voc = V.train(rng.integers(0, 2 ** 32, (256, 8), dtype=np.uint32),
                  k=4, levels=2, seed=0)
    eng = SlamEngine(cfg, vocab=voc)
    for left, right in frames[:4]:
        eng.process(left, right)
    # synthesize closure bookkeeping as a fired closure would leave it
    eng.closed_i = eng.closed_i.at[0].set(3)
    eng.closed_j = eng.closed_j.at[0].set(7)
    eng.closed_T = eng.closed_T.at[0].set(jnp.eye(4) * 1.0)
    eng.closed_valid = eng.closed_valid.at[0].set(True)
    eng.closed_w = eng.closed_w.at[0].set(0.62)
    eng.n_closed = 1
    eng._last_closure_nkf = eng.n_keyframes
    eng._closed_pairs = [(3, 0, 57)]

    path = str(tmp_path / "state.npz")
    checkpoint.save(eng, path)
    eng2 = SlamEngine(cfg, vocab=voc)
    checkpoint.load(eng2, path)
    assert eng2.n_closed == 1
    assert eng2._last_closure_nkf == eng.n_keyframes
    assert eng2._closed_pairs == [(3, 0, 57)]
    np.testing.assert_array_equal(np.asarray(eng2.closed_valid),
                                  np.asarray(eng.closed_valid))
    np.testing.assert_allclose(np.asarray(eng2.closed_w)[0], 0.62)
    np.testing.assert_allclose(np.asarray(eng2.bow_db),
                               np.asarray(eng.bow_db))


def test_bow_backend_mismatch_fails_fast(tmp_path):
    """A checkpoint saved with one BoW backend loaded into an engine
    configured with the other must raise a clear error, not fail deep
    inside the jitted score program (r3 advisor)."""
    import dataclasses

    import pytest

    from slam_toolkit_tpu.loop import vocab as V

    cfg = SlamConfig.tiny()
    _, gt, frames = make_sequence(cfg, n_frames=4, seed=3, step=0.2)
    rng = np.random.default_rng(0)
    voc = V.train(rng.integers(0, 2 ** 32, (256, 8), dtype=np.uint32),
                  k=4, levels=2, seed=0)
    eng = SlamEngine(cfg, vocab=voc)
    for left, right in frames[:2]:
        eng.process(left, right)
    assert not eng._bow_sparse      # tiny vocab -> dense backend
    path = str(tmp_path / "state.npz")
    checkpoint.save(eng, path)

    cfg_topw = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, bow_mode="topw"))
    eng2 = SlamEngine(cfg_topw, vocab=voc)
    assert eng2._bow_sparse
    with pytest.raises(ValueError, match="backend mismatch"):
        checkpoint.load(eng2, path)
