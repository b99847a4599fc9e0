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
