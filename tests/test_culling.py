"""Keyframe culling: re-anchoring preserves landmark positions."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_sequence
from slam_toolkit_tpu.mapping import culling
from slam_toolkit_tpu.mapping.map_state import mappoint_positions
from slam_toolkit_tpu.pipeline.engine import SlamEngine


def build_small_map():
    cfg = SlamConfig.tiny()
    # enough motion for >= 3 keyframes under the dense SAD stereo supplier
    _, gt, frames = make_sequence(cfg, n_frames=24, seed=3, step=0.3)
    eng = SlamEngine(cfg)
    for left, right in frames:
        eng.process(left, right)
    return eng


def test_cull_reanchors_points():
    eng = build_small_map()
    m = eng.map
    n_kf = int(m.kf_valid.sum())
    assert n_kf >= 3
    X_before = np.asarray(mappoint_positions(m))
    valid_before = np.asarray(m.mp_valid)

    # force-cull the middle keyframe regardless of redundancy
    fid = np.asarray(m.kf_frame_id)
    valid = np.asarray(m.kf_valid)
    slots = np.flatnonzero(valid)
    slot = int(slots[len(slots) // 2])
    anchored = valid_before & (np.asarray(m.mp_ref_kf) == slot)

    m2 = jax.jit(culling.cull_keyframe)(m, jnp.int32(slot))
    assert not bool(m2.kf_valid[slot])
    X_after = np.asarray(mappoint_positions(m2))
    valid_after = np.asarray(m2.mp_valid)

    # surviving re-anchored landmarks keep (approximately) their position
    survived = anchored & valid_after
    if survived.any():
        d = np.linalg.norm(X_before[survived] - X_after[survived], axis=1)
        # re-anchoring projects onto the new anchor ray: the shift grows
        # with scene depth (this fixture's corridor reaches ~20 m)
        assert np.median(d) < 1.0, np.median(d)
    # landmarks not anchored to the culled keyframe are untouched
    untouched = valid_before & ~anchored & valid_after
    np.testing.assert_allclose(X_after[untouched], X_before[untouched],
                               atol=1e-5)


def test_redundancy_scores_protect_recent():
    eng = build_small_map()
    scores = np.asarray(culling.redundancy_scores(eng.map,
                                                  protect_recent=100))
    # everything protected -> no candidates
    assert (scores < 0).all()


def test_cull_most_redundant_noop_when_unique():
    eng = build_small_map()
    m2, slot = jax.jit(
        lambda mm: culling.cull_most_redundant(mm, min_fraction=1.01))(
        eng.map)
    assert int(slot) == -1
    np.testing.assert_array_equal(np.asarray(m2.kf_valid),
                                  np.asarray(eng.map.kf_valid))
