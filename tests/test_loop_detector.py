"""Unit tests for loop-candidate retrieval: accScore group accumulation.

Mirrors the reference's covisibility-group score accumulation
(ref src/pipeline_map.cpp:224-269): a single aliased keyframe with a
high flat BoW score must lose to a true revisit whose whole
covisibility group scores well.
"""

import numpy as np

from slam_toolkit_tpu.loop.detector import acc_score_retrieval


def _covis(F, groups):
    """(C, F) covisibility rows from {cand_index: {slot: count}}."""
    C = len(groups)
    out = np.zeros((C, F), np.int32)
    for ci, row in enumerate(groups):
        for slot, cnt in row.items():
            out[ci, slot] = cnt
    return out


def test_group_accumulation_beats_single_frame_alias():
    # slots 0-2: a true revisit group (mutually covisible, all candidates)
    # slot 5: an aliased single frame with the highest individual score
    F = 8
    scores = np.zeros(F)
    scores[0], scores[1], scores[2] = 0.30, 0.28, 0.26
    scores[5] = 0.35
    cand_slots = np.array([0, 1, 2, 5])
    covis = _covis(F, [
        {1: 50, 2: 40},          # 0 sees 1, 2
        {0: 50, 2: 45},          # 1 sees 0, 2
        {0: 40, 1: 45},          # 2 sees 0, 1
        {6: 30, 7: 20},          # 5's neighbors are NOT candidates
    ])
    kept, acc = acc_score_retrieval(scores, cand_slots, covis)
    # group {0,1,2} accumulates 0.84; slot 5 stays at 0.35 < 0.75*0.84
    assert 5 not in kept
    assert kept[0] == 0          # representative = best-scoring member
    assert np.isclose(acc[0], 0.84)


def test_flat_threshold_would_have_fired():
    # sanity: the aliased frame IS the best flat-score candidate -- the
    # pre-round-2 detector (plain threshold) would have returned it first
    scores = np.zeros(8)
    scores[0], scores[1], scores[2], scores[5] = 0.30, 0.28, 0.26, 0.35
    assert np.argmax(scores) == 5


def test_single_candidate_passes_through():
    scores = np.zeros(4)
    scores[1] = 0.5
    kept, acc = acc_score_retrieval(scores, np.array([1]),
                                    np.zeros((1, 4), np.int32))
    assert list(kept) == [1]
    assert np.isclose(acc[0], 0.5)


def test_empty_candidates():
    kept, acc = acc_score_retrieval(np.zeros(4), np.empty((0,), np.int64),
                                    np.zeros((0, 4), np.int32))
    assert len(kept) == 0


def test_dedup_representatives():
    # two candidates in one group must collapse to one representative
    scores = np.zeros(6)
    scores[0], scores[1] = 0.4, 0.39
    covis = _covis(6, [{1: 30}, {0: 30}])
    kept, acc = acc_score_retrieval(scores, np.array([0, 1]), covis)
    assert list(kept) == [0]
    assert np.isclose(acc[0], 0.79)
