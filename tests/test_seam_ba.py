"""Post-closure seam BA (mapping/ba_adapter.seam_ba_step).

The reference always runs local BA on the mapping thread after a loop
closure (ref src/pipeline.cpp:137-138, src/localmapper.cpp:122-162).
Here that pass runs over a both-sides window around the seam with the
ENTIRE old side held fixed as gauge — letting BA bend the trusted old
map measurably worsened the seam (scripts/diag_circle_closure.py A/B,
recorded in the seam_ba_step docstring)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_sequence
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.mapping.ba_adapter import (seam_ba_step,
                                                 select_seam_window)
from slam_toolkit_tpu.pipeline.engine import SlamEngine


@pytest.fixture(scope="module")
def small_map():
    cfg = SlamConfig.tiny()
    # force frequent keyframes so a short sequence yields several
    kf = dataclasses.replace(cfg.keyframe, decay_ratio=1.0)
    cfg = dataclasses.replace(cfg, keyframe=kf)
    world, gt, frames = make_sequence(cfg, n_frames=8, seed=5, step=0.3)
    eng = SlamEngine(cfg)
    for left, right in frames:
        eng.process(left, right)
    assert eng.n_keyframes >= 3
    return cfg, eng.map


def test_seam_window_forces_both_sides(small_map):
    cfg, m = small_map
    fid = np.asarray(m.kf_frame_id)
    valid = np.asarray(m.kf_valid)
    live = np.flatnonzero(valid)
    cur = int(live[np.argmax(fid[live])])
    cand = int(live[np.argmin(fid[live])])
    W = cfg.local_ba.window_keyframes
    window, win_valid = select_seam_window(m, jnp.int32(cur),
                                           jnp.int32(cand), W)
    window, win_valid = np.asarray(window), np.asarray(win_valid)
    members = set(window[win_valid].tolist())
    assert cur in members and cand in members


@pytest.mark.slow
def test_seam_ba_holds_old_side_fixed(small_map):
    cfg, m = small_map
    fid = np.asarray(m.kf_frame_id)
    valid = np.asarray(m.kf_valid)
    live = np.flatnonzero(valid)
    order = live[np.argsort(fid[live])]
    cand = int(order[len(order) // 2])     # mid keyframe = "old side" cut
    cur = int(order[-1])
    cam = StereoCamera.from_config(cfg.camera)
    m2 = seam_ba_step(m, jnp.int32(cur), jnp.int32(cand), cam, cfg)

    T_before = np.asarray(m.kf_T_cw)
    T_after = np.asarray(m2.kf_T_cw)
    old_side = live[fid[live] <= fid[cand]]
    # the old side is the gauge: bit-identical poses
    np.testing.assert_array_equal(T_after[old_side], T_before[old_side])
    assert np.isfinite(T_after[live]).all()
    assert np.isfinite(np.asarray(m2.mp_invd)).all()
    # BA may invalidate behind-anchor points but never resurrect
    assert not np.any(np.asarray(m2.mp_valid) & ~np.asarray(m.mp_valid))
