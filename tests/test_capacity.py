"""Capacity/endurance: engine behavior when the keyframe ring fills.

The long-run path (VERDICT r1 weak #8): a KITTI-00-length run must hit
`_make_keyframe`'s culling-at-capacity branch (pipeline/engine.py) and
the scan engine's `_ensure_headroom` (scan_engine.py) — including the
trajectory re-anchoring of frames whose anchor keyframe gets culled —
long before it matters in production. Forced here with a tiny ring."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_sequence
from slam_toolkit_tpu.evaluation.traj import ate_rmse
from slam_toolkit_tpu.pipeline.engine import SlamEngine


def _tiny_ring_cfg(max_kf=10):
    base = SlamConfig.tiny()
    # aggressive keyframing so the tiny ring fills within ~30 frames
    return dataclasses.replace(
        base,
        map=dataclasses.replace(base.map, max_keyframes=max_kf),
        keyframe=dataclasses.replace(base.keyframe, decay_ratio=0.95))


@pytest.fixture(scope="module")
def capacity_run():
    cfg = _tiny_ring_cfg()
    world, gt, frames = make_sequence(cfg, n_frames=36, seed=3, step=0.25)
    eng = SlamEngine(cfg)
    for left, right in frames:
        eng.process(left, right)
    return cfg, eng, gt


def test_ring_never_overflows(capacity_run):
    cfg, eng, gt = capacity_run
    n_valid = int(np.asarray(eng.map.kf_valid).sum())
    assert n_valid <= cfg.map.max_keyframes
    # keyframes were created beyond capacity -> culling must have run
    assert eng.n_keyframes > cfg.map.max_keyframes


def test_trajectory_survives_culling(capacity_run):
    cfg, eng, gt = capacity_run
    traj = eng.trajectory_refined()
    assert len(traj) == len(gt)
    assert all(np.isfinite(T).all() for T in traj)
    # re-anchored early frames must still produce a sane trajectory
    err = ate_rmse(traj, gt, align=True)
    assert err < 1.0, f"ATE after capacity culling {err:.3f} m"


@pytest.mark.slow
def test_scan_engine_headroom():
    """Same endurance path through the chunked driver: _ensure_headroom
    must cull ahead of blind in-scan insertions and re-anchor pending
    trajectory entries."""
    from slam_toolkit_tpu.pipeline.scan_engine import ChunkedSlamEngine

    cfg = _tiny_ring_cfg(max_kf=12)
    world, gt, frames = make_sequence(cfg, n_frames=32, seed=3, step=0.25)
    eng = ChunkedSlamEngine(cfg, chunk_size=4)
    arr = np.stack([np.stack([l, r]) for l, r in frames])
    for i in range(0, len(arr), 4):
        eng.process_chunk(jnp.asarray(arr[i:i + 4], jnp.float32))
    eng.flush()
    n_valid = int(np.asarray(eng.map.kf_valid).sum())
    assert n_valid <= cfg.map.max_keyframes
    traj = eng.trajectory_refined()
    assert len(traj) == len(gt)
    assert all(np.isfinite(T).all() for T in traj)
    err = ate_rmse(traj, gt, align=True)
    assert err < 1.0, f"scan-engine ATE after culling {err:.3f} m"
