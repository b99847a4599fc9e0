"""Matching + tracker tests on synthetic frames (no image extraction:
FrameFeatures built directly from projected geometry + random binary
descriptors, exercising the exact code path the engine uses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_toolkit_tpu.config import SlamConfig, CameraConfig
from slam_toolkit_tpu.frontend.frame import FrameState
from slam_toolkit_tpu.frontend.matching import projection_match, stereo_match
from slam_toolkit_tpu.frontend.tracker import track_pose
from slam_toolkit_tpu.geometry import camera as cam_mod
from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.ops.extractor import FrameFeatures

CFG = SlamConfig.tiny()
CAM = StereoCamera.from_config(CFG.camera)
K = CFG.extractor.max_keypoints


def rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32))


def make_world(rng, n):
    """Landmarks in front of the origin camera."""
    X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-2.5, 2.5, n),
                  rng.uniform(5, 25, n)], axis=-1)
    return jnp.asarray(X, jnp.float32)


def feats_from_projection(Xw, desc, T_cw, n_slots=K, drop=0):
    """Build FrameFeatures by projecting landmarks through T_cw."""
    Xc = se3.transform(T_cw, Xw)
    uv = cam_mod.project(CAM.left, Xc)
    vis = np.asarray(cam_mod.in_image(CAM.left, uv) & (Xc[:, 2] > 0.1))
    n = Xw.shape[0]
    xy = np.zeros((n_slots, 2), np.float32)
    d = np.zeros((n_slots, 8), np.uint32)
    valid = np.zeros(n_slots, bool)
    xy[:n] = np.asarray(uv)
    d[:n] = np.asarray(desc)
    valid[:n] = vis
    if drop:
        valid[:drop] = False
    return FrameFeatures(
        xy=jnp.asarray(xy), response=jnp.ones(n_slots),
        octave=jnp.zeros(n_slots, jnp.int32), angle=jnp.zeros(n_slots),
        sigma2=jnp.ones(n_slots), desc=jnp.asarray(d),
        valid=jnp.asarray(valid))


def frame_from_feats(feats):
    norm = cam_mod.pixel_to_normalized(CAM.left, feats.xy)
    return FrameState(
        feats=feats,
        norm_xy=jnp.where(feats.valid[:, None], norm, 0.0),
        right_x_norm=jnp.zeros(K), depth=jnp.zeros(K),
        has_stereo=jnp.zeros(K, bool))


def test_stereo_match_recovers_disparity():
    rng = np.random.default_rng(0)
    n = 100
    Xw = make_world(rng, n)
    desc = rand_desc(rng, n)
    T_id = se3.identity()
    left = feats_from_projection(Xw, desc, T_id)
    T_rl = se3.make(jnp.eye(3), jnp.array([-CFG.camera.baseline, 0.0, 0.0]))
    right = feats_from_projection(Xw, desc, T_rl)
    rx, depth, ok = stereo_match(left, right, CAM, CFG.matcher)
    ok = np.asarray(ok)
    assert ok[:n].sum() > n * 0.8
    got_z = np.asarray(depth)[:n][ok[:n]]
    want_z = np.asarray(Xw)[:, 2][ok[:n]]
    np.testing.assert_allclose(got_z, want_z, rtol=1e-3)


def test_projection_match_finds_landmarks():
    rng = np.random.default_rng(1)
    n = 120
    Xw = make_world(rng, n)
    desc = rand_desc(rng, n)
    T_cw = se3.exp(jnp.array([0.1, 0.0, 0.2, 0.0, 0.01, 0.0]))
    feats = feats_from_projection(Xw, desc, T_cw)
    L = 256
    Xw_pad = jnp.zeros((L, 3)).at[:n].set(Xw)
    desc_pad = jnp.zeros((L, 8), jnp.uint32).at[:n].set(desc)
    valid = jnp.zeros(L, bool).at[:n].set(True)
    # predicted pose slightly off
    T_pred = se3.exp(jnp.array([0.05, 0.02, -0.05, 0.005, 0.0, 0.0])) @ T_cw
    m = projection_match(Xw_pad, desc_pad, valid, feats, T_pred, CAM,
                         CFG.matcher, CFG.matcher.projection_radius)
    ok = np.asarray(m.ok)
    assert ok.sum() > n * 0.7, ok.sum()
    # matched keypoints correspond to the right landmark index
    idx = np.asarray(m.kpt_idx)
    correct = sum(1 for i in range(n) if ok[i] and idx[i] == i)
    assert correct == ok[:n].sum()


def test_track_pose_end_to_end():
    rng = np.random.default_rng(2)
    n = 150
    Xw = make_world(rng, n)
    desc = rand_desc(rng, n)
    T_true = se3.exp(jnp.array([0.15, -0.05, 0.3, 0.01, -0.02, 0.005]))
    feats = feats_from_projection(Xw, desc, T_true)
    frame = frame_from_feats(feats)
    L = 256
    Xw_pad = jnp.zeros((L, 3)).at[:n].set(Xw)
    desc_pad = jnp.zeros((L, 8), jnp.uint32).at[:n].set(desc)
    valid = jnp.zeros(L, bool).at[:n].set(True)
    T_pred = se3.exp(jnp.array([-0.05, 0.02, -0.1, 0.004, 0.01, -0.008])) @ T_true
    res = jax.jit(lambda f, T: track_pose(f, Xw_pad, desc_pad, valid, T,
                                          CAM, CFG))(frame, T_pred)
    assert bool(res.ok)
    err = se3.log(res.T_cw @ se3.inv(T_true))
    assert float(jnp.abs(err).max()) < 1e-3, np.asarray(err)
    assert int(res.n_inliers) > n * 0.7


@pytest.mark.slow
def test_track_pose_wide_retry():
    """With a badly-off prediction, the doubled-radius pass should rescue it."""
    rng = np.random.default_rng(3)
    n = 150
    Xw = make_world(rng, n)
    desc = rand_desc(rng, n)
    T_true = se3.identity()
    feats = feats_from_projection(Xw, desc, T_true)
    frame = frame_from_feats(feats)
    L = 256
    Xw_pad = jnp.zeros((L, 3)).at[:n].set(Xw)
    desc_pad = jnp.zeros((L, 8), jnp.uint32).at[:n].set(desc)
    valid = jnp.zeros(L, bool).at[:n].set(True)
    # ~60px prediction offset at fx=120: radius 50 fails, 100 catches
    T_pred = se3.exp(jnp.array([0.0, 0.0, 0.0, 0.0, 0.07, 0.0]))
    res = track_pose(frame, Xw_pad, desc_pad, valid, T_pred, CAM, CFG)
    assert bool(res.ok), int(res.n_matches)
    err = se3.log(res.T_cw @ se3.inv(T_true))
    assert float(jnp.abs(err).max()) < 1e-2, np.asarray(err)
