"""Direct photometric tracking on the synthetic raycast world."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_world, render_view
from slam_toolkit_tpu.frontend.direct_tracker import track_direct
from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.geometry.camera import Camera
from slam_toolkit_tpu.optim.direct_lm import DirectState


@pytest.fixture(scope="module")
def setup():
    cfg = SlamConfig.tiny()
    cam = Camera.from_config(cfg.camera)
    world = make_world(cfg, seed=7, extent=None)
    T0 = np.eye(4, dtype=np.float32)
    img0, depth0 = render_view(world, T0, return_depth=True)
    # landmarks: backproject a sparse pixel grid at GT depth
    ys = np.arange(16, cfg.camera.height - 16, 8)
    xs = np.arange(16, cfg.camera.width - 16, 8)
    uu, vv = np.meshgrid(xs, ys)
    z = depth0[vv.ravel(), uu.ravel()]
    good = z > 0.5
    nx = (uu.ravel() - cfg.camera.cx) / cfg.camera.fx
    ny = (vv.ravel() - cfg.camera.cy) / cfg.camera.fy
    Xw = np.stack([nx * z, ny * z, z], -1).astype(np.float32)
    return cfg, cam, world, jnp.asarray(img0), jnp.asarray(Xw), \
        jnp.asarray(good)


def test_direct_tracks_small_motion(setup):
    cfg, cam, world, img0, Xw, valid = setup
    T1 = np.asarray(se3.exp(jnp.asarray([0.05, 0.02, 0.15, 0.004, 0.01,
                                         0.002], dtype=jnp.float32)))
    img1 = jnp.asarray(render_view(world, T1))
    ref = DirectState(T_cw=jnp.eye(4), a=jnp.float32(0.0), b=jnp.float32(0.0))
    res = track_direct(img0, ref, img1, jnp.eye(4), cam, Xw, valid)
    err = se3.log(res.state.T_cw @ se3.inv(jnp.asarray(T1)))
    assert float(jnp.abs(err).max()) < 0.02, np.asarray(err)


def test_direct_estimates_brightness(setup):
    cfg, cam, world, img0, Xw, valid = setup
    T1 = np.asarray(se3.exp(jnp.asarray([0.02, 0.0, 0.08, 0.0, 0.004, 0.0],
                                        dtype=jnp.float32)))
    img1 = np.asarray(render_view(world, T1))
    # apply a global brightness change: I' = e^{a} I + b-ish
    img1 = jnp.asarray(img1 * 1.25 + 10.0)
    ref = DirectState(T_cw=jnp.eye(4), a=jnp.float32(0.0), b=jnp.float32(0.0))
    res = track_direct(img0, ref, img1, jnp.eye(4), cam, Xw, valid)
    err = se3.log(res.state.T_cw @ se3.inv(jnp.asarray(T1)))
    assert float(jnp.abs(err).max()) < 0.03, np.asarray(err)
    # gain should be recovered: e^-a * 1.25 ~ 1 -> a ~ ln(1.25) = 0.223
    assert abs(float(res.state.a) - 0.223) < 0.1, float(res.state.a)
