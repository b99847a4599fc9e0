"""Quick end-to-end drive: 2-frame stereo tracking on the synthetic world.

Usage: JAX_PLATFORMS=cpu python scripts/verify_tracking.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.frontend.frame import build_frame, add_stereo, backproject
from slam_toolkit_tpu.frontend.tracker import track_pose
from slam_toolkit_tpu.data.synthetic import make_world, render_stereo


def main():
    cfg = SlamConfig.tiny()
    cam = StereoCamera.from_config(cfg.camera)
    world = make_world(cfg, n_landmarks=300, seed=1, extent=(30.0, 8.0, 40.0))
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.asarray(se3.exp(jnp.array([0.08, 0.0, 0.25, 0.0, 0.01, 0.0])))
    l0, r0 = render_stereo(world, T0)
    l1, _ = render_stereo(world, T1)

    bf = jax.jit(lambda im: build_frame(im, cam, cfg))
    ast = jax.jit(lambda f, iml, imr: add_stereo(f, iml, imr, cam, cfg))
    tp = jax.jit(lambda f, X, d, v, T: track_pose(f, X, d, v, T, cam, cfg))

    f0 = ast(bf(jnp.asarray(l0)), jnp.asarray(l0), jnp.asarray(r0))
    print("frame0 kpts:", int(f0.feats.valid.sum()),
          "stereo:", int(f0.has_stereo.sum()))
    Xw = backproject(f0, se3.inv(jnp.asarray(T0)))
    valid = f0.has_stereo & f0.feats.valid
    f1 = bf(jnp.asarray(l1))
    res = tp(f1, Xw, f0.feats.desc, valid, jnp.asarray(T0))
    err = se3.log(res.T_cw @ se3.inv(jnp.asarray(T1)))
    print("tracked ok:", bool(res.ok), "inliers:", int(res.n_inliers))
    print("pose err (max abs):", float(jnp.abs(err).max()))
    assert bool(res.ok) and float(jnp.abs(err).max()) < 0.02


if __name__ == "__main__":
    main()
    print("PASS")
