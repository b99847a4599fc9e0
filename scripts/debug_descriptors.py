"""Measure descriptor repeatability at TRUE correspondences (GT disparity)."""
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
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.ops.extractor import extract
from slam_toolkit_tpu.ops.hamming import distance_matrix
from slam_toolkit_tpu.data.synthetic import (make_world, render_stereo,
                                             render_view, right_pose)

cfg = SlamConfig.tiny()
cam = StereoCamera.from_config(cfg.camera)
world = make_world(cfg, seed=1)
T0 = np.eye(4, dtype=np.float32)
l0, r0 = render_stereo(world, T0)
_, depth = render_view(world, T0, return_depth=True)

ex = jax.jit(lambda im: extract(im, cfg.extractor))
fl = ex(jnp.asarray(l0))
fr = ex(jnp.asarray(r0))
vl = np.asarray(fl.valid)
vr = np.asarray(fr.valid)
xyl = np.asarray(fl.xy)
xyr = np.asarray(fr.xy)
print("kpts L/R:", vl.sum(), vr.sum())
print("octave hist L:", np.bincount(np.asarray(fl.octave)[vl], minlength=4).tolist())

# ground-truth disparity at left keypoints
xi = np.clip(np.round(xyl[:, 0]).astype(int), 0, cfg.camera.width - 1)
yi = np.clip(np.round(xyl[:, 1]).astype(int), 0, cfg.camera.height - 1)
z = depth[yi, xi]
disp = cfg.camera.fx * cfg.camera.baseline / np.maximum(z, 1e-3)
true_xr = xyl[:, 0] - disp

# detection repeatability: right kpt within 1.5px of true correspondence?
D = np.abs(xyr[None, :, 0] - true_xr[:, None]) + \
    np.abs(xyr[None, :, 1] - xyl[:, 1][:, None])
D[:, ~vr] = 1e9
nn = D.argmin(axis=1)
nnd = D[np.arange(len(nn)), nn]
rep = (nnd < 1.5) & vl & (z > 0.5)
print("left kpts with right kpt at true disp (<1.5px):",
      int(rep.sum()), "/", int((vl & (z > 0.5)).sum()))

# descriptor distance at those true pairs vs random pairs
dm = np.asarray(distance_matrix(fl.desc, fr.desc))
pair_d = dm[np.arange(len(nn)), nn][rep]
print("hamming at true pairs: median", np.median(pair_d),
      "p90", np.percentile(pair_d, 90))
rand_d = dm[vl][:, vr].ravel()
print("hamming background: median", np.median(rand_d))
# octave agreement at true pairs
octl = np.asarray(fl.octave)[rep]
octr = np.asarray(fr.octave)[nn[rep]]
print("same octave at true pairs:", int((octl == octr).sum()), "/", int(rep.sum()))
# angle difference at true pairs
al = np.asarray(fl.angle)[rep]
ar = np.asarray(fr.angle)[nn[rep]]
da = np.abs(np.angle(np.exp(1j * (al - ar))))
print("IC angle |diff| deg: median", round(float(np.median(da) * 57.3), 1),
      "p90", round(float(np.percentile(da, 90) * 57.3), 1))
