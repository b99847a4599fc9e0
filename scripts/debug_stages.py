"""Stage-by-stage diagnosis of the tracking path on the synthetic world."""
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
from slam_toolkit_tpu.geometry import se3, camera as cm
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.frontend.frame import build_frame, add_stereo, backproject
from slam_toolkit_tpu.frontend.matching import projection_match
from slam_toolkit_tpu.optim import pose_lm
from slam_toolkit_tpu.data.synthetic import make_world, render_stereo, render_view

cfg = SlamConfig.tiny()
cam = StereoCamera.from_config(cfg.camera)
world = make_world(cfg, seed=1)
T0 = np.eye(4, dtype=np.float32)
T1 = np.asarray(se3.exp(jnp.array([0.08, 0.0, 0.25, 0.0, 0.01, 0.0])))
l0, r0 = render_stereo(world, T0)
l1, _ = render_stereo(world, T1)
_, gt_depth0 = render_view(world, T0, return_depth=True)


@jax.jit
def stage0(img_l, img_r):
    f = add_stereo(build_frame(img_l, cam, cfg), img_l, img_r, cam, cfg)
    Xw = backproject(f, jnp.eye(4))
    return f, Xw


@jax.jit
def stage1(img):
    return build_frame(img, cam, cfg)


@jax.jit
def stage_match(Xw, desc, valid, f1, T_pred):
    return projection_match(Xw, desc, valid, f1.feats, T_pred, cam,
                            cfg.matcher, cfg.matcher.projection_radius)


@jax.jit
def stage_lm(T_init, Xw, z_norm, sigma2, ok):
    return pose_lm.optimize_pose(T_init, Xw, z_norm, sigma2, ok, cfg.tracker)


f0, Xw_j = stage0(jnp.asarray(l0), jnp.asarray(r0))
valid = np.asarray(f0.has_stereo & f0.feats.valid)
Xw = np.asarray(Xw_j)
print("kpts:", int(f0.feats.valid.sum()), "stereo:", valid.sum())

# stereo depth vs ground-truth raycast depth at keypoint pixels
xy = np.asarray(f0.feats.xy)
xi = np.clip(np.round(xy[:, 0]).astype(int), 0, cfg.camera.width - 1)
yi = np.clip(np.round(xy[:, 1]).astype(int), 0, cfg.camera.height - 1)
zgt = gt_depth0[yi, xi]
zerr = np.abs(np.asarray(f0.depth) - zgt)[valid & (zgt > 0)]
rel = zerr / zgt[valid & (zgt > 0)]
print("stereo depth err: median", round(float(np.median(zerr)), 3),
      "m; rel p90", round(float(np.percentile(rel, 90)), 4))

f1 = stage1(jnp.asarray(l1))
m = stage_match(Xw_j, f0.feats.desc, jnp.asarray(valid), f1, jnp.asarray(T1))
ok = np.asarray(m.ok)
print("matches at perfect pred:", ok.sum(), "/", valid.sum())

Xc = np.asarray(se3.transform(jnp.asarray(T1), Xw_j))
uv = np.asarray(cm.project(cam.left, jnp.asarray(Xc)))
kpt_xy = np.asarray(f1.feats.xy)[np.asarray(m.kpt_idx)]
e = np.linalg.norm(uv - kpt_xy, axis=-1)[ok]
print("reproj err at true pose: median", round(float(np.median(e)), 3),
      "p90", round(float(np.percentile(e, 90)), 3),
      "max", round(float(e.max()), 2))

z_norm = f1.norm_xy[m.kpt_idx]
sigma2 = f1.feats.sigma2[m.kpt_idx] / (cam.left.fx * cam.left.fx)
res = stage_lm(jnp.asarray(T1), Xw_j, z_norm, sigma2, m.ok)
err = se3.log(res.T_cw @ se3.inv(jnp.asarray(T1)))
print("LM-from-truth drift:", round(float(jnp.abs(err).max()), 5))

# and from a perturbed start (the real use)
T_pred = np.asarray(se3.exp(jnp.array([0.03, -0.02, -0.08, 0.005, 0.01, 0.0])) @ jnp.asarray(T1))
m2 = stage_match(Xw_j, f0.feats.desc, jnp.asarray(valid), f1, jnp.asarray(T_pred))
res2 = stage_lm(jnp.asarray(T_pred), Xw_j, f1.norm_xy[m2.kpt_idx],
                f1.feats.sigma2[m2.kpt_idx] / (cam.left.fx * cam.left.fx), m2.ok)
err2 = se3.log(res2.T_cw @ se3.inv(jnp.asarray(T1)))
print("matches at perturbed pred:", int(np.asarray(m2.ok).sum()),
      "| LM-from-perturbed err:", round(float(jnp.abs(err2).max()), 5))
