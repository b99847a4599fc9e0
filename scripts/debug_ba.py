"""Capture the engine's real BA problem at kfs=3 and dissect the solve."""
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
from slam_toolkit_tpu.data.synthetic import make_sequence
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.mapping.ba_adapter import build_problem
from slam_toolkit_tpu.optim.local_ba import solve_ba, _edge_terms, _cost
from slam_toolkit_tpu.pipeline.engine import SlamEngine

cfg = SlamConfig.tiny()
cam = StereoCamera.from_config(cfg.camera)
world, gt, frames = make_sequence(cfg, n_frames=10, seed=3, step=0.25)


class NoBA(SlamEngine):
    def _compile(self):
        super()._compile()
        self._ba = lambda m: m  # disable BA; we'll run it manually


eng = NoBA(cfg)
for left, right in frames[:4]:
    eng.process(left, right)
print("kfs:", eng.n_keyframes, "mps:", eng.num_mappoints())

prob, window, pt_ids = jax.jit(
    lambda m: build_problem(m, cam, cfg))(eng.map)
print("window slots:", np.asarray(window), "valid:", np.asarray(prob.pose_valid),
      "fixed:", np.asarray(prob.pose_fixed))
print("points valid:", int(prob.point_valid.sum()),
      "obs:", int(prob.obs_mask.sum()),
      "stereo obs:", int(prob.stereo_mask.sum()))
obs_per_pose = np.asarray(prob.obs_mask.sum(axis=1))
print("obs per pose:", obs_per_pose)

w_mask = prob.obs_mask & prob.pose_valid[:, None] & prob.point_valid[None, :]
r, w_rob, Jp, Jl, row_w = _edge_terms(
    prob.T_cw, prob.Xw, prob.z, prob.inv_sigma, w_mask, prob.stereo_mask,
    prob.baseline, 2.4477)
rn = np.asarray(jnp.sqrt(jnp.sum(r * r * row_w, axis=-1)))
active = np.asarray(jnp.any(row_w > 0, axis=-1))
print("initial whitened residual norms: median",
      round(float(np.median(rn[active])), 2),
      "p90", round(float(np.percentile(rn[active], 90)), 2),
      "max", round(float(rn[active].max()), 2))

for iters in [1, 3, 10]:
    res = jax.jit(lambda p: solve_ba(p, iters=iters))(prob)
    move = np.asarray(jnp.linalg.norm(
        res.T_cw[:, :3, 3] - prob.T_cw[:, :3, 3], axis=-1))
    print(f"iters={iters}: cost {float(res.cost):.1f} pose moves {np.round(move,3)}")
r0 = _cost(r, row_w, 2.4477)
print("initial cost:", float(r0))
