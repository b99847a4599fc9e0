"""Frame-by-frame engine run with NaN tracing."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if os.environ.get("DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_sequence
from slam_toolkit_tpu.evaluation.traj import ate_rmse
from slam_toolkit_tpu.pipeline.engine import SlamEngine

cfg = SlamConfig.tiny()
world, gt, frames = make_sequence(cfg, n_frames=10, seed=3, step=0.25)
eng = SlamEngine(cfg)


def nan_report(m):
    out = []
    for name, arr in m._asdict().items():
        if arr.dtype in (jnp.float32, jnp.float64):
            n = int(jnp.isnan(arr).sum())
            if n:
                out.append(f"{name}:{n}")
    return ",".join(out) or "clean"


for i, (left, right) in enumerate(frames):
    T = eng.process(left, right)
    st = eng.frame_stats[-1]
    c = np.asarray(T)
    gtc = gt[i]
    err = np.linalg.norm(np.linalg.inv(c)[:3, 3] - np.linalg.inv(gtc)[:3, 3])
    print(f"f{i}: kf={st['kf']} inl={st['inliers']} "
          f"mp={eng.num_mappoints()} kfs={eng.n_keyframes} "
          f"center_err={err:.4f} nan={np.isnan(c).any()} "
          f"map[{nan_report(eng.map)}]")

print("ATE:", ate_rmse(eng.trajectory, gt) if not any(
    np.isnan(t).any() for t in eng.trajectory) else "NaN poses")
