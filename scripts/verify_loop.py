"""End-to-end loop closure drive: box-room circle with revisit.

Usage: env PALLAS_AXON_POOL_IPS= python scripts/verify_loop.py
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
from slam_toolkit_tpu.data.synthetic import make_world, render_stereo
from slam_toolkit_tpu.evaluation.traj import ate_rmse
from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.loop import vocab as V
from slam_toolkit_tpu.ops.extractor import extract
from slam_toolkit_tpu.pipeline.engine import SlamEngine


def circle_T_cw(n, radius):
    import jax.numpy as jnp
    step = 2 * np.pi * radius / n
    yaw = 2 * np.pi / n
    T = np.eye(4, dtype=np.float32)
    out = []
    dT = np.asarray(se3.exp(jnp.asarray([0, 0, step, 0, yaw, 0.0],
                                        dtype=jnp.float32)))
    for _ in range(n):
        out.append(T.copy())
        T = np.asarray(se3.normalize(jnp.asarray(dT @ T)))
    return out


def main():
    cfg = SlamConfig.tiny()
    # box room 30x30 m; circle of radius 4 centered inside
    world = make_world(cfg, seed=5, half_width=15.0, half_length=15.0,
                       ground_y=1.6)
    n = 48
    gt = circle_T_cw(n, radius=6.0)
    # revisit: append the first 6 poses again (full loop + overlap)
    gt = gt + gt[:6]
    frames = [render_stereo(world, T) for T in gt]

    # train a vocabulary on descriptors from this world
    ex = jax.jit(lambda im: extract(im, cfg.extractor))
    corpus = []
    for lf, _ in frames[::4]:
        f = ex(jnp.asarray(lf))
        corpus.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = V.train(np.concatenate(corpus), k=6, levels=3, seed=0)
    print("vocab words:", voc.num_words)

    eng = SlamEngine(cfg, vocab=voc)
    for i, (lf, rf) in enumerate(frames):
        eng.process(lf, rf)
    print("keyframes:", eng.n_keyframes, "loops:", eng.loop_events)
    ate = ate_rmse(eng.trajectory, gt)
    print("ATE with loop closure:", round(ate, 4))

    eng2 = SlamEngine(cfg)  # no vocab -> no loop closing
    for lf, rf in frames:
        eng2.process(lf, rf)
    ate2 = ate_rmse(eng2.trajectory, gt)
    print("ATE without loop closure:", round(ate2, 4))


if __name__ == "__main__":
    main()
