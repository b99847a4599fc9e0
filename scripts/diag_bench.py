"""Per-frame diagnostic run of the bench workload: inliers / kf / ok /
landmark-table occupancy per chunk, plus center error vs GT.

Run: python scripts/diag_bench.py   (real TPU; uses the bench frame cache)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from slam_toolkit_tpu.config import SlamConfig
    from slam_toolkit_tpu.pipeline.scan_engine import ChunkedSlamEngine

    cfg = SlamConfig()
    chunk = 16
    n_frames = int(os.environ.get("BENCH_FRAMES", "160"))
    cache = (f"/tmp/slam_bench_seq_v2_{n_frames}_{cfg.camera.width}x"
             f"{cfg.camera.height}.npz")
    stacked = np.load(cache + ".npy", mmap_mode="r")
    gt = list(np.load(cache + ".gt.npy"))

    eng = ChunkedSlamEngine(cfg, chunk_size=chunk)
    for i in range(0, n_frames, chunk):
        eng.process_chunk(jnp.asarray(stacked[i:i + chunk], jnp.float32))
        eng.flush()
        mp = int(np.asarray(eng._host.map.mp_valid).sum())
        kf = eng._host.n_keyframes
        stats = eng.frame_stats[i:i + chunk]
        inl = [s["inliers"] for s in stats]
        kfs = "".join("K" if s["kf"] else "." for s in stats)
        oks = "".join("." if s["ok"] else "X" for s in stats)
        traj = eng.trajectory_refined()
        errs = []
        for j in range(i, min(i + chunk, len(traj))):
            c = np.linalg.inv(traj[j])[:3, 3]
            g = np.linalg.inv(gt[j])[:3, 3]
            errs.append(float(np.linalg.norm(c - g)))
        print(f"chunk {i:3d}: kf={kf:3d} mp={mp:5d} inl={min(inl):3d}"
              f"-{max(inl):3d} [{kfs}] fail[{oks}] "
              f"err={min(errs):.2f}-{max(errs):.2f}", flush=True)


if __name__ == "__main__":
    main()
