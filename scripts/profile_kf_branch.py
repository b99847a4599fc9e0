"""Sub-split of the keyframe branch: stereo / insert / cull / snapshot / BA.

Standalone jitted pieces at production shapes on the real bench frames —
relative sizes only (fusion inside the scan can shift absolutes).
Run: python scripts/profile_kf_branch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from slam_toolkit_tpu.config import SlamConfig
    from slam_toolkit_tpu.frontend.frame import add_stereo, build_frame
    from slam_toolkit_tpu.mapping.ba_adapter import local_ba_step
    from slam_toolkit_tpu.mapping.culling import cull_weak_mappoints
    from slam_toolkit_tpu.mapping.map_state import (gather_local_landmarks,
                                                    insert_keyframe)
    from slam_toolkit_tpu.pipeline.scan_engine import ChunkedSlamEngine

    cfg = SlamConfig()
    cache = (f"/tmp/slam_bench_seq_v2_160_{cfg.camera.width}x"
             f"{cfg.camera.height}.npz.npy")
    stacked = np.load(cache, mmap_mode="r")
    chunks = [jnp.asarray(stacked[i:i + 16], jnp.float32)
              for i in range(0, 48, 16)]
    eng = ChunkedSlamEngine(cfg, chunk_size=16)
    for c in chunks:
        eng.process_chunk(c)
    eng.flush()
    m = eng._host.map
    cam = eng.cam
    left = jnp.asarray(stacked[48, 0], jnp.float32)
    right = jnp.asarray(stacked[48, 1], jnp.float32)

    L = cfg.map.track_landmarks
    frame = jax.jit(lambda im: build_frame(im, cam, cfg))(left)
    f2 = jax.jit(lambda f, l, r: add_stereo(f, l, r, cam, cfg))(
        frame, left, right)
    ids = jnp.zeros((L,), jnp.int32)
    kpt = jnp.zeros((L,), jnp.int32)
    inl = jnp.zeros((L,), bool)

    def timeit(name, fn, *args, n=20):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(n)]
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / n * 1e3)
        print(f"{name:22s}: {best:6.3f} ms", flush=True)
        return best

    timeit("add_stereo", jax.jit(
        lambda f, l, r: add_stereo(f, l, r, cam, cfg)), frame, left, right)
    timeit("insert_keyframe", jax.jit(
        lambda mm, ff: insert_keyframe(mm, ff, jnp.eye(4), jnp.int32(50),
                                       ids, kpt, inl, cfg)[0]), m, f2)
    timeit("cull_weak", jax.jit(
        lambda mm: cull_weak_mappoints(mm, jnp.int32(50),
                                       cfg.map.mp_cull_grace_frames,
                                       cfg.map.mp_cull_min_obs)), m)
    timeit("snapshot", jax.jit(
        lambda mm: gather_local_landmarks(mm, L, cfg.map.track_recent_kfs)), m)
    timeit("local_ba", jax.jit(
        lambda mm: local_ba_step(mm, cam, cfg)), m)


if __name__ == "__main__":
    main()
