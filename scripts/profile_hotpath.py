"""Hot-path component timing on the real TPU.

Times each stage of the per-frame loop in isolation (steady state,
post-compile): extraction, matching+pose LM, the no-keyframe scan body,
and the keyframe branch (stereo + insert + cull + BA + snapshot).
Run: python scripts/profile_hotpath.py  (needs the TPU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3   # ms


def main():
    import jax
    import jax.numpy as jnp

    from slam_toolkit_tpu.config import SlamConfig
    from slam_toolkit_tpu.frontend.frame import add_stereo, build_frame
    from slam_toolkit_tpu.frontend.tracker import track_pose
    from slam_toolkit_tpu.geometry.camera import StereoCamera
    from slam_toolkit_tpu.mapping.ba_adapter import local_ba_step
    from slam_toolkit_tpu.mapping.map_state import (
        empty_map, gather_local_landmarks, insert_keyframe)

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    rng = np.random.default_rng(0)
    img_l = jnp.asarray(rng.uniform(0, 255,
                                    (cfg.camera.height, cfg.camera.width)
                                    ).astype(np.float32))
    img_r = jnp.asarray(rng.uniform(0, 255, img_l.shape).astype(np.float32))

    build = jax.jit(lambda im: build_frame(im, cam, cfg))
    frame = build(img_l)
    print(f"build_frame (extract):      {timeit(build, img_l):7.3f} ms")

    m = empty_map(cfg)
    L = cfg.map.track_landmarks
    Xw = jnp.asarray(rng.uniform(-10, 10, (L, 3)).astype(np.float32)
                     + np.asarray([0, 0, 15.0], np.float32))
    desc = jnp.asarray(rng.integers(0, 2 ** 32, (L, 8)).astype(np.uint32))
    valid = jnp.ones((L,), bool)
    T = jnp.eye(4)

    track = jax.jit(lambda f, X, d, v, Tp:
                    track_pose(f, X, d, v, Tp, cam, cfg))
    print(f"track (match + pose LM):    "
          f"{timeit(track, frame, Xw, desc, valid, T):7.3f} ms")

    stereo = jax.jit(lambda f: add_stereo(f, img_l, img_r, cam, cfg))
    f2 = stereo(frame)
    print(f"add_stereo (SAD):           {timeit(stereo, frame):7.3f} ms")

    ids = jnp.zeros((L,), jnp.int32)
    kpts = jnp.zeros((L,), jnp.int32)
    inl = jnp.zeros((L,), bool)
    ins = jax.jit(lambda mm, ff: insert_keyframe(mm, ff, T, jnp.int32(1),
                                                 ids, kpts, inl, cfg)[0])
    m2 = ins(m, f2)
    print(f"insert_keyframe:            {timeit(ins, m, f2):7.3f} ms")

    ba = jax.jit(lambda mm: local_ba_step(mm, cam, cfg))
    m3 = ba(m2)
    print(f"local_ba_step:              {timeit(ba, m2):7.3f} ms")

    snap = jax.jit(lambda mm: gather_local_landmarks(
        mm, cfg.map.track_landmarks, cfg.map.track_recent_kfs))
    print(f"gather_local_landmarks:     {timeit(snap, m3):7.3f} ms")

    # the full scan body over a 16-frame chunk, no keyframe events
    from slam_toolkit_tpu.pipeline.scan_engine import (ChunkCarry,
                                                       make_chunk_fn)
    chunk_fn = make_chunk_fn(cfg, cam)
    lm = gather_local_landmarks(m3, cfg.map.track_landmarks,
                                cfg.map.track_recent_kfs)
    carry = ChunkCarry(
        m=m3, T_cw=T, velocity=T, lm_Xw=lm[0], lm_desc=lm[1],
        lm_ids=lm[2], lm_valid=lm[3], latest_slot=jnp.int32(0),
        latest_T=T, frame_id=jnp.int32(1), inlier_peak=jnp.float32(1e9))
    imgs = jnp.broadcast_to(jnp.stack([img_l, img_r]),
                            (16, 2) + img_l.shape)
    ms = timeit(chunk_fn, carry, imgs, n=10)
    print(f"chunk(16) total:            {ms:7.3f} ms "
          f"({ms / 16:.3f} ms/frame, {16e3 / ms:.0f} fps ceiling)")


if __name__ == "__main__":
    main()
