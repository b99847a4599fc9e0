"""In-scan cost split: tracking vs keyframe branch vs BA.

Compiles three chunk variants and times them steady-state:
  A: no keyframe ever fires      -> pure extract+track cost
  B: every frame a KF, BA off    -> + stereo/insert/cull/snapshot
  C: every frame a KF, BA on     -> + local BA
Run: python scripts/profile_scan_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from slam_toolkit_tpu.config import SlamConfig
    from slam_toolkit_tpu.geometry.camera import StereoCamera
    from slam_toolkit_tpu.mapping.map_state import (empty_map,
                                                    gather_local_landmarks,
                                                    insert_keyframe)
    from slam_toolkit_tpu.frontend.frame import add_stereo, build_frame
    from slam_toolkit_tpu.pipeline import scan_engine

    cfg = SlamConfig()
    cam = StereoCamera.from_config(cfg.camera)
    rng = np.random.default_rng(0)
    img_l = jnp.asarray(rng.uniform(0, 255,
                                    (cfg.camera.height, cfg.camera.width)
                                    ).astype(np.float32))
    img_r = jnp.asarray(rng.uniform(0, 255, img_l.shape).astype(np.float32))

    m = empty_map(cfg)
    frame = jax.jit(lambda im: build_frame(im, cam, cfg))(img_l)
    f2 = jax.jit(lambda f: add_stereo(f, img_l, img_r, cam, cfg))(frame)
    L = cfg.map.track_landmarks
    m = jax.jit(lambda mm, ff: insert_keyframe(
        mm, ff, jnp.eye(4), jnp.int32(0), jnp.zeros((L,), jnp.int32),
        jnp.zeros((L,), jnp.int32), jnp.zeros((L,), bool), cfg)[0])(m, f2)
    lm = gather_local_landmarks(m, L, cfg.map.track_recent_kfs)

    def carry(peak):
        return scan_engine.ChunkCarry(
            m=m, T_cw=jnp.eye(4), velocity=jnp.eye(4),
            lm_Xw=lm[0], lm_desc=lm[1], lm_ids=lm[2], lm_valid=lm[3],
            latest_slot=jnp.int32(0), latest_T=jnp.eye(4),
            frame_id=jnp.int32(1), inlier_peak=jnp.float32(peak))

    imgs = jnp.broadcast_to(jnp.stack([img_l, img_r]),
                            (16, 2) + img_l.shape)

    def bench(fn, c, n=10):
        out = fn(c, imgs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(c, imgs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n / 16 * 1e3

    chunk = scan_engine.make_chunk_fn(cfg, cam)
    a = bench(chunk, carry(0.0))
    print(f"A track-only        : {a:6.3f} ms/frame", flush=True)
    c = bench(chunk, carry(1e9))
    print(f"C all-KF, BA on     : {c:6.3f} ms/frame", flush=True)

    os.environ["SLAM_SCAN_NO_BA"] = "1"
    chunk_noba = scan_engine.make_chunk_fn(cfg, cam)
    b = bench(chunk_noba, carry(1e9))
    del os.environ["SLAM_SCAN_NO_BA"]
    print(f"B all-KF, BA off    : {b:6.3f} ms/frame", flush=True)
    print(f"-> KF branch w/o BA : {b - a:6.3f} ms/KF-event")
    print(f"-> BA alone         : {c - b:6.3f} ms/KF-event")


if __name__ == "__main__":
    main()
