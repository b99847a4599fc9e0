"""Profile the per-frame device pipeline stage by stage on the TPU.

Usage: python scripts/profile_track.py   (default env -> real chip)
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.frontend.frame import build_frame
from slam_toolkit_tpu.frontend.matching import projection_match
from slam_toolkit_tpu.frontend.tracker import track_pose
from slam_toolkit_tpu.optim import pose_lm
from slam_toolkit_tpu.ops.hamming import distance_matrix

cfg = SlamConfig()
cam = StereoCamera.from_config(cfg.camera)
rng = np.random.default_rng(0)
imgs = [jnp.asarray(rng.uniform(0, 255, (376, 1241)).astype(np.float32))
        for _ in range(4)]
jax.block_until_ready(imgs)

L = cfg.map.track_landmarks
Xw = jnp.asarray(np.stack([rng.uniform(-20, 20, L), rng.uniform(-3, 3, L),
                           rng.uniform(4, 60, L)], -1).astype(np.float32))
desc = jnp.asarray(rng.integers(0, 2**32, (L, 8), dtype=np.uint32))
valid = jnp.ones((L,), bool)
T = jnp.eye(4)


def bench(name, f, args_list, n=50):
    o = f(*args_list[0])
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(n):
        o = f(*args_list[i % len(args_list)])
    jax.block_until_ready(o)
    print(f"{name:34s} {1000*(time.perf_counter()-t0)/n:8.2f} ms")
    return o


bf = jax.jit(lambda im: build_frame(im, cam, cfg))
frame = bench("build_frame", bf, [(im,) for im in imgs])
frames = [bf(im) for im in imgs]
jax.block_until_ready(frames)

pm = jax.jit(lambda f: projection_match(Xw, desc, valid, f.feats, T, cam,
                                        cfg.matcher,
                                        cfg.matcher.projection_radius))
m = bench("projection_match (4096x2048)", pm, [(f,) for f in frames])

dm = jax.jit(lambda f: distance_matrix(desc, f.feats.desc))
bench("  distance_matrix only", dm, [(f,) for f in frames])

z = frames[0].norm_xy[m.kpt_idx]
s2 = frames[0].feats.sigma2[m.kpt_idx] / (cam.left.fx * cam.left.fx)
plm = jax.jit(lambda ok: pose_lm.optimize_pose(T, Xw, z, s2, ok,
                                               cfg.tracker))
bench("pose_lm (10 LM iters)", plm, [(m.ok,)])

tp = jax.jit(lambda f: track_pose(f, Xw, desc, valid, T, cam, cfg))
bench("track_pose full", tp, [(f,) for f in frames])

# ---- keyframe-event programs ----
from slam_toolkit_tpu.frontend.frame import add_stereo
from slam_toolkit_tpu.mapping.ba_adapter import local_ba_step
from slam_toolkit_tpu.mapping.map_state import (empty_map, insert_keyframe,
                                                gather_local_landmarks)

st = jax.jit(lambda f, il, ir: add_stereo(f, il, ir, cam, cfg))
f_st = bench("add_stereo (2nd extract+match)", st,
             [(frames[i], imgs[i], imgs[(i+1) % 4]) for i in range(4)], n=20)

m0 = empty_map(cfg)
Lt = cfg.map.track_landmarks
ids0 = jnp.zeros((Lt,), jnp.int32)
kpts0 = jnp.zeros((Lt,), jnp.int32)
inl0 = jnp.zeros((Lt,), bool)
ins = jax.jit(lambda m, f: insert_keyframe(m, f, jnp.eye(4), jnp.int32(0),
                                           ids0, kpts0, inl0, cfg)[0])
m1 = bench("insert_keyframe", ins, [(m0, f_st)], n=20)

ba = jax.jit(lambda m: local_ba_step(m, cam, cfg))
bench("local_ba_step (W=8,P=1024,x10)", ba, [(m1,)], n=10)

snap = jax.jit(lambda m: gather_local_landmarks(
    m, cfg.map.track_landmarks, cfg.map.track_recent_kfs))
bench("snapshot (gather landmarks)", snap, [(m1,)], n=20)
