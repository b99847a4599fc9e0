"""DCE-proof per-stage timing of the frame hot path on the TPU.

Every stage's output is folded into the scan carry so XLA cannot
dead-code-eliminate it (the original ablate_chunk.py accidentally
measured descriptor-free extraction). Run with
JAX_COMPILATION_CACHE_DIR set to amortize remote compiles.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_sequence
from slam_toolkit_tpu.frontend.frame import build_frame
from slam_toolkit_tpu.frontend.matching import projection_match
from slam_toolkit_tpu.frontend.tracker import track_pose
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.ops import brief, fast, pyramid, topk_grid
from slam_toolkit_tpu.ops.extractor import level_budgets

cfg = SlamConfig()
cam = StereoCamera.from_config(cfg.camera)
C = 16
world, gt, frames = make_sequence(cfg, n_frames=C, seed=7, step=0.8)
images = jnp.asarray(np.stack([l for l, r in frames]), jnp.float32)
jax.block_until_ready(images)

L = cfg.map.track_landmarks
rng = np.random.default_rng(0)
Xw = jnp.asarray(np.stack([rng.uniform(-20, 20, L), rng.uniform(-3, 3, L),
                           rng.uniform(4, 60, L)], -1).astype(np.float32))
desc = jnp.asarray(rng.integers(0, 2**32, (L, 8), dtype=np.uint32))
lm_valid = jnp.ones((L,), bool)
T = jnp.eye(4)


def consume(x):
    return jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:4096])


def scan_over(fn, name, n=6):
    @jax.jit
    def run(images):
        def body(c, img):
            return c + fn(img), 0.0
        return jax.lax.scan(body, jnp.float32(0.0), images)[0]
    o = run(images)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = run(images)
    jax.block_until_ready(o)
    float(o)
    dt = (time.perf_counter() - t0) / (n * C)
    print(f"{name:42s} {1000*dt:7.2f} ms/frame", flush=True)


ecfg = cfg.extractor
border = ecfg.patch_radius + 1
budgets = level_budgets(ecfg)


def pyr_only(img):
    return sum(consume(l) for l in pyramid.build_pyramid(img, ecfg))


def pyr_fast(img):
    s = 0.0
    for l in pyramid.build_pyramid(img, ecfg):
        s += consume(fast.detect_dual(
            l, float(ecfg.fast_threshold_high),
            float(ecfg.fast_threshold_low), border))
    return s


def pyr_fast_sel(img):
    s = 0.0
    for l, n_l in zip(pyramid.build_pyramid(img, ecfg), budgets):
        eff = fast.detect_dual(l, float(ecfg.fast_threshold_high),
                               float(ecfg.fast_threshold_low), border)
        xy, _, v = topk_grid.select_keypoints(eff, ecfg.cell_size, n_l)
        s += consume(xy) + consume(v)
    return s


def pyr_fast_sel_blur(img):
    s = 0.0
    for l, n_l in zip(pyramid.build_pyramid(img, ecfg), budgets):
        eff = fast.detect_dual(l, float(ecfg.fast_threshold_high),
                               float(ecfg.fast_threshold_low), border)
        xy, _, v = topk_grid.select_keypoints(eff, ecfg.cell_size, n_l)
        b = pyramid.gaussian_blur(l, 7, ecfg.blur_sigma)
        s += consume(xy) + consume(b)
    return s


def full_extract(img):
    s = 0.0
    for l, n_l in zip(pyramid.build_pyramid(img, ecfg), budgets):
        eff = fast.detect_dual(l, float(ecfg.fast_threshold_high),
                               float(ecfg.fast_threshold_low), border)
        xy, _, v = topk_grid.select_keypoints(eff, ecfg.cell_size, n_l)
        b = pyramid.gaussian_blur(l, 7, ecfg.blur_sigma)
        d = brief.upright_patch_descriptors(b, xy)
        s += consume(xy) + consume(d)
    return s


def bf(img):
    f = build_frame(img, cam, cfg)
    return consume(f.feats.desc) + consume(f.norm_xy)


def bf_match(img):
    f = build_frame(img, cam, cfg)
    m = projection_match(Xw, desc, lm_valid, f.feats, T, cam, cfg.matcher,
                         cfg.matcher.projection_radius)
    return consume(m.kpt_idx) + consume(m.ok)


def bf_track(img):
    f = build_frame(img, cam, cfg)
    r = track_pose(f, Xw, desc, lm_valid, T, cam, cfg)
    return consume(r.T_cw) + consume(r.mp_inlier)


scan_over(pyr_only, "pyramid")
scan_over(pyr_fast, "pyramid+FASTdual")
scan_over(pyr_fast_sel, "pyramid+FASTdual+select")
scan_over(pyr_fast_sel_blur, "pyramid+FASTdual+select+blur")
scan_over(full_extract, "extract full (desc consumed)")
scan_over(bf, "build_frame (desc+norm consumed)")
scan_over(bf_match, "build_frame + projection_match")
scan_over(bf_track, "build_frame + track_pose")
