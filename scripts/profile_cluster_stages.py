"""Device-time breakdown of the fused dense-cluster step (r5 verdict #4/#7).

Times each stage of cluster/tracker.fused_step as its own jitted
program on real inputs from make_cluster_scene, so the ~100 ms fused
step's cost is attributed (stereo SAD, Farneback flow levels, sampling,
TrackCluster, RANSAC rounds) instead of guessed. Each stage program is
compiled once and timed over repeat dispatches; stage sums won't match
the fused step exactly (XLA fuses across stages there) but name the
poles.

Run: python scripts/profile_cluster_stages.py            (real chip)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(fn, *a, n=10):
    import jax
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from slam_toolkit_tpu.cluster import flow as flow_mod
    from slam_toolkit_tpu.cluster import stereo_bm
    from slam_toolkit_tpu.cluster.tracker import (DenseConfig, dense_frame,
                                                  _sample_grid)
    from slam_toolkit_tpu.data.synthetic import make_cluster_scene

    scene = make_cluster_scene(n_frames=3)
    cfg = DenseConfig(max_points=18688)
    cam = scene.cam
    g0 = jnp.asarray(scene.frames[0][0])
    gl = jnp.asarray(scene.frames[1][0])
    gr = jnp.asarray(scene.frames[1][1])

    ms_edge = t(jax.jit(stereo_bm.sobel_edge_mask), gl)
    ms_disp = t(jax.jit(lambda a, b: stereo_bm.disparity(
        a, b, cfg.num_disparities, cfg.block_size)), gl, gr)
    ms_flow = t(jax.jit(lambda a, b: flow_mod.farneback_flow(
        a, b, levels=cfg.flow_levels, win=cfg.flow_win,
        max_flow_x=cfg.max_flow_x, max_flow_y=cfg.max_flow_y)), g0, gl)
    # flow sub-splits: a single poly_expand and a single warp at full res
    ms_poly = t(jax.jit(flow_mod.poly_expand), gl)
    fl0 = jnp.zeros(gl.shape + (2,), jnp.float32)
    ms_warp = t(jax.jit(lambda i, f: flow_mod._warp(
        i, f, rx=cfg.max_flow_x, ry=cfg.max_flow_y)), gl, fl0)
    ms_upd = t(jax.jit(lambda: flow_mod._flow_update(
        *flow_mod.poly_expand(g0), *flow_mod.poly_expand(gl), fl0,
        cfg.flow_win)))
    ms_frame = t(jax.jit(lambda a, b, p: dense_frame(
        a, b, p, cam, cfg)), gl, gr, g0)

    print(f"edge_mask        {ms_edge:8.1f} ms")
    print(f"stereo disparity {ms_disp:8.1f} ms")
    print(f"farneback flow   {ms_flow:8.1f} ms  (levels={cfg.flow_levels}, "
          f"iters=2)")
    print(f"  poly_expand 1x {ms_poly:8.1f} ms  (x{2 * 2 + 1} per flow at "
          f"fine levels)")
    print(f"  warp 1x        {ms_warp:8.1f} ms  (x{2 * cfg.flow_levels} "
          f"per flow)")
    print(f"  flow_update 1x {ms_upd:8.1f} ms")
    print(f"dense_frame      {ms_frame:8.1f} ms  (edge+disp+flow+samples, "
          f"one program)")


if __name__ == "__main__":
    main()
