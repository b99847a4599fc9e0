"""On-TPU numerical checks: every Pallas kernel vs its XLA twin at
PRODUCTION shapes (VERDICT round 1, weak #3: interpret-mode toy-shape
tests missed a Mosaic miscompile class entirely).

Run standalone on a machine with a TPU:  python scripts/tpu_kernel_check.py
Driven by tests/test_tpu_kernels.py in a subprocess (the pytest conftest
pins the suite itself to CPU).

Exit code 0 = all kernels agree within tolerance and are NaN-free.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fail(msg):
    print(f"FAIL: {msg}")
    sys.exit(1)


def check_match(rng):
    """Fused top-2 match kernel at L=4096 landmarks x K=2048 keypoints."""
    import jax
    import jax.numpy as jnp
    from slam_toolkit_tpu.ops import match_kernel as mk

    L, K = 4096, 2048
    a = jnp.asarray(rng.integers(0, 2 ** 32, (L, 8)).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 2 ** 32, (K, 8)).astype(np.uint32))
    auv = jnp.asarray(rng.uniform(0, 1200, (L, 2)).astype(np.float32))
    bxy = jnp.asarray(rng.uniform(0, 1200, (K, 2)).astype(np.float32))
    got = np.asarray(mk._topk2_pallas(a, b, auv, bxy, 50.0))
    want = np.asarray(mk._topk2_xla(a, b, auv, bxy, 50.0))
    if not np.isfinite(got).all():
        fail("match kernel produced non-finite values")
    # columns: best_r, second_r, argbest_r, best_2r, second_2r, argbest_2r
    for c, name in ((0, "best_r"), (1, "second_r"), (2, "argbest_r"),
                    (3, "best_2r"), (4, "second_2r"), (5, "argbest_2r")):
        if not np.array_equal(got[:, c], want[:, c]):
            n = int((got[:, c] != want[:, c]).sum())
            fail(f"match kernel col {name}: {n}/{L} mismatches")
    print(f"match_topk2 OK at ({L}, {K})")


def check_patches(rng):
    """Block gather at KITTI image size, K=2048 windows of 37x37."""
    import jax.numpy as jnp
    from slam_toolkit_tpu.ops import patches

    H, W, K, B = 376, 1241, 2048, 37
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    ys = jnp.asarray(rng.integers(0, H - B, (K,)).astype(np.int32))
    xs = jnp.asarray(rng.integers(0, W - B, (K,)).astype(np.int32))
    got = np.asarray(patches._gather_blocks_pallas(img, ys, xs, B, B))
    want = np.asarray(patches._gather_blocks_fallback(img, ys, xs, B, B))
    if not np.array_equal(got, want):
        fail(f"patch gather mismatch: "
             f"{int((got != want).sum())}/{got.size} elements")
    print(f"patch_gather OK at K={K}, {B}x{B} on {H}x{W}")


def check_stereo(rng):
    """SAD curves at KITTI size, K=2048 keypoints, max_disp=100."""
    import jax.numpy as jnp
    from slam_toolkit_tpu.ops import stereo_sad as ss

    H, W, K, D = 376, 1241, 2048, 100
    img_l = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    img_r = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    side = 2 * ss.WIN + 1
    sw = ss._strip_w(D)
    ys = jnp.asarray(rng.integers(0, H - side, (K,)).astype(np.int32))
    xl = jnp.asarray(rng.integers(0, W - side, (K,)).astype(np.int32))
    xs = jnp.asarray(rng.integers(0, W - sw, (K,)).astype(np.int32))
    got = np.asarray(ss._curve_pallas(img_l, img_r, ys, xl, xs, D))
    want = np.asarray(ss._curve_fallback(img_l, img_r, ys, xl, xs, D))
    if not np.isfinite(got).all():
        fail("stereo SAD produced non-finite values")
    err = np.abs(got - want).max()
    if err > 1e-2:
        fail(f"stereo SAD max err {err}")
    print(f"stereo_sad OK at K={K}, D={D} (max err {err:.2e})")


def check_pose_lm(rng):
    """Whole-solver pose LM at N=4096 observations, 10 iterations."""
    import jax.numpy as jnp
    from slam_toolkit_tpu.config import TrackerConfig
    from slam_toolkit_tpu.geometry import se3
    from slam_toolkit_tpu.ops import pose_lm_kernel
    from slam_toolkit_tpu.optim import pose_lm

    N = 4096
    cfg = TrackerConfig()
    T_true = np.asarray(se3.exp(jnp.asarray(
        [0.3, -0.1, 0.2, 0.02, -0.03, 0.01], jnp.float32)))
    Xw = rng.uniform(-5, 5, (N, 3)).astype(np.float32)
    Xw[:, 2] = rng.uniform(4, 30, N)
    Xc = (T_true[:3, :3] @ Xw.T).T + T_true[:3, 3]
    z = (Xc[:, :2] / Xc[:, 2:3]).astype(np.float32)
    z += rng.normal(0, 0.001, z.shape).astype(np.float32)
    sigma2 = np.full((N,), 1e-6, np.float32)
    wmask = rng.uniform(size=N) < 0.9
    T0 = jnp.eye(4, dtype=jnp.float32)
    got = pose_lm_kernel.optimize_pose(
        T0, jnp.asarray(Xw), jnp.asarray(z), jnp.asarray(sigma2),
        jnp.asarray(wmask), cfg)
    want = pose_lm.optimize_pose(
        T0, jnp.asarray(Xw), jnp.asarray(z), jnp.asarray(sigma2),
        jnp.asarray(wmask), cfg)
    gT, wT = np.asarray(got.T_cw), np.asarray(want.T_cw)
    if not np.isfinite(gT).all():
        fail("pose LM kernel produced non-finite pose")
    if np.abs(gT - T_true).max() > 5e-3:
        fail(f"pose LM kernel off ground truth by "
             f"{np.abs(gT - T_true).max():.2e}")
    if np.abs(gT - wT).max() > 1e-3:
        fail(f"pose LM kernel vs XLA diverge by {np.abs(gT - wT).max():.2e}")
    print(f"pose_lm OK at N={N} (|T-gt| {np.abs(gT - T_true).max():.1e})")


def check_ba(rng):
    """Whole-solver BA at production W=8 poses x P=512 points."""
    import jax.numpy as jnp
    from slam_toolkit_tpu.geometry import se3
    from slam_toolkit_tpu.ops import ba_kernel
    from slam_toolkit_tpu.optim import local_ba

    W, P = 8, 512
    baseline = 0.54
    Xw = rng.uniform(-8, 8, (P, 3)).astype(np.float32)
    Xw[:, 2] = rng.uniform(5, 40, P)
    T_list, z = [], np.zeros((W, P, 3), np.float32)
    for w in range(W):
        xi = np.zeros(6, np.float32)
        xi[2] = 0.8 * w
        xi[4] = 0.01 * w
        T = np.asarray(se3.exp(jnp.asarray(xi)))
        T_list.append(T)
        Xc = (T[:3, :3] @ Xw.T).T + T[:3, 3]
        z[w, :, 0] = Xc[:, 0] / Xc[:, 2]
        z[w, :, 1] = Xc[:, 1] / Xc[:, 2]
        z[w, :, 2] = (Xc[:, 0] - baseline) / Xc[:, 2]
    z += rng.normal(0, 5e-4, z.shape).astype(np.float32)
    # perturb poses + points; BA must pull them back
    T_init = [np.asarray(se3.normalize(jnp.asarray(
        np.asarray(se3.exp(jnp.asarray(
            rng.normal(0, 0.01, 6).astype(np.float32)))) @ T)))
        for T in T_list]
    T_init[0] = T_list[0]
    Xw_init = Xw + rng.normal(0, 0.05, Xw.shape).astype(np.float32)
    prob = local_ba.BAProblem(
        T_cw=jnp.asarray(np.stack(T_init), jnp.float32),
        pose_fixed=jnp.zeros((W,), bool).at[0].set(True),
        pose_valid=jnp.ones((W,), bool),
        Xw=jnp.asarray(Xw_init),
        point_valid=jnp.ones((P,), bool),
        z=jnp.asarray(z),
        inv_sigma=jnp.full((W, P), 1000.0, jnp.float32),
        obs_mask=jnp.asarray(rng.uniform(size=(W, P)) < 0.8),
        stereo_mask=jnp.ones((W, P), bool),
        baseline=jnp.float32(baseline))
    got = ba_kernel.solve_ba(prob, iters=10)
    want = local_ba.solve_ba(prob, iters=10)
    gT, wT = np.asarray(got.T_cw), np.asarray(want.T_cw)
    if not (np.isfinite(gT).all() and np.isfinite(np.asarray(got.Xw)).all()):
        fail("BA kernel produced non-finite results")
    errs = [np.abs(gT[w] - np.asarray(T_list[w])).max() for w in range(W)]
    if max(errs) > 2e-2:
        fail(f"BA kernel off ground truth by {max(errs):.2e}")
    dT = np.abs(gT - wT).max()
    if dT > 1e-2:
        fail(f"BA kernel vs XLA solver diverge by {dT:.2e}")
    print(f"local_ba OK at W={W}, P={P} (|T-gt| {max(errs):.1e}, "
          f"|T-xla| {dT:.1e})")


def main():
    import jax
    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend")
        sys.exit(2)
    rng = np.random.default_rng(0)
    check_match(rng)
    check_patches(rng)
    check_stereo(rng)
    check_pose_lm(rng)
    check_ba(rng)
    print("ALL TPU KERNEL CHECKS PASSED")


if __name__ == "__main__":
    main()
