"""ops/pose_lm_kernel.py: the fused LM solver vs optim.pose_lm."""

import numpy as np
import jax.numpy as jnp

from slam_toolkit_tpu.config import TrackerConfig
from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.optim import pose_lm
from slam_toolkit_tpu.ops import pose_lm_kernel


def _problem(seed, n=300, noise=1e-3):
    rng = np.random.default_rng(seed)
    Xw = np.stack([rng.uniform(-20, 20, n), rng.uniform(-5, 5, n),
                   rng.uniform(4, 60, n)], -1).astype(np.float32)
    T_true = np.asarray(se3.exp(jnp.asarray(
        rng.uniform(-0.2, 0.2, 6).astype(np.float32))))
    Xc = (T_true[:3, :3] @ Xw.T).T + T_true[:3, 3]
    z = (Xc[:, :2] / Xc[:, 2:3]).astype(np.float32)
    z += rng.normal(0, noise, z.shape).astype(np.float32)
    sigma2 = np.full(n, 1e-6, np.float32)
    mask = np.ones(n, bool)
    mask[:: 13] = False
    return (jnp.asarray(Xw), jnp.asarray(z), jnp.asarray(sigma2),
            jnp.asarray(mask), T_true)


def test_kernel_matches_solver_interpret():
    cfg = TrackerConfig()
    for seed in (0, 1, 2):
        Xw, z, sigma2, mask, T_true = _problem(seed)
        T0 = jnp.eye(4)
        ref = pose_lm.optimize_pose(T0, Xw, z, sigma2, mask, cfg)
        out = pose_lm_kernel.optimize_pose(T0, Xw, z, sigma2, mask, cfg,
                                           interpret=True)
        # both recover the pose; the solvers agree to f32 tolerance
        assert float(jnp.linalg.norm(out.T_cw - T_true)) < 0.02
        np.testing.assert_allclose(np.asarray(out.T_cw),
                                   np.asarray(ref.T_cw), atol=2e-3)
        r_ref = np.asarray(ref.inlier_r2)
        r_out = np.asarray(out.inlier_r2)
        fin = np.isfinite(r_ref)
        assert (np.isfinite(r_out) == fin).all()
        np.testing.assert_allclose(r_out[fin], r_ref[fin],
                                   rtol=5e-2, atol=1e-4)


def test_kernel_outlier_rejection_interpret():
    """Gross outliers must not drag the kernel's pose away."""
    cfg = TrackerConfig()
    Xw, z, sigma2, mask, T_true = _problem(7)
    z_np = np.array(z)
    z_np[: 30] += 0.5                     # 10% gross outliers
    out = pose_lm_kernel.optimize_pose(jnp.eye(4), Xw, jnp.asarray(z_np),
                                       sigma2, mask, cfg, interpret=True)
    assert float(jnp.linalg.norm(out.T_cw - T_true)) < 0.05
