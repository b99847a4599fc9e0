import jax
import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.config import TrackerConfig
from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.optim import pose_lm


def synth_problem(key, n=200, noise=0.0, outliers=0):
    k1, k2, k3 = jax.random.split(key, 3)
    Xw = jnp.concatenate([
        jax.random.uniform(k1, (n, 2), minval=-10.0, maxval=10.0),
        jax.random.uniform(k2, (n, 1), minval=5.0, maxval=40.0)], axis=-1)
    xi_true = jnp.array([0.3, -0.2, 0.8, 0.03, -0.05, 0.02])
    T_true = se3.exp(xi_true)
    Xc = se3.transform(T_true, Xw)
    z = jnp.stack([Xc[:, 0] / Xc[:, 2], Xc[:, 1] / Xc[:, 2]], axis=-1)
    if noise > 0:
        z = z + noise * jax.random.normal(k3, z.shape)
    if outliers > 0:
        bad = jax.random.normal(jax.random.PRNGKey(9), (outliers, 2)) * 0.3
        z = z.at[:outliers].add(bad)
    sigma2 = jnp.full((n,), (1.0 / 700.0) ** 2)
    mask = jnp.ones((n,))
    return T_true, Xw, z, sigma2, mask


def test_converges_from_perturbed_init():
    T_true, Xw, z, sigma2, mask = synth_problem(jax.random.PRNGKey(0))
    T_init = se3.exp(jnp.array([0.2, 0.1, -0.3, 0.02, 0.03, -0.04])) @ T_true
    res = jax.jit(lambda: pose_lm.optimize_pose(
        T_init, Xw, z, sigma2, mask, TrackerConfig()))()
    err = se3.log(res.T_cw @ se3.inv(T_true))
    assert float(jnp.abs(err).max()) < 1e-4, np.asarray(err)


def test_robust_to_outliers():
    T_true, Xw, z, sigma2, mask = synth_problem(
        jax.random.PRNGKey(1), n=300, noise=0.5 / 700.0, outliers=60)
    T_init = se3.exp(jnp.array([0.1, -0.05, 0.2, 0.01, -0.02, 0.01])) @ T_true
    cfg = TrackerConfig(num_iterations=15)
    res = pose_lm.optimize_pose(T_init, Xw, z, sigma2, mask, cfg)
    err = se3.log(res.T_cw @ se3.inv(T_true))
    # translation within 2cm, rotation within ~0.2deg despite 20% outliers
    assert float(jnp.abs(err[:3]).max()) < 0.02, np.asarray(err)
    assert float(jnp.abs(err[3:]).max()) < 0.004, np.asarray(err)
    # outlier residuals should be large, inliers small
    assert float(jnp.median(res.inlier_r2[60:])) < 9.0


def test_masked_points_ignored():
    T_true, Xw, z, sigma2, mask = synth_problem(jax.random.PRNGKey(2), n=100)
    # corrupt half the observations but mask them out
    z_bad = z.at[:50].add(10.0)
    mask = mask.at[:50].set(0.0)
    T_init = se3.exp(jnp.array([0.05, 0.0, -0.1, 0.01, 0.0, 0.0])) @ T_true
    res = pose_lm.optimize_pose(T_init, Xw, z_bad, sigma2, mask,
                                TrackerConfig())
    err = se3.log(res.T_cw @ se3.inv(T_true))
    assert float(jnp.abs(err).max()) < 1e-4


def test_behind_camera_points_zero_weight():
    T_true, Xw, z, sigma2, mask = synth_problem(jax.random.PRNGKey(3), n=100)
    Xw = Xw.at[:10, 2].set(-50.0)  # behind the camera after transform
    T_init = T_true
    res = pose_lm.optimize_pose(T_init, Xw, z, sigma2, mask, TrackerConfig())
    assert bool(jnp.isfinite(res.cost))
    err = se3.log(res.T_cw @ se3.inv(T_true))
    assert float(jnp.abs(err).max()) < 1e-3


def test_all_behind_pose_is_expensive():
    """Regression: a pose with every landmark behind the camera used to
    cost exactly 0 (points dropped out of the robust sum), so an
    ill-conditioned LM step into it was ACCEPTED and the solver stalled
    on a garbage pose. The behind-camera penalty makes such poses far
    more expensive than any reprojection error."""
    import numpy as np

    from slam_toolkit_tpu.config import TrackerConfig
    from slam_toolkit_tpu.geometry import se3

    rng = np.random.default_rng(0)
    N = 64
    Xw = np.concatenate([rng.uniform(-1, 1, (N, 2)),
                         rng.uniform(1.8, 2.2, (N, 1))],
                        axis=1).astype(np.float32)
    z = (Xw[:, :2] / Xw[:, 2:3]).astype(np.float32)
    cfg = TrackerConfig()
    T_behind = se3.exp(jnp.asarray([0, 0, 3.5, 0, 3.05, 0.0],
                                   jnp.float32))
    res_b = pose_lm.optimize_pose(T_behind, jnp.asarray(Xw),
                                  jnp.asarray(z), jnp.full((N,), 1e-4),
                                  jnp.ones((N,), bool), cfg)
    assert float(res_b.cost) > 1e4, float(res_b.cost)
    # and a sane init still converges to the exact pose
    T0 = se3.exp(jnp.asarray([0.05, -0.03, 0.1, 0.02, -0.04, 0.01],
                             jnp.float32))
    res = pose_lm.optimize_pose(T0, jnp.asarray(Xw), jnp.asarray(z),
                                jnp.full((N,), 1e-4),
                                jnp.ones((N,), bool), cfg)
    np.testing.assert_allclose(np.asarray(res.T_cw), np.eye(4), atol=1e-3)
