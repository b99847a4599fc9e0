import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_toolkit_tpu.geometry import se3


def random_twists(key, n, scale=1.0):
    return jax.random.normal(key, (n, 6)) * scale


def test_exp_identity():
    T = se3.exp(jnp.zeros(6))
    np.testing.assert_allclose(T, jnp.eye(4), atol=1e-6)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    xi = random_twists(key, 64, scale=0.8)
    T = se3.exp(xi)
    xi2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi),
                               rtol=1e-3, atol=1e-4)


def test_log_exp_small_angles():
    key = jax.random.PRNGKey(1)
    xi = random_twists(key, 32, scale=1e-5)
    np.testing.assert_allclose(np.asarray(se3.log(se3.exp(xi))),
                               np.asarray(xi), atol=1e-7)


def test_rotation_orthonormal():
    xi = random_twists(jax.random.PRNGKey(2), 16, 2.0)
    R = se3.exp(xi)[..., :3, :3]
    RtR = jnp.einsum('...ji,...jk->...ik', R, R)
    np.testing.assert_allclose(np.asarray(RtR),
                               np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-5)
    det = jnp.linalg.det(R)
    np.testing.assert_allclose(np.asarray(det), 1.0, atol=1e-5)


def test_inv_compose():
    xi = random_twists(jax.random.PRNGKey(3), 8, 1.0)
    T = se3.exp(xi)
    TT = T @ se3.inv(T)
    np.testing.assert_allclose(np.asarray(TT),
                               np.broadcast_to(np.eye(4), TT.shape), atol=1e-5)


def test_transform_matches_matmul():
    xi = random_twists(jax.random.PRNGKey(4), 8, 1.0)
    T = se3.exp(xi)
    X = jax.random.normal(jax.random.PRNGKey(5), (8, 3))
    Xh = jnp.concatenate([X, jnp.ones((8, 1))], axis=-1)
    expected = jnp.einsum('nij,nj->ni', T, Xh)[:, :3]
    np.testing.assert_allclose(np.asarray(se3.transform(T, X)),
                               np.asarray(expected), atol=1e-5)


def test_log_near_pi():
    axis = jnp.array([0.0, 0.0, 1.0])
    for theta in [3.05, 3.10, np.pi - 1e-3]:
        phi = axis * theta
        xi = jnp.concatenate([jnp.array([0.1, -0.2, 0.3]), phi])
        T = se3.exp(xi)
        xi2 = se3.log(T)
        T2 = se3.exp(xi2)
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-3)


def test_normalize_restores_orthonormality():
    xi = random_twists(jax.random.PRNGKey(6), 4, 1.0)
    T = se3.exp(xi)
    T_drift = T.at[..., :3, :3].multiply(1.0 + 1e-3)
    Tn = se3.normalize(T_drift)
    R = Tn[..., :3, :3]
    RtR = jnp.einsum('...ji,...jk->...ik', R, R)
    np.testing.assert_allclose(np.asarray(RtR),
                               np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-5)


def test_jit_and_vmap():
    xi = random_twists(jax.random.PRNGKey(7), 16, 0.5)
    T_jit = jax.jit(se3.exp)(xi)
    T_vmap = jax.vmap(se3.exp)(xi)
    np.testing.assert_allclose(np.asarray(T_jit), np.asarray(T_vmap), atol=1e-6)
