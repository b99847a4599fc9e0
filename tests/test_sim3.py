"""Sim(3) geometry + Sim(3) pose graph (the reference's own TODO,
ref src/loopcloser.cpp:107 "SE3 -> Sim3").

Covers: exp/log round trips across the small-angle / small-scale
branches, reduction to SE(3) at sigma = 0, the adjoint identity
Exp(Ad_S xi) = S Exp(xi) S^-1, and a scale-drifted loop that the Sim(3)
pose graph corrects but the SE(3) one cannot.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from slam_toolkit_tpu.geometry import se3, sim3


def _rand_xi(rng, n, rho=1.0, phi=1.0, sigma=0.3):
    x = rng.normal(size=(n, 7)).astype(np.float32)
    x[:, :3] *= rho
    x[:, 3:6] *= phi
    x[:, 6] *= sigma
    return jnp.asarray(x)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = _rand_xi(rng, 32)
    S = sim3.exp(xi)
    np.testing.assert_allclose(np.asarray(sim3.log(S)), np.asarray(xi),
                               atol=2e-4)


def test_exp_log_small_branches():
    rng = np.random.default_rng(1)
    # tiny rotation, tiny scale, and mixed combinations
    for rho, phi, sigma in [(1.0, 1e-6, 1e-7), (1.0, 1e-6, 0.4),
                            (1.0, 0.8, 1e-7), (0.0, 0.0, 0.0)]:
        xi = _rand_xi(rng, 8, rho, phi, sigma)
        S = sim3.exp(xi)
        np.testing.assert_allclose(np.asarray(sim3.log(S)),
                                   np.asarray(xi), atol=2e-4)


def test_reduces_to_se3_at_zero_sigma():
    rng = np.random.default_rng(2)
    xi7 = _rand_xi(rng, 16, sigma=0.0)
    S = sim3.exp(xi7)
    T = se3.exp(xi7[:, :6])
    np.testing.assert_allclose(np.asarray(S), np.asarray(T), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim3.scale_of(S)), 1.0,
                               atol=1e-5)


def test_inv_compose_identity():
    rng = np.random.default_rng(3)
    S = sim3.exp(_rand_xi(rng, 16))
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), S.shape)
    np.testing.assert_allclose(np.asarray(S @ sim3.inv(S)), eye,
                               atol=1e-5)


def test_adjoint_identity():
    """Exp(Ad_S xi) = S Exp(xi) S^-1 — validates layout and signs."""
    rng = np.random.default_rng(4)
    S = sim3.exp(_rand_xi(rng, 8))
    xi = _rand_xi(rng, 8, rho=0.3, phi=0.3, sigma=0.1)
    lhs = sim3.exp(jnp.einsum('nij,nj->ni', sim3.adjoint(S), xi))
    rhs = S @ sim3.exp(xi) @ sim3.inv(S)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               atol=5e-4)


def test_transform_scales_points():
    S = sim3.make(jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]),
                  jnp.asarray(2.0))
    X = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(sim3.transform(S, X)),
                               [[3.0, 4.0, 6.0]], atol=1e-6)


def _circle_poses(n, radius=10.0):
    """Keyframe poses T_cw on a planar circle, camera z forward."""
    Ts = []
    for k in range(n):
        ang = 2.0 * np.pi * k / n
        c, s = np.cos(ang), np.sin(ang)
        R_wc = np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]],
                        np.float32)
        t_wc = np.array([radius * s, 0.0, radius * (1 - c)], np.float32)
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = t_wc
        Ts.append(np.linalg.inv(T_wc))
    return np.stack(Ts)


def _scale_drifted_loop(n=24, drift_per_edge=1.01):
    """The ORB-SLAM essential-graph scenario. Ground-truth circle;
    the odometry INTEGRATION drifts in scale (edge k's translation too
    long by drift_per_edge^k — the monocular signature). Odometry edges
    are then measured from the drifted estimates themselves (zero
    residual at init, exactly like a real closure where chain edges
    come from the current keyframe poses); the loop edge 0 -> n-1 is
    what loop detection measures: the true relative pose expressed in
    the CURRENT drifted scale s_end, i.e. (R_rel, s_end*t_rel) with
    scale component s_end. Returns (T_gt, T_init, edge_ij, edge_T_se3,
    edge_T_sim3, s_end)."""
    T_gt = _circle_poses(n)
    s = 1.0
    T_init = [T_gt[0]]
    for k in range(n - 1):
        rel = T_gt[k + 1] @ np.linalg.inv(T_gt[k])
        rel_d = rel.copy()
        s *= drift_per_edge
        rel_d[:3, 3] *= s                       # compounded scale drift
        T_init.append(rel_d @ T_init[-1])
    T_init = np.stack(T_init).astype(np.float32)

    edge_ij = [(k, k + 1) for k in range(n - 1)] + [(0, n - 1)]
    chain = [T_init[k + 1] @ np.linalg.inv(T_init[k])
             for k in range(n - 1)]
    rel_loop = T_gt[n - 1] @ np.linalg.inv(T_gt[0])
    # SE(3) problem sees the metric loop measurement (what re-tracking
    # against the candidate's landmarks yields); Sim(3) also sees the
    # detected relative scale
    eT_se3 = np.stack(chain + [rel_loop]).astype(np.float32)
    loop_sim = np.asarray(sim3.make(
        jnp.asarray(rel_loop[:3, :3]) * 1.0,
        jnp.asarray(rel_loop[:3, 3] * s), jnp.asarray(s)), np.float32)
    eT_sim3 = np.stack(chain + [loop_sim]).astype(np.float32)
    return T_gt, T_init, np.asarray(edge_ij, np.int32), eT_se3, \
        eT_sim3, s


@pytest.mark.slow
def test_sim3_pose_graph_absorbs_scale_drift():
    from slam_toolkit_tpu.optim.pose_graph import (PoseGraphProblem,
                                                   solve_pose_graph,
                                                   solve_pose_graph_sim3)
    n = 24
    T_gt, T_init, eij, eT6, eT7, s_end = _scale_drifted_loop(n)
    E = eT6.shape[0]

    def err(T_opt):
        # translation RMSE of camera centers vs ground truth
        c_opt = np.stack([np.linalg.inv(np.asarray(T, np.float64))[:3, 3]
                          for T in T_opt])
        c_gt = np.stack([np.linalg.inv(T.astype(np.float64))[:3, 3]
                         for T in T_gt])
        return float(np.sqrt(np.mean(np.sum((c_opt - c_gt) ** 2, -1))))

    common = dict(
        pose_valid=jnp.ones((n,), bool),
        pose_fixed=jnp.zeros((n,), bool).at[0].set(True),
        edge_i=jnp.asarray(eij[:, 0]), edge_j=jnp.asarray(eij[:, 1]),
        edge_valid=jnp.ones((E,), bool))

    prob_se3 = PoseGraphProblem(T_cw=jnp.asarray(T_init),
                                edge_T_ji=jnp.asarray(eT6),
                                edge_info=jnp.ones((E, 6)), **common)
    T_se3 = np.asarray(solve_pose_graph(prob_se3, iters=30))

    prob_sim3 = PoseGraphProblem(
        T_cw=sim3.from_se3(jnp.asarray(T_init)),
        edge_T_ji=jnp.asarray(eT7),
        edge_info=jnp.ones((E, 7)), **common)
    S_opt = solve_pose_graph_sim3(prob_sim3, iters=30)
    T_sim3 = np.asarray(sim3.to_se3(S_opt))
    scales = np.asarray(sim3.scale_of(S_opt))

    e_init, e_se3, e_sim3 = err(T_init), err(T_se3), err(T_sim3)
    # the Sim(3) graph must beat both the drifted integration and the
    # SE(3) correction decisively: the scale DoF absorbs what SE(3) can
    # only smear around the loop (SE(3)'s unaligned center RMSE is NOT
    # guaranteed to improve — it trades seam error for global shape)
    assert e_sim3 < 0.3 * e_init
    assert e_sim3 < 0.3 * e_se3
    # recovered scales: gauge-fixed start at 1, ramping toward the
    # accumulated drift at the loop end
    assert abs(scales[0] - 1.0) < 1e-3
    assert scales[-1] > 1.0 + 0.5 * (s_end - 1.0)
