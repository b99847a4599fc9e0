"""SE(3) pose-graph optimization for loop closing.

Replaces the reference's g2o pose graph (LoopCloser::CloseLoop,
ref src/loopcloser.cpp:104-220): odometry chain edges between
consecutive keyframes with anisotropic information (translation 100,
rotation 100 except a damped vertical-rotation term 0.01,
ref :113-116), loop edges for the new and all remembered closures
(:160-185), oldest keyframe fixed (:158), LM 20 iterations (:187-189).

Edge residual matches the reference's EdgeSE3 (src/optimizer.cpp:271-280):
r = log(T_j . T_i^-1 . C^-1) with measurement C = T_j_meas . T_i_meas^-1.

Fixed shapes: N pose slots, E edge slots, masked. The normal system is
(6N, 6N) dense — at N <= 512 keyframes that is a <= 3072^2 solve, small
change on the MXU and entirely fusable, so no sparse machinery needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.optim import robust


class PoseGraphProblem(NamedTuple):
    T_cw: jnp.ndarray       # (N, 4, 4) initial poses
    pose_valid: jnp.ndarray  # (N,) bool
    pose_fixed: jnp.ndarray  # (N,) bool
    edge_i: jnp.ndarray     # (E,) int32 source pose index
    edge_j: jnp.ndarray     # (E,) int32 target pose index
    edge_T_ji: jnp.ndarray  # (E, 4, 4) measured T_j . T_i^-1
    edge_info: jnp.ndarray  # (E, 6) diagonal information [rho, phi]
    edge_valid: jnp.ndarray  # (E,) bool


def _residuals(T, prob: PoseGraphProblem):
    Ti = T[prob.edge_i]
    Tj = T[prob.edge_j]
    return se3.log(Tj @ se3.inv(Ti) @ se3.inv(prob.edge_T_ji))   # (E, 6)


def solve_pose_graph(prob: PoseGraphProblem, iters: int = 20,
                     lambda0: float = 1e-4, lambda_up: float = 10.0,
                     lambda_down: float = 0.1,
                     huber_delta: float = 1e9) -> jnp.ndarray:
    """Returns optimized (N, 4, 4) poses."""
    N = prob.T_cw.shape[0]
    E = prob.edge_i.shape[0]
    ew = (prob.edge_valid & prob.pose_valid[prob.edge_i] &
          prob.pose_valid[prob.edge_j]).astype(jnp.float32)
    free = ((~prob.pose_fixed) & prob.pose_valid).astype(jnp.float32)

    def cost_at(T):
        r = _residuals(T, prob)
        rw = jnp.sqrt(jnp.sum(r * r * prob.edge_info, axis=-1) + 1e-12)
        return jnp.sum(robust.huber_cost(rw, huber_delta) * ew)

    def jacobians(T):
        """Numeric-free analytic Jacobians to first order.

        For r = log(Tj Ti^-1 C^-1) with left-mult updates Tj <- exp(dj) Tj,
        Ti <- exp(di) Ti, to first order (small residual):
          dr/ddj ~= J_l^-1(r) ~= I - 0.5 ad(r)   (approximated as I)
          dr/ddi ~= -Ad(Tj Ti^-1)
        The identity approximation for the left Jacobian is standard for
        pose-graph LM at small residuals (g2o does the same by default).
        """
        Tji = T[prob.edge_j] @ se3.inv(T[prob.edge_i])
        R = Tji[..., :3, :3]
        t = Tji[..., :3, 3]
        # adjoint of Tji: [[R, hat(t) R], [0, R]] in [rho, phi] layout
        Ad = jnp.zeros((E, 6, 6))
        Ad = Ad.at[:, :3, :3].set(R)
        Ad = Ad.at[:, :3, 3:].set(se3.hat(t) @ R)
        Ad = Ad.at[:, 3:, 3:].set(R)
        Jj = jnp.broadcast_to(jnp.eye(6), (E, 6, 6))
        Ji = -Ad
        return Ji, Jj

    def step(carry, _):
        T, lam, cost = carry
        r = _residuals(T, prob)
        rw = jnp.sqrt(jnp.sum(r * r * prob.edge_info, axis=-1) + 1e-12)
        w_rob = robust.huber_weight(rw, huber_delta) * ew
        Ji, Jj = jacobians(T)
        info_w = prob.edge_info * w_rob[:, None]               # (E, 6)

        # assemble H (N, N, 6, 6) and b (N, 6) by scatter-add over edges
        Hii = jnp.einsum('eai,ea,eaj->eij', Ji, info_w, Ji)
        Hjj = jnp.einsum('eai,ea,eaj->eij', Jj, info_w, Jj)
        Hij = jnp.einsum('eai,ea,eaj->eij', Ji, info_w, Jj)
        bi = -jnp.einsum('eai,ea,ea->ei', Ji, info_w, r)
        bj = -jnp.einsum('eai,ea,ea->ei', Jj, info_w, r)

        H = jnp.zeros((N, N, 6, 6))
        H = H.at[prob.edge_i, prob.edge_i].add(Hii)
        H = H.at[prob.edge_j, prob.edge_j].add(Hjj)
        H = H.at[prob.edge_i, prob.edge_j].add(Hij)
        H = H.at[prob.edge_j, prob.edge_i].add(
            jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((N, 6))
        b = b.at[prob.edge_i].add(bi)
        b = b.at[prob.edge_j].add(bj)

        # damping + gauge/invalid freezing
        diag = jnp.einsum('nnij->nij', H)
        H = H.at[jnp.arange(N), jnp.arange(N)].set(
            diag + lam * diag * jnp.eye(6) + 1e-6 * jnp.eye(6))
        H = H * free[:, None, None, None] * free[None, :, None, None]
        H = H.at[jnp.arange(N), jnp.arange(N)].add(
            (1.0 - free)[:, None, None] * jnp.eye(6))
        b = b * free[:, None]

        Hd = H.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
        dx = jnp.linalg.solve(Hd, b.reshape(-1)).reshape(N, 6)
        dx = dx * free[:, None]
        T_try = jnp.where((free > 0)[:, None, None],
                          se3.normalize(se3.exp(dx) @ T), T)
        cost_try = cost_at(T_try)
        accept = cost_try < cost
        return (jnp.where(accept, T_try, T),
                jnp.where(accept, lam * lambda_down, lam * lambda_up),
                jnp.where(accept, cost_try, cost)), cost

    init = (prob.T_cw, jnp.float32(lambda0), cost_at(prob.T_cw))
    (T_f, _, _), _ = jax.lax.scan(step, init, None, length=iters)
    return T_f
