"""ops/ba_kernel.py: the fused BA solver vs optim.local_ba.solve_ba."""

import numpy as np
import jax.numpy as jnp

from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.optim import local_ba
from slam_toolkit_tpu.ops import ba_kernel


def _problem(seed, W=4, P=128, noise=5e-4):
    rng = np.random.default_rng(seed)
    Xw = np.stack([rng.uniform(-10, 10, P), rng.uniform(-3, 3, P),
                   rng.uniform(5, 40, P)], -1).astype(np.float32)
    T_true, T_init = [], []
    for w in range(W):
        xi = np.zeros(6, np.float32)
        xi[2] = -0.5 * w                      # camera advancing in z
        T = np.asarray(se3.exp(jnp.asarray(xi)))
        T_true.append(T)
        dxi = rng.uniform(-0.01, 0.01, 6).astype(np.float32)
        if w == 0:
            dxi[:] = 0.0                      # gauge pose exact
        T_init.append(np.asarray(se3.exp(jnp.asarray(dxi))) @ T)
    baseline = 0.5
    z = np.zeros((W, P, 3), np.float32)
    obs = np.zeros((W, P), bool)
    for w, T in enumerate(T_true):
        Xc = (T[:3, :3] @ Xw.T).T + T[:3, 3]
        ok = Xc[:, 2] > 1.0
        u = Xc[:, 0] / Xc[:, 2]
        v = Xc[:, 1] / Xc[:, 2]
        ur = (Xc[:, 0] - baseline) / Xc[:, 2]
        z[w, :, 0] = u + rng.normal(0, noise, P)
        z[w, :, 1] = v + rng.normal(0, noise, P)
        z[w, :, 2] = ur + rng.normal(0, noise, P)
        obs[w] = ok & (rng.uniform(size=P) < 0.9)
    Xw_init = Xw + rng.normal(0, 0.05, Xw.shape).astype(np.float32)
    prob = local_ba.BAProblem(
        T_cw=jnp.asarray(np.stack(T_init)),
        pose_fixed=jnp.asarray([True] + [False] * (W - 1)),
        pose_valid=jnp.ones(W, bool),
        Xw=jnp.asarray(Xw_init),
        point_valid=jnp.ones(P, bool),
        z=jnp.asarray(z),
        inv_sigma=jnp.full((W, P), 1.0 / noise / 3.0, jnp.float32),
        obs_mask=jnp.asarray(obs),
        stereo_mask=jnp.asarray(obs),
        baseline=jnp.float32(baseline),
    )
    return prob, np.stack(T_true), Xw


def test_kernel_matches_solver_interpret():
    for seed in (0, 3):
        prob, T_true, Xw_true = _problem(seed)
        ref = local_ba.solve_ba(prob, iters=10)
        out = ba_kernel.solve_ba(prob, iters=10,
                                 interpret=True)
        # both solvers improve every free pose over its perturbed init
        # and agree with each other
        for w in range(1, 4):
            e_init = float(jnp.linalg.norm(prob.T_cw[w] - T_true[w]))
            e_ref = float(jnp.linalg.norm(ref.T_cw[w] - T_true[w]))
            e_out = float(jnp.linalg.norm(out.T_cw[w] - T_true[w]))
            assert e_ref < 0.7 * e_init
            assert e_out < 0.7 * e_init
        np.testing.assert_allclose(np.asarray(out.T_cw),
                                   np.asarray(ref.T_cw), atol=3e-3)
        # optimized structure agrees
        pv = np.array(prob.point_valid)
        np.testing.assert_allclose(np.asarray(out.Xw)[pv],
                                   np.asarray(ref.Xw)[pv], atol=2e-2)
        # residual classification agrees on active edges
        m = np.asarray(prob.obs_mask)
        r_ref = np.asarray(ref.edge_r2)[m]
        r_out = np.asarray(out.edge_r2)[m]
        np.testing.assert_allclose(r_out, r_ref, rtol=0.2, atol=0.5)


def test_kernel_masked_slots_interpret():
    """Invalid poses/points stay untouched."""
    prob, _, _ = _problem(1)
    pv = np.array(prob.point_valid)
    pv[60:] = False
    kv = np.array(prob.pose_valid)
    kv[3] = False
    prob = prob._replace(point_valid=jnp.asarray(pv),
                         pose_valid=jnp.asarray(kv))
    out = ba_kernel.solve_ba(prob, iters=5, interpret=True)
    np.testing.assert_allclose(np.asarray(out.Xw)[~pv],
                               np.asarray(prob.Xw)[~pv], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.T_cw)[3],
                               np.asarray(prob.T_cw)[3], atol=1e-6)
