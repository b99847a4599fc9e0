"""Whole-solver Pallas kernel for local bundle adjustment.

optim/local_ba.py is the correct masked Schur-complement LM, but as XLA
ops each 10-iteration solve costs ~1.9 ms on a v5e — dozens of small
einsums per iteration with bf16 layout copies between them. This kernel
runs the ENTIRE solve on-chip with a layout chosen for the VPU:

- every per-(pose, point) quantity (residual rows, Jacobian entries,
  robust weights, Hpl blocks) is ONE (W, P) register tile — pose index
  on sublanes, point index on lanes;
- per-pose reductions are lane reductions to (W, 1); per-point
  reductions are sublane reductions to (1, P); the 3x3 point blocks
  invert in closed form on (1, P) rows;
- the reduced-camera product S_off = (Hpl Hll^-1) Hpl^T is the one real
  contraction, assembled into (6W, 3P) matrices by concatenation and
  fed to the MXU;
- the (6W, 6W) system is Jacobi-scaled and solved by unrolled
  Gauss-Jordan; SE3 exponentials for all W poses vectorize across
  sublanes as (W, 1) column arithmetic.

Matches optim.local_ba.solve_ba semantics (damping, trim, gauge
handling, trial-cost accept/reject) up to f32 reduction order. The
row-index convention inside the reduced system is a-major (dof * W + w),
purely internal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.optim.local_ba import BAProblem, BAResult


def _block_diag_masks(W: int) -> np.ndarray:
    """(36, 6W, 6W) masks: entry (a*6+b) is 1 at ((a, w), (b, w))."""
    out = np.zeros((36, 6 * W, 6 * W), np.float32)
    for a in range(6):
        for b in range(6):
            for w in range(W):
                out[a * 6 + b, a * W + w, b * W + w] = 1.0
    return out


def _inv3_rows(h00, h01, h02, h11, h12, h22):
    """Closed-form symmetric 3x3 inverse on (1, P) row arrays."""
    m00 = h11 * h22 - h12 * h12
    m01 = h02 * h12 - h01 * h22
    m02 = h01 * h12 - h02 * h11
    m11 = h00 * h22 - h02 * h02
    m12 = h01 * h02 - h00 * h12
    m22 = h00 * h11 - h01 * h01
    det = h00 * m00 + h01 * m01 + h02 * m02
    det = jnp.where(jnp.abs(det) < 1e-12,
                    jnp.where(det < 0, -1e-12, 1e-12), det)
    i = 1.0 / det
    return m00 * i, m01 * i, m02 * i, m11 * i, m12 * i, m22 * i


def _gauss_jordan(M, n):
    """Unrolled no-pivot elimination on the (n, n+1) augmented system.

    Pivots are clamped away from zero: the system is Jacobi-scaled and
    LM-damped by the caller so a vanishing pivot means a degenerate
    (gauge-fixed / padded) row, where any finite step is fine — the
    caller's finite/accept test rejects bad steps, but a 0/0 NaN here
    would otherwise poison the whole augmented matrix.
    """
    for k in range(n):
        piv = M[k, k]
        piv = jnp.where(jnp.abs(piv) < 1e-12,
                        jnp.where(piv < 0, -1e-12, 1e-12), piv)
        row = M[k:k + 1, :] / piv
        M = M - M[:, k:k + 1] * row
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == k) \
            .astype(jnp.float32)
        M = M + onehot * row
    return M


@functools.partial(jax.jit, static_argnames=(
    "iters", "huber_delta", "lambda0", "lambda_up", "lambda_down",
    "trim_sigma", "interpret"))
def _ba_pallas(Tw, free, Xr, z3, inv_sigma, obs_w, stereo_w, pt_valid,
               pt_free, baseline, bd_masks, iters, huber_delta, lambda0,
               lambda_up, lambda_down, trim_sigma, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = Tw.shape[0]
    P = Xr.shape[1]
    n6 = 6 * W
    delta = float(huber_delta)
    trim = float(trim_sigma)

    def kernel(T_ref, fp_ref, X_ref, z_ref, is_ref, ow_ref, sw_ref,
               pv_ref, pf_ref, bl_ref, bd_ref, oT_ref, oX_ref, oc_ref,
               or2_ref):
        fp = fp_ref[:]                                 # (W, 1) free pose
        isg = is_ref[:]                                # (W, P)
        ow = ow_ref[:]                                 # (W, P) obs mask
        sw = sw_ref[:]                                 # (W, P) stereo mask
        pv = pv_ref[:]                                 # (1, P) point valid
        pfree = pf_ref[:]                              # (1, P) point free
        bl = bl_ref[0, 0]                              # () baseline
        z0, z1, z2 = z_ref[0], z_ref[1], z_ref[2]      # (W, P)
        eyeW = (jax.lax.broadcasted_iota(jnp.int32, (n6, n6), 0) ==
                jax.lax.broadcasted_iota(jnp.int32, (n6, n6), 1)) \
            .astype(jnp.float32)

        def col(T, i, j):
            return T[:, 4 * i + j:4 * i + j + 1]       # (W, 1)

        def geometry(T, X0, X1, X2):
            xc = col(T, 0, 0) * X0 + col(T, 0, 1) * X1 + \
                col(T, 0, 2) * X2 + col(T, 0, 3)
            yc = col(T, 1, 0) * X0 + col(T, 1, 1) * X1 + \
                col(T, 1, 2) * X2 + col(T, 1, 3)
            zc = col(T, 2, 0) * X0 + col(T, 2, 1) * X1 + \
                col(T, 2, 2) * X2 + col(T, 2, 3)
            good = (zc > 1e-3).astype(jnp.float32)
            zs = jnp.where(zc > 1e-3, zc, 1.0)
            iz = 1.0 / zs
            r0 = (xc * iz - z0) * isg
            r1 = (yc * iz - z1) * isg
            r2 = ((xc - bl) * iz - z2) * isg
            w0 = ow * good
            w2 = ow * sw * good
            return xc, yc, zc, iz, r0, r1, r2, w0, w2

        # an edge whose point lands behind its camera must cost MORE
        # than any plausible reprojection error, not drop out of the
        # cost — else a big finite step that throws everything behind
        # collapses the cost to 0 and is accepted (same guard as
        # optim/local_ba.py cost_at)
        behind_pen = delta * (1e3 - 0.5 * delta)
        ow_sum = jnp.sum(ow)

        def cost_of(r0, r1, r2, w0, w2):
            rn = jnp.sqrt(r0 * r0 * w0 + r1 * r1 * w0 + r2 * r2 * w2
                          + 1e-12)
            active = (w0 > 0).astype(jnp.float32)
            c = jnp.where(rn <= trim,
                          jnp.where(rn <= delta, 0.5 * rn * rn,
                                    delta * (rn - 0.5 * delta)),
                          jnp.full_like(rn,
                                        delta * (trim - 0.5 * delta)
                                        if trim > delta else
                                        0.5 * trim * trim))
            # w0 = ow * good, so ow_sum - sum(w0) counts behind points
            return jnp.sum(c * active) + \
                behind_pen * (ow_sum - jnp.sum(w0))

        def concat6(blocks):
            return jnp.concatenate(blocks, axis=0)     # a-major (6W, P)

        def step(it, carry):
            T, X0, X1, X2, lam, cost = carry
            xc, yc, zc, iz, r0, r1, r2, w0, w2 = geometry(T, X0, X1, X2)
            rn = jnp.sqrt(r0 * r0 * w0 + r1 * r1 * w0 + r2 * r2 * w2
                          + 1e-12)
            keep = (rn <= trim).astype(jnp.float32)
            hub = jnp.minimum(1.0, delta / jnp.maximum(rn, 1e-12)) * keep
            v0 = w0 * hub                              # row weights
            v2 = w2 * hub
            iz2 = iz * iz
            xb = xc - bl
            # dpi rows scaled by inv_sigma: (W, P) each
            d00, d02 = iz * isg, -xc * iz2 * isg
            d11, d12 = iz * isg, -yc * iz2 * isg
            d20, d22 = iz * isg, -xb * iz2 * isg
            # Jp = [dpi | -dpi hat(Xc)] — per residual row, 6 entries
            # hat(Xc) = [[0,-z,y],[z,0,-x],[-y,x,0]]
            jp = [[None] * 6 for _ in range(3)]
            for r, (da, db) in enumerate(((d00, d02), (d11, d12),
                                          (d20, d22))):
                if r == 1:
                    c0, c1, c2 = jnp.zeros_like(da), da, db
                else:
                    c0, c1, c2 = da, jnp.zeros_like(da), db
                jp[r][0], jp[r][1], jp[r][2] = c0, c1, c2
                # -(c0,c1,c2) @ hat(Xc)
                jp[r][3] = -(c1 * zc - c2 * yc)
                jp[r][4] = -(-c0 * zc + c2 * xc)
                jp[r][5] = -(c0 * yc - c1 * xc)
            # Jl = dpi @ R  (R columns are (W,1) broadcasts)
            jl = [[None] * 3 for _ in range(3)]
            for r in range(3):
                c0, c1, c2 = jp[r][0], jp[r][1], jp[r][2]
                for j in range(3):
                    jl[r][j] = (c0 * col(T, 0, j) + c1 * col(T, 1, j) +
                                c2 * col(T, 2, j))

            def edot(Ar, Br):
                return (v0 * (Ar[0] * Br[0] + Ar[1] * Br[1]) +
                        v2 * Ar[2] * Br[2])

            # point-block weights: fixed points contribute only
            # constant-point pose edges (see optim/local_ba.py)
            v0l = v0 * pfree
            v2l = v2 * pfree

            def edotl(Ar, Br):
                return (v0l * (Ar[0] * Br[0] + Ar[1] * Br[1]) +
                        v2l * Ar[2] * Br[2])

            jp_c = [[jp[r][a] for r in range(3)] for a in range(6)]
            jl_c = [[jl[r][a] for r in range(3)] for a in range(3)]
            rr = [r0, r1, r2]

            # per-pose blocks: lane reductions -> (W, 1)
            Hpp = [[jnp.sum(edot(jp_c[a], jp_c[b]), axis=1, keepdims=True)
                    for b in range(6)] for a in range(6)]
            bp = [jnp.sum(-edot(jp_c[a], rr), axis=1, keepdims=True)
                  for a in range(6)]
            # per-point blocks: sublane reductions -> (1, P)
            Hll = {}
            for a in range(3):
                for b in range(a, 3):
                    Hll[(a, b)] = jnp.sum(edotl(jl_c[a], jl_c[b]), axis=0,
                                          keepdims=True)
            blv = [jnp.sum(-edotl(jl_c[a], rr), axis=0, keepdims=True)
                   for a in range(3)]
            # Hpl blocks stay full (W, P)
            Hpl = [[edotl(jp_c[a], jl_c[b]) for b in range(3)]
                   for a in range(6)]

            # damping + guards (mirrors solve_ba)
            pt_act = pv * pfree * ((jnp.sum(ow, axis=0, keepdims=True) > 0)
                                   .astype(jnp.float32))
            h00 = Hll[(0, 0)] * (1.0 + lam) + 1e-4
            h11 = Hll[(1, 1)] * (1.0 + lam) + 1e-4
            h22 = Hll[(2, 2)] * (1.0 + lam) + 1e-4
            h00 = jnp.where(pt_act > 0, h00, 1.0)
            h11 = jnp.where(pt_act > 0, h11, 1.0)
            h22 = jnp.where(pt_act > 0, h22, 1.0)
            h01 = jnp.where(pt_act > 0, Hll[(0, 1)], 0.0)
            h02 = jnp.where(pt_act > 0, Hll[(0, 2)], 0.0)
            h12 = jnp.where(pt_act > 0, Hll[(1, 2)], 0.0)
            blv = [jnp.where(pt_act > 0, v, 0.0) for v in blv]
            i00, i01, i02, i11, i12, i22 = _inv3_rows(h00, h01, h02,
                                                      h11, h12, h22)
            Hinv = [[i00, i01, i02], [i01, i11, i12], [i02, i12, i22]]

            # HplHinv[a][c] = sum_b Hpl[a][b] Hinv[b][c]
            HplHi = [[Hpl[a][0] * Hinv[0][c] + Hpl[a][1] * Hinv[1][c] +
                      Hpl[a][2] * Hinv[2][c] for c in range(3)]
                     for a in range(6)]

            # S_off via MXU: A, B (6W, 3P) a-major rows, c-major lanes
            A = jnp.concatenate(
                [concat6([HplHi[a][c] for a in range(6)])
                 for c in range(3)], axis=1)
            B = jnp.concatenate(
                [concat6([Hpl[a][c] for a in range(6)])
                 for c in range(3)], axis=1)
            S_off = jax.lax.dot_general(
                A, B, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # (6W, 6W)

            fp6 = concat6([fp] * 6)                    # (6W, 1)
            S = -S_off
            for a in range(6):
                for b in range(6):
                    hv = Hpp[a][b]
                    if a == b:
                        hv = hv * (1.0 + lam) + 1e-6
                    S = S + bd_ref[a * 6 + b] * concat6([hv] * 6)
            S = S * fp6 * jnp.transpose(fp6)
            S = S + eyeW * (1.0 - fp6)
            # rhs = bp - HplHinv bl
            rhs6 = concat6(
                [bp[a] - jnp.sum(HplHi[a][0] * blv[0] + HplHi[a][1] *
                                 blv[1] + HplHi[a][2] * blv[2],
                                 axis=1, keepdims=True)
                 for a in range(6)]) * fp6             # (6W, 1)

            dsc = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(S * eyeW, axis=1, keepdims=True), 1e-30))
            M = jnp.concatenate([S * dsc * jnp.transpose(dsc), rhs6 * dsc],
                                axis=1)
            M = _gauss_jordan(M, n6)
            dp6 = M[:, n6:n6 + 1] * dsc * fp6          # (6W, 1)
            dpa = [dp6[a * W:(a + 1) * W] for a in range(6)]  # (W,1) each

            # back-substitute points
            Hlp_dp = [jnp.sum(sum(Hpl[a][b] * dpa[a] for a in range(6)),
                              axis=0, keepdims=True) for b in range(3)]
            tb = [blv[b] - Hlp_dp[b] for b in range(3)]
            dl = [Hinv[b][0] * tb[0] + Hinv[b][1] * tb[1] +
                  Hinv[b][2] * tb[2] for b in range(3)]
            dl = [jnp.where(pt_act > 0, d, 0.0) for d in dl]

            # SE3 exp across sublanes: xi_w = (rho, phi) per pose
            rx, ry, rz = dpa[0], dpa[1], dpa[2]
            px, py, pz = dpa[3], dpa[4], dpa[5]
            th2 = px * px + py * py + pz * pz
            th = jnp.sqrt(jnp.maximum(th2, 1e-24))
            small = th2 < 1e-8
            t2s = jnp.where(small, 1.0, th2)
            ca = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
            cb = jnp.where(small, 0.5 - th2 / 24.0,
                           (1.0 - jnp.cos(th)) / t2s)
            cc = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                           (1.0 - ca) / t2s)
            # R = I + ca W + cb W^2, W = hat(phi); entries as (W,1)
            w2_00, w2_11, w2_22 = -(py * py + pz * pz), \
                -(px * px + pz * pz), -(px * px + py * py)
            w2_01, w2_02, w2_12 = px * py, px * pz, py * pz
            E = {}
            E[(0, 0)] = 1.0 + cb * w2_00
            E[(1, 1)] = 1.0 + cb * w2_11
            E[(2, 2)] = 1.0 + cb * w2_22
            E[(0, 1)] = -ca * pz + cb * w2_01
            E[(1, 0)] = ca * pz + cb * w2_01
            E[(0, 2)] = ca * py + cb * w2_02
            E[(2, 0)] = -ca * py + cb * w2_02
            E[(1, 2)] = -ca * px + cb * w2_12
            E[(2, 1)] = ca * px + cb * w2_12
            # V rho
            V = {}
            V[(0, 0)] = 1.0 + cc * w2_00
            V[(1, 1)] = 1.0 + cc * w2_11
            V[(2, 2)] = 1.0 + cc * w2_22
            V[(0, 1)] = -cb * pz + cc * w2_01
            V[(1, 0)] = cb * pz + cc * w2_01
            V[(0, 2)] = cb * py + cc * w2_02
            V[(2, 0)] = -cb * py + cc * w2_02
            V[(1, 2)] = -cb * px + cc * w2_12
            V[(2, 1)] = cb * px + cc * w2_12
            rho = [rx, ry, rz]
            et = [sum(V[(i, k)] * rho[k] for k in range(3))
                  for i in range(3)]
            # T_try = exp(xi) @ T, columns (W,1)
            Tn = []
            for i in range(3):
                for j in range(4):
                    v = sum(E[(i, k)] * col(T, k, j) for k in range(3))
                    if j == 3:
                        v = v + et[i]
                    Tn.append(v)
            # orthonormalize first two columns, cross for third
            c0 = [Tn[0], Tn[4], Tn[8]]
            c1 = [Tn[1], Tn[5], Tn[9]]
            n0 = jax.lax.rsqrt(sum(c * c for c in c0) + 1e-24)
            c0 = [c * n0 for c in c0]
            dot01 = sum(a * b for a, b in zip(c0, c1))
            c1 = [b - dot01 * a for a, b in zip(c0, c1)]
            n1 = jax.lax.rsqrt(sum(c * c for c in c1) + 1e-24)
            c1 = [c * n1 for c in c1]
            c2 = [c0[1] * c1[2] - c0[2] * c1[1],
                  c0[2] * c1[0] - c0[0] * c1[2],
                  c0[0] * c1[1] - c0[1] * c1[0]]
            cols16 = []
            for i in range(3):
                cols16 += [c0[i], c1[i], c2[i], Tn[4 * i + 3]]
            zero = fp * 0.0
            cols16 += [zero, zero, zero, zero + 1.0]
            # assemble (W, 16) via one-hot broadcast sums: Mosaic (current
            # libtpu) rejects tpu.concatenate of (W, 1) vectors whose
            # sublane offsets differ ("offset mismatch on non-concat
            # dimension"); 16 masked adds lower cleanly on the VPU
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
            T_try_all = sum(
                cols16[j] * (lane == j).astype(jnp.float32)
                for j in range(16))                       # (W, 16)
            T_try = jnp.where(fp > 0, T_try_all, T)

            X0t = X0 + dl[0] * pv
            X1t = X1 + dl[1] * pv
            X2t = X2 + dl[2] * pv

            _, _, _, _, q0, q1, q2, u0, u2 = geometry(T_try, X0t, X1t, X2t)
            cost_try = cost_of(q0, q1, q2, u0, u2)
            finite = jnp.all(jnp.isfinite(dp6)) & \
                jnp.all(jnp.isfinite(dl[0])) & \
                jnp.all(jnp.isfinite(dl[1])) & jnp.all(jnp.isfinite(dl[2]))
            accept = (cost_try < cost) & finite
            af = accept.astype(jnp.float32)
            T_n = af * T_try + (1.0 - af) * T
            X0n = af * X0t + (1.0 - af) * X0
            X1n = af * X1t + (1.0 - af) * X1
            X2n = af * X2t + (1.0 - af) * X2
            lam_n = jnp.where(accept,
                              jnp.maximum(lam * float(lambda_down), 1e-7),
                              lam * float(lambda_up))
            cost_n = jnp.where(accept, cost_try, cost)
            return T_n, X0n, X1n, X2n, lam_n, cost_n

        T0 = T_ref[:]
        X0, X1, X2 = X_ref[0:1, :], X_ref[1:2, :], X_ref[2:3, :]
        _, _, _, _, r0, r1, r2, w0, w2 = geometry(T0, X0, X1, X2)
        cost0 = cost_of(r0, r1, r2, w0, w2)
        T_f, X0f, X1f, X2f, _, cost_f = jax.lax.fori_loop(
            0, int(iters), step,
            (T0, X0, X1, X2, jnp.float32(lambda0), cost0))

        _, _, _, _, f0, f1, f2, u0, u2 = geometry(T_f, X0f, X1f, X2f)
        or2_ref[:] = f0 * f0 * u0 + f1 * f1 * u0 + f2 * f2 * u2
        oT_ref[:] = T_f
        oX_ref[:] = jnp.concatenate([X0f, X1f, X2f], axis=0)
        oc_ref[:] = cost_f * jnp.ones((1, 1), jnp.float32)

    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((W, 16), jnp.float32),
                   jax.ShapeDtypeStruct((3, P), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((W, P), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
        interpret=interpret,
    )(Tw, free, Xr, z3, inv_sigma, obs_w, stereo_w, pt_valid, pt_free,
      baseline, bd_masks)
    return out


def _probe():
    W, P = 4, 128
    p = BAProblem(
        T_cw=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (W, 4, 4)),
        pose_fixed=jnp.zeros((W,), bool).at[0].set(True),
        pose_valid=jnp.ones((W,), bool),
        Xw=jnp.ones((P, 3), jnp.float32) * jnp.asarray([0.1, 0.1, 5.0]),
        point_valid=jnp.ones((P,), bool),
        z=jnp.zeros((W, P, 3), jnp.float32),
        inv_sigma=jnp.ones((W, P), jnp.float32),
        obs_mask=jnp.ones((W, P), bool),
        stereo_mask=jnp.ones((W, P), bool),
        baseline=jnp.float32(0.5))
    jax.block_until_ready(solve_ba(p, iters=1).T_cw)


def solve_ba(p: BAProblem, iters: int = 10, huber_delta: float = 2.4477468,
             lambda0: float = 1e-4, lambda_up: float = 10.0,
             lambda_down: float = 0.1, trim_sigma: float = 1e9,
             interpret: bool = False) -> BAResult:
    """Drop-in TPU replacement for optim.local_ba.solve_ba."""
    W = p.T_cw.shape[0]
    P = p.Xw.shape[0]
    w_mask = p.obs_mask & p.pose_valid[:, None] & p.point_valid[None, :]
    free = ((~p.pose_fixed) & p.pose_valid).astype(jnp.float32)[:, None]
    Tw = p.T_cw.reshape(W, 16)
    Xr = p.Xw.T                                        # (3, P)
    z3 = jnp.transpose(p.z, (2, 0, 1))                 # (3, W, P)
    free_pt = p.point_valid if p.point_free is None \
        else (p.point_valid & p.point_free)
    T_f, X_f, cost, r2 = _ba_pallas(
        Tw, free, Xr, z3, p.inv_sigma,
        w_mask.astype(jnp.float32),
        (p.stereo_mask & w_mask).astype(jnp.float32),
        p.point_valid.astype(jnp.float32)[None, :],
        free_pt.astype(jnp.float32)[None, :],
        jnp.asarray(p.baseline, jnp.float32).reshape(1, 1),
        jnp.asarray(_block_diag_masks(W)),
        int(iters), float(huber_delta), float(lambda0), float(lambda_up),
        float(lambda_down), float(trim_sigma), interpret)
    return BAResult(T_cw=T_f.reshape(W, 4, 4), Xw=X_f.T, cost=cost[0, 0],
                    edge_r2=r2)
