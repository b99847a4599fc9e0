"""Reproduce the f8 BA NaN and localize it inside one LM step."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from slam_toolkit_tpu.config import SlamConfig
from slam_toolkit_tpu.data.synthetic import make_sequence
from slam_toolkit_tpu.geometry import se3
from slam_toolkit_tpu.geometry.camera import StereoCamera
from slam_toolkit_tpu.mapping.ba_adapter import build_problem
from slam_toolkit_tpu.optim.local_ba import _edge_terms, _cost
from slam_toolkit_tpu.pipeline.engine import SlamEngine

cfg = SlamConfig.tiny()
cam = StereoCamera.from_config(cfg.camera)
world, gt, frames = make_sequence(cfg, n_frames=10, seed=3, step=0.25)

eng = SlamEngine(cfg)
# run normally through f7, then stop BA before f8's
maps_before = None
orig_ba = eng._ba


def spy_ba(m):
    global maps_before
    maps_before = m
    return orig_ba(m)


eng._ba = spy_ba
for left, right in frames[:9]:
    eng.process(left, right)

m = maps_before
print("captured map before f8 BA; kf_valid:", int(m.kf_valid.sum()))

prob, window, pt_ids = jax.jit(lambda mm: build_problem(mm, cam, cfg))(m)
for name, v in prob._asdict().items():
    if hasattr(v, "dtype") and v.dtype in (jnp.float32,):
        print(f"  prob.{name}: nan={int(jnp.isnan(v).sum())}")

delta, trim = cfg.local_ba.huber_delta, cfg.local_ba.trim_sigma
w_mask = prob.obs_mask & prob.pose_valid[:, None] & prob.point_valid[None, :]
free_pose = (~prob.pose_fixed) & prob.pose_valid
T, X = prob.T_cw, prob.Xw
lam = jnp.float32(cfg.local_ba.lm_lambda0)

W = T.shape[0]


@jax.jit
def one_step(T, X, lam):
    r, w_rob, Jp, Jl, row_w = _edge_terms(T, X, prob.z, prob.inv_sigma,
                                          w_mask, prob.stereo_mask,
                                          prob.baseline, delta, trim)
    Hpp = jnp.einsum('wpra,wpr,wprb->wab', Jp, w_rob, Jp)
    Hll = jnp.einsum('wpra,wpr,wprb->pab', Jl, w_rob, Jl)
    Hpl = jnp.einsum('wpra,wpr,wprb->wpab', Jp, w_rob, Jl)
    bp = -jnp.einsum('wpra,wpr,wpr->wa', Jp, w_rob, r)
    bl = -jnp.einsum('wpra,wpr,wpr->pa', Jl, w_rob, r)
    eyew, eyep = jnp.eye(6), jnp.eye(3)
    Hpp_d = Hpp + lam * Hpp * eyew + 1e-8 * eyew
    Hll_d = Hll + lam * Hll * eyep + 1e-8 * eyep
    pt_active = prob.point_valid & (jnp.sum(w_mask, axis=0) > 0)
    Hll_d = jnp.where(pt_active[:, None, None], Hll_d, eyep)
    bl2 = jnp.where(pt_active[:, None], bl, 0.0)
    Hll_inv = jnp.linalg.inv(Hll_d)
    HplHinv = jnp.einsum('wpab,pbc->wpac', Hpl, Hll_inv)
    S_off = jnp.einsum('ipac,jpbc->ijab', HplHinv, Hpl)
    S = -S_off
    S = S.at[jnp.arange(W), jnp.arange(W)].add(Hpp_d)
    rhs = bp - jnp.einsum('wpab,pb->wa', HplHinv, bl2)
    fp = free_pose.astype(jnp.float32)
    S = S * fp[:, None, None, None] * fp[None, :, None, None]
    S = S.at[jnp.arange(W), jnp.arange(W)].add((1.0 - fp)[:, None, None] * eyew)
    rhs = rhs * fp[:, None]
    Sd = S.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    dp = jnp.linalg.solve(Sd, rhs.reshape(6 * W)).reshape(W, 6)
    dp = dp * fp[:, None]
    Hlp_dp = jnp.einsum('wpab,wa->pb', Hpl, dp)
    dl = jnp.einsum('pab,pb->pa', Hll_inv, bl2 - Hlp_dp)
    dl = jnp.where(pt_active[:, None], dl, 0.0)
    T_try = jnp.where(free_pose[:, None, None],
                      se3.normalize(se3.exp(dp) @ T), T)
    X_try = prob.point_valid[:, None] * (X + dl) + \
        (~prob.point_valid)[:, None] * X
    c_try = _cost(None if False else (
        _edge_terms(T_try, X_try, prob.z, prob.inv_sigma, w_mask,
                    prob.stereo_mask, prob.baseline, delta, trim)[0]),
        _edge_terms(T_try, X_try, prob.z, prob.inv_sigma, w_mask,
                    prob.stereo_mask, prob.baseline, delta, trim)[4],
        delta, trim)
    c_cur = _cost(r, row_w, delta, trim)
    diag = dict(r=r, w_rob=w_rob, Hll_inv=Hll_inv, S=Sd, dp=dp, dl=dl,
                T_try=T_try, X_try=X_try, c_try=c_try, c_cur=c_cur,
                detS=jnp.linalg.det(Sd))
    return diag


for it in range(10):
    d = one_step(T, X, lam)
    msg = " ".join(f"{k}:nan={int(jnp.isnan(v).sum())}" for k, v in d.items()
                   if hasattr(v, 'dtype'))
    print(f"iter{it}: cost {float(d['c_cur']):.1f} -> {float(d['c_try']):.1f} "
          f"detS={float(d['detS']):.3e}")
    print("   ", msg)
    accept = float(d['c_try']) < float(d['c_cur'])
    if accept:
        T, X = d['T_try'], d['X_try']
        lam = lam * 0.1
    else:
        lam = lam * 10.0

print("=== replay through engine's jitted _ba ===")
m2 = orig_ba(maps_before)
for name, arr in m2._asdict().items():
    if arr.dtype == jnp.float32:
        n = int(jnp.isnan(arr).sum())
        if n:
            print(f"  after _ba: {name} nan={n}")
print("done; kf_T_cw nan:", int(jnp.isnan(m2.kf_T_cw).sum()))
wslots = np.asarray(window)
print("window slots:", wslots)
print("nan per kf slot:", [int(jnp.isnan(m2.kf_T_cw[i]).sum()) for i in range(8)])
