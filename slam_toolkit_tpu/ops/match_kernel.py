"""Fused projection matching: Hamming + radius gates + top-2, one kernel.

The XLA formulation of projection matching (frontend/matching.py)
materializes the masked (L, K) distance matrix TWICE (one per search
radius of the reference's doubled-radius retry, ref
src/posetracker.cpp:187-190) and then runs argmin / scatter / second-min
passes over it — at L=4096, K=2048 that is ~6 HBM sweeps of 32 MB per
frame, the second-largest item in traces after patch gathers.

This kernel streams keypoint tiles through VMEM flash-attention style:
descriptors are unpacked to +/-1 on the fly, the Hamming tile comes off
the MXU as a bf16 matmul (exact: +/-1 products, f32 accumulation — same
identity as ops/hamming.py), the pixel-radius gates are computed in
registers, and a running (best, second, argbest) is merged per row for
BOTH radii in one pass. Nothing of size L x K ever touches HBM.

Outputs match hamming.ratio_test_match semantics exactly: `best` is the
first column attaining the row minimum; ties across tiles keep the
earlier tile (strict-< merge); masked-out rows report BIG.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1e9


def _unpack_pm1_tile(desc_u32, n_bits=256):
    """(T, 8) u32 -> (T, 256) bf16 in {-1, +1} with on-the-fly shifts."""
    from jax.experimental.pallas import tpu as pltpu
    # pltpu.repeat TILES the array: rep[:, c] = desc[:, c % 8], so bit
    # index c // 8 — a fixed permutation of the packed bit order, which
    # preserves Hamming distances as long as both sides use it
    rep = pltpu.repeat(desc_u32, 32, axis=1)            # (T, 256) u32
    sh = jax.lax.broadcasted_iota(jnp.uint32, rep.shape, 1) // 8
    bits = ((rep >> sh) & 1).astype(jnp.int32)    # u32->f32 unsupported
    return (2.0 * bits.astype(jnp.float32) - 1.0).astype(jnp.bfloat16)


def _pick_tile(n: int) -> int:
    for t in (512, 256, 128):
        if n % t == 0:
            return t
    return n


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def _topk2_pallas(a_desc, b_desc, a_uv, b_xy, radius: float,
                  interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, n = a_desc.shape[0], b_desc.shape[0]
    bm, bn = _pick_tile(m), _pick_tile(n)
    nt = n // bn
    r1sq = radius * radius
    r2sq = 4.0 * radius * radius

    def kernel(a_desc_ref, a_uv_ref, b_desc_ref, b_xy_ref, out_ref):
        A = _unpack_pm1_tile(a_desc_ref[:])             # (bm, 256)
        au = a_uv_ref[:, 0:1]                           # (bm, 1)
        av = a_uv_ref[:, 1:2]

        # values are PACKED: ham * 4096 + global column (<= ~1.05e6,
        # exact in f32). One min-reduction yields best AND argbest with
        # the same first-min tie-break as jnp.argmin; tile merges and the
        # running second-best stay plain mins in packed space.
        def tile(t, carry):
            p1, q1, p2, q2 = carry                      # best/second packed
            off = (t * bn).astype(jnp.int32)
            B = _unpack_pm1_tile(b_desc_ref[pl.ds(off, bn), :])  # (bn, 256)
            # precision pinned: the +/-1 products are exact in bf16; a
            # global jax_default_matmul_precision="highest" would stamp
            # contract_precision<fp32> on bf16 operands, which Mosaic
            # rejects at the 512-row tile ("Bad lhs type")
            dot = jax.lax.dot_general(
                A, B, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)      # (bm, bn)
            bx = b_xy_ref[pl.ds(off, bn), 0]
            by = b_xy_ref[pl.ds(off, bn), 1]
            du = au - bx[None, :]
            dv = av - by[None, :]
            d2 = du * du + dv * dv
            col = jax.lax.broadcasted_iota(
                jnp.int32, dot.shape, 1).astype(jnp.float32)
            # ham * 4096 + col = (256 - dot) * 2048 + (col + off)
            packed = (256.0 - dot) * 2048.0 + (col + off.astype(jnp.float32))

            def top2(val, pb, qb):
                tmin = jnp.min(val, axis=1, keepdims=True)
                # second-best of this tile: mask the argbest column only
                sec_v = jnp.where(val <= tmin, BIG, val)
                tsec = jnp.min(sec_v, axis=1, keepdims=True)
                qn = jnp.minimum(jnp.minimum(qb, tsec),
                                 jnp.maximum(pb, tmin))
                return jnp.minimum(pb, tmin), qn

            v2 = jnp.where(d2 <= r2sq, packed, BIG)
            p2, q2 = top2(v2, p2, q2)
            v1 = jnp.where(d2 <= r1sq, v2, BIG)
            p1, q1 = top2(v1, p1, q1)
            return p1, q1, p2, q2

        big = jnp.full((bm, 1), BIG, jnp.float32)
        p1, q1, p2, q2 = jax.lax.fori_loop(
            0, nt, tile, (big, big, big, big))

        def unpack(p):
            d = jnp.floor(p * (1.0 / 4096.0))
            # packed values cap at ~1.05e6; anything larger is the BIG
            # sentinel (empty gate) and must stay BIG after unpacking
            return jnp.where(p > 2e6, BIG, d), p - d * 4096.0
        d1, i1 = unpack(p1)
        s1, _ = unpack(q1)
        d2o, i2 = unpack(p2)
        s2, _ = unpack(q2)
        out_ref[:] = jnp.concatenate(
            [d1, s1, i1, d2o, s2, i2,
             jnp.zeros((bm, 2), jnp.float32)], axis=1)

    grid_spec = pl.GridSpec(
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(a_desc, a_uv, b_desc, b_xy)
    return out


def _topk2_xla(a_desc, b_desc, a_uv, b_xy, radius: float):
    """Reference semantics for off-TPU backends (and tests)."""
    from slam_toolkit_tpu.ops import hamming
    dist = hamming.distance_matrix(a_desc, b_desc).astype(jnp.float32)
    d2 = jnp.sum((a_uv[:, None, :] - b_xy[None, :, :]) ** 2, axis=-1)
    rows = jnp.arange(a_desc.shape[0])
    cols = []
    for rsq in (radius * radius, 4.0 * radius * radius):
        md = jnp.where(d2 <= rsq, dist, BIG)
        idx = jnp.argmin(md, axis=1)
        best = md[rows, idx]
        sec = jnp.min(md.at[rows, idx].set(BIG), axis=1)
        cols += [best, sec, idx.astype(jnp.float32)]
    zero = jnp.zeros_like(cols[0])
    return jnp.stack(cols + [zero, zero], axis=1)


def _probe():
    # probe at the PRODUCTION tile (bm=512): round 2 found a libtpu that
    # accepted the 128-row tile but rejected the 512-row one, so a tiny
    # probe would green-light a kernel that then crashes the engine
    import numpy as np
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2 ** 32, (512, 8)).astype(np.uint32))
    uv = jnp.zeros((512, 2), jnp.float32)
    jax.block_until_ready(_topk2_pallas(a, a, uv, uv, 50.0))


def topk2_match(a_desc: jnp.ndarray, b_desc: jnp.ndarray,
                a_uv: jnp.ndarray, b_xy: jnp.ndarray, radius: float):
    """Top-2 Hamming matches under two pixel-radius gates (r, 2r).

    a_desc (M, 8) u32 / a_uv (M, 2): query landmarks (fold validity in by
    pushing invalid uv out of the image, e.g. +1e9). b_desc (N, 8) u32 /
    b_xy (N, 2): target keypoints, same convention. Returns (M, 8) f32:
    [best_r, second_r, argbest_r, best_2r, second_2r, argbest_2r, 0, 0].
    """
    from slam_toolkit_tpu.utils.kernel_probe import use_pallas
    if use_pallas("match_topk2", _probe):
        return _topk2_pallas(a_desc, b_desc, a_uv, b_xy, float(radius))
    return _topk2_xla(a_desc, b_desc, a_uv, b_xy, float(radius))
