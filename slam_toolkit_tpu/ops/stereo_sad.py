"""Left-anchored SAD stereo: per-keypoint correlation sweep, one kernel.

The reference finds stereo depth by fully extracting ORB on the right
image and descriptor-matching along row bands (ref src/frame.cpp:384-389,
src/matcher.cpp:54-132) — on this engine that meant a second pyramid +
FAST + BRIEF + a dense (K, K) Hamming match per keyframe, then a third
pass to refine disparity to subpixel. This module replaces all of it
with the classic block-matching formulation (what cv::StereoBM computes,
restricted to the keypoints we care about): for each LEFT keypoint,
sweep an 11x11 SAD window across the disparity range on the rectified
right row, take the subpixel parabola minimum, and gate on uniqueness.
Same product (subpixel right-x per left keypoint), ~5x less work, and
no dependence on right-image feature repeatability.

The Pallas kernel keeps both images VMEM-resident and emits the whole
(K, NS) SAD curve; argmin / parabola / uniqueness run vectorized in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

WIN = 5                  # half window -> 11x11
PAD = 1                  # parabola neighbors beyond the disparity range
_BK = 128


def _shifts(max_disp: int) -> int:
    return max_disp + 2 * PAD + 1      # s = 0 .. max_disp + 2


def _strip_w(max_disp: int) -> int:
    return (2 * WIN + 1) + max_disp + 2 * PAD


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sad_from_blocks(patch_l: jnp.ndarray, strip: jnp.ndarray,
                     ns: int) -> jnp.ndarray:
    """(K, 11, 11) x (K, 11, SW) -> (K, NS) SAD curves (shared math)."""
    acc = None
    side = 2 * WIN + 1
    for c in range(side):
        d = jnp.abs(strip[:, :, c:c + ns] - patch_l[:, :, c:c + 1])
        acc = d if acc is None else acc + d
    return jnp.sum(acc, axis=1)


def _curve_fallback(img_l, img_r, ys0, xl0, xs0, max_disp):
    from slam_toolkit_tpu.ops.patches import gather_blocks
    side = 2 * WIN + 1
    patch_l = gather_blocks(img_l, ys0, xl0, side, side)
    strip = gather_blocks(img_r, ys0, xs0, side, _strip_w(max_disp))
    return _sad_from_blocks(patch_l, strip, _shifts(max_disp))


@functools.partial(jax.jit, static_argnames=("max_disp", "interpret"))
def _curve_pallas(img_l, img_r, ys0, xl0, xs0, max_disp: int,
                  interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    side = 2 * WIN + 1
    sw = _strip_w(max_disp)
    ns = _shifts(max_disp)
    h, w = img_l.shape
    wh = _rup(side + 7, 8)
    ww_p = _rup(side + 127, 128)
    ww_s = _rup(sw + 127, 128)
    hp = max(h, ((h - side) // 8) * 8 + wh)
    wp = max(w, ((w - side) // 128) * 128 + ww_p,
             ((w - sw) // 128) * 128 + ww_s)
    if (hp, wp) != (h, w):
        img_l = jnp.pad(img_l, ((0, hp - h), (0, wp - w)))
        img_r = jnp.pad(img_r, ((0, hp - h), (0, wp - w)))

    k = ys0.shape[0]
    nb = -(-k // _BK)
    kp = nb * _BK
    if kp != k:
        ys0 = jnp.pad(ys0, (0, kp - k))
        xl0 = jnp.pad(xl0, (0, kp - k))
        xs0 = jnp.pad(xs0, (0, kp - k))

    def load(img_ref, y, x, ww, bw):
        ya = pl.multiple_of((y // 8) * 8, 8)
        xa = pl.multiple_of((x // 128) * 128, 128)
        win = img_ref[pl.ds(ya, wh), pl.ds(xa, ww)]
        # lane roll first, slice lanes, then the (cheaper) sublane roll
        # on the narrowed value — same trick as ops/patches.py
        win = pltpu.roll(win, (ww - (x - xa)) % ww, 1)
        win = win[:, :bw]
        win = pltpu.roll(win, (wh - (y - ya)) % wh, 0)
        return win[:side]

    def kernel(ys_ref, xl_ref, xs_ref, l_ref, r_ref, out_ref):
        i = pl.program_id(0)

        # NOTE: manually unrolling this loop 8x was measured ~2x SLOWER
        # on a v5e (644 -> 1220 us per 2048 keypoints in the bench
        # trace) — the widened body spills VMEM registers; keep the
        # plain per-keypoint loop.
        def body(j, c):
            kk = i * _BK + j
            y = ys_ref[kk]
            patch = load(l_ref, y, xl_ref[kk], ww_p, side)
            strip = load(r_ref, y, xs_ref[kk], ww_s, sw)
            acc = jnp.zeros((side, ns), jnp.float32)
            for cc in range(side):
                acc = acc + jnp.abs(strip[:, cc:cc + ns] - patch[:, cc:cc + 1])
            out_ref[pl.ds(j, 1), :] = jnp.sum(acc, axis=0, keepdims=True)
            return c

        jax.lax.fori_loop(0, _BK, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BK, ns), lambda i, *_: (i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kp, ns), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ys0, xl0, xs0, img_l, img_r)
    return out[:k]


def _probe():
    img = jnp.zeros((64, 512), jnp.float32)
    idx = jnp.full((8,), 16, jnp.int32)
    jax.block_until_ready(
        _curve_pallas(img, img, idx, idx, idx, 100))


def match(img_left: jnp.ndarray, img_right: jnp.ndarray,
          xy: jnp.ndarray, valid: jnp.ndarray, max_disp: int = 100,
          uniqueness: float = 0.15):
    """Subpixel right-x for each left keypoint on rectified stereo.

    Returns (x_right (K,) f32, ok (K,) bool). ok requires: a SAD minimum
    strictly inside the disparity range, a uniqueness margin vs the best
    SAD outside +/-1 shift (cv::StereoBM's uniquenessRatio), positive
    disparity, and an unclamped correlation window.
    """
    h, w = img_left.shape
    side = 2 * WIN + 1
    sw = _strip_w(max_disp)
    ns = _shifts(max_disp)

    xl = jnp.round(xy[:, 0]).astype(jnp.int32)
    yl = jnp.round(xy[:, 1]).astype(jnp.int32)
    ys0r = yl - WIN
    xl0r = xl - WIN
    xs0r = xl - (max_disp + WIN + PAD)
    ys0 = jnp.clip(ys0r, 0, h - side)
    xl0 = jnp.clip(xl0r, 0, w - side)
    xs0 = jnp.clip(xs0r, 0, w - sw)
    clamped = (ys0 != ys0r) | (xl0 != xl0r)

    from slam_toolkit_tpu.utils.kernel_probe import use_pallas
    if use_pallas("stereo_sad", _probe):
        sad = _curve_pallas(img_left, img_right, ys0, xl0, xs0, max_disp)
    else:
        sad = _curve_fallback(img_left, img_right, ys0, xl0, xs0, max_disp)

    col = jnp.arange(ns, dtype=jnp.float32)[None, :]
    inner = (col >= 1) & (col <= ns - 2)
    big = jnp.float32(1e12)
    sad_in = jnp.where(inner, sad, big)
    best = jnp.argmin(sad_in, axis=1)                       # (K,)
    bc = best.astype(jnp.float32)[:, None]

    def pick(off):
        return jnp.sum(jnp.where(col == bc + off, sad, 0.0), axis=1)

    c0, c1, c2 = pick(-1.0), pick(0.0), pick(1.0)
    denom = c0 + c2 - 2.0 * c1
    delta = jnp.where(denom > 1e-6, 0.5 * (c0 - c2) / jnp.maximum(denom, 1e-6),
                      0.0)
    delta = jnp.clip(delta, -1.0, 1.0)

    # uniqueness: best SAD outside the +/-1 neighborhood of the minimum
    away = jnp.abs(col - bc) > 1.0
    second = jnp.min(jnp.where(inner & away, sad, big), axis=1)
    uniq_ok = second > c1 * (1.0 + uniqueness) + 1e-3

    s_sub = bc[:, 0] + delta
    disp = (xl - xs0).astype(jnp.float32) - s_sub - WIN
    x_right = xl.astype(jnp.float32) - disp
    ok = (valid & uniq_ok & ~clamped & (disp > 0.25) &
          (disp <= float(max_disp)) & (best >= 1) & (best <= ns - 2))
    return jnp.where(ok, x_right, 0.0), ok
