"""Fused FAST+NMS Pallas kernel: the whole corner-detection chain of one
pyramid level in a single VMEM-resident pass.

The XLA formulation (ops/fast.py, replacing the reference's per-cell
OpenCV FAST, ref src/orb_extractor.cpp:769-829) lowers to ~6 dense
fusions per level per threshold — dual-threshold response, two 3x3 NMS
passes, the boost/mask combine — each of which round-trips the full
level through HBM. At KITTI scale that chain was ~0.45 ms/frame of the
2 ms budget (select_maximum NMS fusions alone: 195 us/frame in traces).

This kernel streams the level through VMEM once per 32-row band: halo
DMA in, 16 shifted-view dual-threshold responses, both NMS passes, the
high-threshold rank boost, and the border mask, all on-chip; one sparse
response map comes back out.

Measured outcome (KITTI-scale bench, v5e, alternating A/B over 7 runs
across 2 sessions): a statistical tie with the XLA formulation (XLA
495-523 fps, fused 500-523; run-to-run noise ~5%) — both are VPU-bound
on identical arithmetic, and the kernel's materialized `pltpu.roll`
band copies offset its saved HBM round-trips. Kept behind
`ExtractorConfig.fused_fast` (default off — simpler path wins a tie)
for libtpu builds where the XLA fusion regresses; bit-exact parity is
CI-checked in tests/test_fast_kernel.py. Semantics are IDENTICAL to
fast.detect_dual / fast.detect (the XLA paths remain the probe-gated
fallback), with one caveat: the halo is zero-padded instead of
edge-replicated, which can only differ within 4 px of the image edge —
masked out whenever border >= 5 (production border is 16; callers with
border < 5 are routed to the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from slam_toolkit_tpu.ops.fast import ARC_LENGTH, CIRCLE_OFFSETS

_TH = 32  # output rows per grid program (64 blows the 16M scoped-VMEM
#           cap at KITTI width: 6 shifted band copies + 8 accumulators)


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _arc(m: jnp.ndarray) -> jnp.ndarray:
    """>= ARC_LENGTH consecutive circle bits set (with wraparound)."""
    m2 = m | (m << 16)
    r = m2
    for k in range(1, ARC_LENGTH):
        r = r & (m2 >> k)
    return (r & 0xFFFF) != 0


def _nms_band(resp: jnp.ndarray, th: int) -> jnp.ndarray:
    """fast.nms3x3 on a (th+2, W) response band -> (th, W) suppressed
    scores, separable form: 2 column rolls + free row slices.

    Bit-equivalent to nms3x3 away from the image edge (the XLA version
    pads with -1 beyond the image; here halo values differ only within
    1 px of the edge, which callers mask with border >= 5)."""
    from jax.experimental.pallas import tpu as pltpu
    w = resp.shape[1]
    rp1 = pltpu.roll(resp, 1, 1)        # rp1[c] = resp[c-1]
    rm1 = pltpu.roll(resp, w - 1, 1)    # rm1[c] = resp[c+1]
    m3 = jnp.maximum(jnp.maximum(rp1, resp), rm1)
    s_c = resp[1:th + 1]
    maxval = jnp.maximum(jnp.maximum(m3[0:th], m3[1:th + 1]), m3[2:th + 2])
    # row-major neighbors before the center: the 3 above + the left one
    earlier = (m3[0:th] >= s_c) | (rp1[1:th + 1] >= s_c)
    is_max = (s_c >= maxval) & (s_c > 0.0)
    return jnp.where(is_max & ~earlier, s_c, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("thr_hi", "thr_lo", "border", "h", "w", "interpret"))
def _fast_nms_pallas(img_p: jnp.ndarray, thr_hi, thr_lo, border: int,
                     h: int, w: int, interpret: bool = False) -> jnp.ndarray:
    """img_p: (HP, WP) zero-padded level with a 4-px top/left halo.
    Returns the (HP-8-ish, WP) effective response; caller slices [:h, :w].
    thr_hi None = single-threshold fast.detect semantics."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hp, wp = img_p.shape
    grid = (hp - 8) // _TH

    def kernel(img_hbm, out_ref, band, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(img_hbm.at[pl.ds(i * _TH, _TH + 8)],
                                   band, sem)
        cp.start()
        cp.wait()
        x = band[:]
        wp2 = x.shape[1]
        # 6 column-shifted copies of the band; every (dy, dx) view is
        # then a FREE sublane-offset row slice of one of them. This is
        # the whole trick vs per-offset 2D rolls (10 materialized rolls
        # per band instead of ~100).
        xs = {0: x}
        for dx in (-3, -2, -1, 1, 2, 3):
            xs[dx] = pltpu.roll(x, (wp2 - dx) % wp2, 1)
        # response over rows [3, _TH+5) — exactly what NMS needs
        rh = _TH + 2
        c = x[3:3 + rh]
        zi = jnp.zeros(c.shape, jnp.int32)
        zf = jnp.zeros(c.shape, jnp.float32)
        mb_lo, md_lo = zi, zi
        sb_lo, sd_lo = zf, zf
        if thr_hi is not None:
            mb_hi, md_hi = zi, zi
            sb_hi, sd_hi = zf, zf
        for k, (dy, dx) in enumerate(CIRCLE_OFFSETS):
            diff = xs[dx][3 + dy:3 + dy + rh] - c
            b_lo = diff > thr_lo
            d_lo = diff < -thr_lo
            mb_lo = mb_lo | (b_lo.astype(jnp.int32) << k)
            md_lo = md_lo | (d_lo.astype(jnp.int32) << k)
            sb_lo = sb_lo + jnp.where(b_lo, diff - thr_lo, 0.0)
            sd_lo = sd_lo + jnp.where(d_lo, -diff - thr_lo, 0.0)
            if thr_hi is not None:
                b_hi = diff > thr_hi
                d_hi = diff < -thr_hi
                mb_hi = mb_hi | (b_hi.astype(jnp.int32) << k)
                md_hi = md_hi | (d_hi.astype(jnp.int32) << k)
                sb_hi = sb_hi + jnp.where(b_hi, diff - thr_hi, 0.0)
                sd_hi = sd_hi + jnp.where(d_hi, -diff - thr_hi, 0.0)
        resp_lo = jnp.maximum(jnp.where(_arc(mb_lo), sb_lo, 0.0),
                              jnp.where(_arc(md_lo), sd_lo, 0.0))
        lo = _nms_band(resp_lo, _TH)
        if thr_hi is not None:
            resp_hi = jnp.maximum(jnp.where(_arc(mb_hi), sb_hi, 0.0),
                                  jnp.where(_arc(md_hi), sd_hi, 0.0))
            hi = _nms_band(resp_hi, _TH)
            eff = jnp.where(hi > 0.0, lo + 1e4, lo)
        else:
            eff = lo
        # shift so out col 0 = image col 0 (drop the 4-px left halo)
        eff = pltpu.roll(eff, wp2 - 4, 1)
        rows = i * _TH + jax.lax.broadcasted_iota(jnp.int32, eff.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, eff.shape, 1)
        valid = ((rows >= border) & (rows < h - border) &
                 (cols >= border) & (cols < w - border))
        out_ref[:] = jnp.where(valid, eff, 0.0)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_TH, wp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((grid * _TH, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_TH + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(img_p)


def _pad_level(image: jnp.ndarray):
    h, w = image.shape
    grid = -(-h // _TH)
    hp = grid * _TH + 8
    wp = _rup(w + 8, 128)
    return jnp.pad(image, ((4, hp - h - 4), (4, wp - w - 4))), h, w


def detect_fused(image: jnp.ndarray, thr_hi, thr_lo: float, border: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Drop-in for fast.detect_dual(image, thr_hi, thr_lo, border)
    (or fast.detect when thr_hi is None). Requires border >= 5."""
    assert border >= 5, "fused FAST kernel needs border >= 5 (halo masking)"
    img_p, h, w = _pad_level(image.astype(jnp.float32))
    out = _fast_nms_pallas(img_p, thr_hi, float(thr_lo), int(border),
                           h, w, interpret=interpret)
    return out[:h, :w]


def detect(image: jnp.ndarray, thr_hi, thr_lo: float,
           border: int) -> jnp.ndarray:
    """Probe-gated dispatch: fused Pallas kernel on TPU, the identical
    XLA formulation (ops/fast.py) elsewhere or when Mosaic rejects it.
    thr_hi None selects single-threshold fast.detect semantics."""
    from slam_toolkit_tpu.ops import fast
    from slam_toolkit_tpu.utils.kernel_probe import use_pallas
    if border >= 5 and use_pallas("fast_nms", _probe):
        return detect_fused(image, thr_hi, thr_lo, border)
    if thr_hi is None:
        return fast.detect(image, thr_lo, border)
    return fast.detect_dual(image, thr_hi, thr_lo, border)


def _probe():
    img = jnp.zeros((64, 128), jnp.float32)
    jax.block_until_ready(detect_fused(img, 20.0, 7.0, 16))
