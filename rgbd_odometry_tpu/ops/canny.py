"""Canny edge detection, TPU-native, with OpenCV-matching semantics.

Replaces cv::Canny(im8u, edges, 150, 100, apertureSize=3, L2gradient=true)
(/root/reference/src/SolveDVO.cpp:1705, :1767). OpenCV normalizes the two
thresholds to low=min, high=max, squares them under L2gradient, computes an
aperture-3 Sobel with BORDER_REPLICATE, runs fixed-point sector NMS (TG22
arithmetic, reproduced here exactly in int32), then 8-connected hysteresis.

Hysteresis is OpenCV's stack-based flood fill re-expressed as an iterated
3x3 dilation of strong edges through the weak-candidate mask inside a
`lax.while_loop` — a fixpoint identical to BFS connectivity, and each sweep is
one cheap fused VPU pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rgbd_odometry_tpu.ops.gradient import sobel3

_TG22 = 13573  # round(tan(22.5 deg) * 2^15), OpenCV's fixed-point constant
_SHIFT = 15


def _nms(mag: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray, low: float) -> jnp.ndarray:
    """OpenCV sector non-maximum suppression. mag/dx/dy are integral-valued
    float arrays; returns bool mask of NMS survivors with mag > low.

    OpenCV's fixed-point arithmetic is reproduced in *float32* — int32
    multiplies are emulated on the TPU VPU and measured 15x slower. The
    float version is exact in the relevant ranges: |dx|,|dy| <= 1020 are
    exact small ints; |dy|*2^15 and |dx|*2^16 only shift the exponent
    (always exact); |dx|*13573 <= 13.8M < 2^24 is exact; tg67x =
    |dx|*13573 + |dx|*65536 rounds by at most 4 ulp out of ~8e7, which can
    flip a vertical/diagonal sector choice only when |dy|*2^15 lands within
    that margin — verified bit-identical to the int32 formulation across
    randomized golden tests. The sign test (xs^ys)<0 becomes dx*dy<0,
    equivalent because the diagonal sector requires dx != 0 and dy != 0.
    """
    # zero-padded neighbours (OpenCV treats out-of-image magnitude as 0)
    pad = [(0, 0)] * (mag.ndim - 2) + [(1, 1), (1, 1)]
    m = jnp.pad(mag, pad)
    c = m[..., 1:-1, 1:-1]
    left = m[..., 1:-1, :-2]
    right = m[..., 1:-1, 2:]
    up = m[..., :-2, 1:-1]
    down = m[..., 2:, 1:-1]
    ul = m[..., :-2, :-2]
    ur = m[..., :-2, 2:]
    dl = m[..., 2:, :-2]
    dr = m[..., 2:, 2:]

    x = jnp.abs(dx)
    y = jnp.abs(dy) * float(1 << _SHIFT)
    tg22x = x * float(_TG22)
    tg67x = tg22x + x * 65536.0

    horiz = y < tg22x
    vert = (~horiz) & (y > tg67x)
    s_neg = (dx * dy) < 0

    keep_h = (c > left) & (c >= right)
    keep_v = (c > up) & (c >= down)
    # diagonal: m > prev_row[j-s] && m > next_row[j+s]
    keep_d_pos = (c > ul) & (c > dr)  # s = +1
    keep_d_neg = (c > ur) & (c > dl)  # s = -1
    keep = jnp.where(
        horiz, keep_h, jnp.where(vert, keep_v, jnp.where(s_neg, keep_d_neg, keep_d_pos))
    )
    return keep & (c > low)


def _dilate3x3(mask: jnp.ndarray) -> jnp.ndarray:
    pad = [(0, 0)] * (mask.ndim - 2) + [(1, 1), (1, 1)]
    m = jnp.pad(mask, pad)
    out = m[..., 1:-1, 1:-1]
    for dy in (0, 1, 2):
        for dx_ in (0, 1, 2):
            if dy == 1 and dx_ == 1:
                continue
            out = out | m[..., dy : dy + mask.shape[-2], dx_ : dx_ + mask.shape[-1]]
    return out


def _pack_rows(mask: jnp.ndarray):
    """Pack a (..., H, W) bool mask into (..., ceil(H/32), W) uint32 words:
    bit b of word k holds row 32k+b. TPU lanes are 128 wide along the LAST
    axis, so packing along H keeps the W axis dense — each bitwise pass then
    touches ~H/32 the vector registers of the unpacked mask."""
    h = mask.shape[-2]
    k = (h + 31) // 32
    pad = k * 32 - h
    if pad:
        pad_cfg = [(0, 0)] * (mask.ndim - 2) + [(0, pad), (0, 0)]
        mask = jnp.pad(mask, pad_cfg)
    m = mask.reshape(*mask.shape[:-2], k, 32, mask.shape[-1]).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[:, None]
    return jnp.sum(m * weights, axis=-2).astype(jnp.uint32)


def _unpack_rows(packed: jnp.ndarray, h: int) -> jnp.ndarray:
    bits = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[:, None]
    m = (packed[..., :, None, :] & bits) != 0
    return m.reshape(*packed.shape[:-2], packed.shape[-2] * 32, packed.shape[-1])[
        ..., :h, :
    ]


def _dilate3x3_packed(b: jnp.ndarray) -> jnp.ndarray:
    """8-connected dilation on row-packed words.

    Vertical neighbours are bit shifts (with cross-word carries from the
    adjacent word rows); horizontal neighbours are lane shifts."""
    up_carry = jnp.roll(b, 1, axis=-2) >> 31
    up_carry = up_carry.at[..., 0, :].set(0)
    down_carry = jnp.roll(b, -1, axis=-2) << 31
    down_carry = down_carry.at[..., -1, :].set(0)
    v = b | (b << 1) | up_carry | (b >> 1) | down_carry
    left = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(1, 0)])[..., :, : v.shape[-1]]
    right = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, 1)])[..., :, 1:]
    return v | left | right


def hysteresis(
    strong: jnp.ndarray,
    weak: jnp.ndarray,
    max_iters: int | None = None,
) -> jnp.ndarray:
    """8-connected propagation of `strong` through `weak` to a fixpoint.

    Equivalent to OpenCV's BFS. The fixpoint is ~40 one-pixel dilation passes
    deep on real scenes and each pass over an unpacked (H, W) bool mask made
    the while_loop op-bound (measured 3.6 ms of a 64-batch 320x240 target
    step on v5e). The masks are bit-packed 32 rows/uint32 word first, making
    every dilation pass + convergence check ~30x smaller.
    """
    h = strong.shape[-2]
    if max_iters is None:
        # the changed-flag terminates at the fixpoint; this cap is only a
        # pathological backstop. H*W bounds ANY 8-connected propagation path
        # (serpentine/spiral weak chains can exceed H+W steps).
        max_iters = strong.shape[-2] * strong.shape[-1]

    weak_p = _pack_rows(weak)
    init_p = _pack_rows(strong) & weak_p

    def cond(state):
        edges, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        edges, _, it = state
        new = (edges | _dilate3x3_packed(edges)) & weak_p
        return new, jnp.any(new != edges), it + 1

    # the initial changed-flag is derived from the data (trivially True) so
    # its "varying" type matches the body's output under shard_map — a
    # literal True constant would be mesh-unvarying and fail to unify
    changed0 = jnp.sum(init_p, dtype=jnp.uint32) >= 0
    init = (init_p, changed0, jnp.asarray(0, jnp.int32))
    edges_p, _, _ = jax.lax.while_loop(cond, body, init)
    return _unpack_rows(edges_p, h)


def _grad_mag(img: jnp.ndarray, low: float, high: float, l2gradient: bool):
    """Shared front half of canny: 8-bit emulation, Sobel, magnitude."""
    img = jnp.round(img)  # emulate convertTo(CV_8U) saturation/rounding
    img = jnp.clip(img, 0.0, 255.0)
    gx, gy = sobel3(img, border="replicate")
    # gx/gy are exact small integers in float32 (|.| <= 1020); the magnitudes
    # stay < 2^24, so float arithmetic reproduces OpenCV's int math exactly
    if l2gradient:
        mag = gx * gx + gy * gy
        low_t, high_t = float(low) * float(low), float(high) * float(high)
    else:
        mag = jnp.abs(gx) + jnp.abs(gy)
        low_t, high_t = float(low), float(high)
    return mag, gx, gy, low_t, high_t


def canny_multi(
    imgs,
    low: float = 100.0,
    high: float = 150.0,
    l2gradient: bool = True,
    hysteresis_max_iters: int | None = None,
):
    """Canny over a tuple of images of different shapes (a pyramid) with ONE
    NMS pass and ONE hysteresis fixpoint — bit-identical to per-image
    `canny`, returned as a tuple of per-image edge maps.

    Why: per-level `canny` costs 4 independent `while_loop`s of ~40 tiny
    dilation passes each — pure sequential-latency, the dominant cost of the
    coarse levels. Stacking the levels into one row-concatenated image (each
    padded to the widest W, with one zero guard row between levels) runs the
    fixpoint once over everything. Exactness: NMS and hysteresis both treat
    out-of-image pixels as zero (OpenCV semantics, `_nms` zero-pad), and the
    guard rows ARE zero — magnitude 0 can never survive `c > low`, and
    hysteresis propagation dies in a guard row because `weak` is False there
    (8-connectivity cannot jump the row). Sobel's replicate border stays
    per-image, computed before stacking.
    """
    if low > high:
        low, high = high, low
    mags, gxs, gys, shapes = [], [], [], []
    low_t = high_t = 0.0
    for img in imgs:
        mag, gx, gy, low_t, high_t = _grad_mag(img, low, high, l2gradient)
        shapes.append(img.shape[-2:])
        mags.append(mag)
        gxs.append(gx)
        gys.append(gy)
    w_max = max(s[1] for s in shapes)

    def stack(parts):
        padded = []
        for p, (h, w) in zip(parts, shapes):
            pad = [(0, 0)] * (p.ndim - 2) + [(0, 1), (0, w_max - w)]  # +guard row
            padded.append(jnp.pad(p, pad))
        return jnp.concatenate(padded, axis=-2)

    mag_s, gx_s, gy_s = stack(mags), stack(gxs), stack(gys)
    weak = _nms(mag_s, gx_s, gy_s, low_t)
    strong = weak & (mag_s > high_t)
    edges_s = hysteresis(strong, weak, hysteresis_max_iters)
    out, row = [], 0
    for h, w in shapes:
        out.append(edges_s[..., row : row + h, :w])
        row += h + 1
    return tuple(out)


def canny(
    img: jnp.ndarray,
    low: float = 100.0,
    high: float = 150.0,
    l2gradient: bool = True,
    hysteresis_max_iters: int | None = None,
) -> jnp.ndarray:
    """Canny edge map (bool). `img` is 8-bit-valued (0..255, integral floats).

    The reference calls cv::Canny(im, edges, 150, 100, 3, true)
    (/root/reference/src/SolveDVO.cpp:1705): OpenCV swaps to low=100, high=150.
    """
    if low > high:
        low, high = high, low
    mag, gx, gy, low_t, high_t = _grad_mag(img, low, high, l2gradient)
    weak = _nms(mag, gx, gy, low_t)
    strong = weak & (mag > high_t)
    return hysteresis(strong, weak, hysteresis_max_iters)
