"""MXU-native image sampling: gathers as separable one-hot matmuls.

XLA lowers point gathers (`jnp.take_along_axis`) on TPU to a serialized
per-element path (~0.1-0.2 us/element measured on v5e) — catastrophic for the
solver's inner loop, which samples the distance transform and its gradients
at thousands of reprojected points every iteration.

TPU-first reformulation: bilinear sampling is separable, so a gather at
points (u, v) factors into

    row_mix[c, k, :] = W_row[k, :] @ img[c, :, :]        (MXU matmul, (K,H)x(H,W))
    out[c, k]        = sum_w row_mix[c, k, w] * W_col[k, w]   (VPU reduce)

where W_row has at most two nonzeros per row ((1-fy) at floor(v), fy at
floor(v)+1) and W_col likewise for u — exactly one nonzero each in floor
(nearest) mode. The dense (K, H) one-hot is tiny, the matmul rides the MXU at
full throughput, and all channels (DT, dGx, dGy) share one contraction.

This is the same trade the reference's cuBLAS experiment gestured at
(/root/reference/src/cuda.cu:169-214) done for the real bottleneck.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC_HI = jax.lax.Precision.HIGHEST


def _row_weights(coord: jnp.ndarray, n: int, bilinear: bool, dtype) -> jnp.ndarray:
    """(K,) fractional coordinates -> (K, n) interpolation weight matrix."""
    c = jnp.clip(coord, 0.0, n - 1.0)
    i0 = jnp.floor(c)
    frac = (c - i0).astype(dtype)
    i0i = i0.astype(jnp.int32)
    i1i = jnp.minimum(i0i + 1, n - 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (coord.shape[0], n), 1)
    if bilinear:
        w = jnp.where(iota == i0i[:, None], (1.0 - frac)[:, None], 0.0)
        w = jnp.where(iota == i1i[:, None], w + frac[:, None], w)
    else:
        w = jnp.where(iota == i0i[:, None], 1.0, 0.0).astype(dtype)
    return w.astype(dtype)


def gather_channels_mm(
    imgs: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    bilinear: bool = True,
    precision=None,
) -> jnp.ndarray:
    """Sample `imgs` (C, H, W) at points (u (K,), v (K,)) -> (C, K).

    `bilinear=False` reproduces the floor-lookup semantics of the reference's
    DT sampling (/root/reference/src/SolveDVO.cpp:446) exactly (one-hot
    weights are exact in any float dtype).

    Note on i1 clamping: at v == H-1 both one-hot entries land on the same
    row and their weights sum to 1 (frac == 0 there after the clip), matching
    clamped-edge bilinear sampling.
    """
    c, h, w_img = imgs.shape
    dtype = imgs.dtype
    w_row = _row_weights(v, h, bilinear, dtype)  # (K, H)
    w_col = _row_weights(u, w_img, bilinear, dtype)  # (K, W)
    # (K, H) @ (C, H, W) -> (C, K, W) on the MXU
    row_mix = jnp.einsum(
        "kh,chw->ckw", w_row, imgs, precision=precision
    )
    # (C, K, W) * (K, W) -> (C, K) on the VPU
    return jnp.einsum("ckw,kw->ck", row_mix, w_col, precision=precision)


def gather_bilinear_value_grad_mm(
    img: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    precision=None,
):
    """Bilinear sample of `img` (H, W) at (u, v) plus the EXACT gradient of
    the bilinear interpolant: returns (val (K,), d val/du (K,), d val/dv (K,)).

    Cost: TWO one-hot row matmuls (rows floor(v) and floor(v)+1) instead of
    the three channel matmuls of gathering [img, central_gx, central_gy] —
    the gradient of the sampled surface comes from the same four corner rows
    the value does:

        rowmix_p = onehot(i_p) @ img                (p in {0, 1}; the MXU work)
        val  = <(1-fv) rowmix_0 + fv rowmix_1, W_col_bilin>
        g_u  = <(1-fv) rowmix_0 + fv rowmix_1, onehot(j1) - onehot(j0)>
        g_v  = <rowmix_1 - rowmix_0,            W_col_bilin>

    This is both cheaper (2/3 the MXU FLOPs) and the mathematically correct
    gradient for a Gauss-Newton step on the bilinearly-sampled residual
    (the central-difference channels are a smoothed approximation that is up
    to half a cell off near fine structure). At clamped borders (i0 == i1 or
    j0 == j1) the corresponding derivative is exactly 0, matching the
    clamped interpolant.
    """
    h, w_img = img.shape
    dtype = img.dtype
    # rows: bilinear weights and their exact row-derivative (+-1 one-hots)
    vc = jnp.clip(v, 0.0, h - 1.0)
    i0 = jnp.floor(vc)
    fv = (vc - i0).astype(dtype)
    i0i = i0.astype(jnp.int32)
    i1i = jnp.minimum(i0i + 1, h - 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (u.shape[0], h), 1)
    oh0 = (iota_r == i0i[:, None]).astype(dtype)
    oh1 = (iota_r == i1i[:, None]).astype(dtype)
    w_row = (1.0 - fv)[:, None] * oh0 + fv[:, None] * oh1  # (K, H)
    d_row = oh1 - oh0  # (K, H), entries in {-1, 0, +1}: exact in any dtype
    # columns
    uc = jnp.clip(u, 0.0, w_img - 1.0)
    j0 = jnp.floor(uc)
    fu = (uc - j0).astype(dtype)
    j0i = j0.astype(jnp.int32)
    j1i = jnp.minimum(j0i + 1, w_img - 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (u.shape[0], w_img), 1)
    c0 = (iota_c == j0i[:, None]).astype(dtype)
    c1 = (iota_c == j1i[:, None]).astype(dtype)
    w_col = (1.0 - fu)[:, None] * c0 + fu[:, None] * c1
    d_col = c1 - c0  # zero when j0 == j1 (right edge)

    # Two single-consumer dot->reduce chains (XLA fuses the (K, W) row mix
    # into its reduce epilogue; a shared multi-consumer mix would be
    # materialized to HBM and cost more than the saved MXU flops — measured):
    #   chain 1: bilinear row mix -> {value, d/du} column reduces
    #   chain 2: row-difference mix -> d/dv column reduce
    rowv = jnp.einsum("kh,hw->kw", w_row, img, precision=precision)  # (K, W)
    cw = jnp.stack([w_col, d_col])  # (2, K, W)
    val_gu = jnp.einsum("skw,kw->sk", cw, rowv, precision=precision)
    rowd = jnp.einsum("kh,hw->kw", d_row, img, precision=precision)  # (K, W)
    g_v = jnp.einsum("kw,kw->k", rowd, w_col, precision=precision)
    f32 = jnp.float32
    return val_gu[0].astype(f32), val_gu[1].astype(f32), g_v.astype(f32)


def gather_floor_value_cgrads_mm(
    img: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    precision=_PREC_HI,
):
    """Floor-lookup of `img` AND its central-difference gradients at the same
    integer pixel — (val, gx, gy), each (K,) — from TWO f32 one-hot matmuls.

    Exactly equal to gathering the three channels [img, central_gx,
    central_gy] (the reference's DT + precomputed filter2D gradients,
    /root/reference/src/SolveDVO.cpp:1728,1077-1082) because the gradient at
    the looked-up pixel is itself a +-0.5-weighted two-pixel combination of
    `img` with REFLECT_101 borders:

        gx[i, j] = 0.5 (img[i, refl(j+1)] - img[i, refl(j-1)])
        gy[i, j] = 0.5 (img[refl(i+1), j] - img[refl(i-1), j])

    so the channel gathers factor into row/column one-hot weights directly
    (f32 one-hot matmuls are exact; 0.5x is an exponent shift). 2/3 the MXU
    work of the 3-channel gather — used by the reference-parity sub-gradient
    mode, whose 50x4-iteration schedule is gather-bound.
    """
    h, w_img = img.shape
    dtype = img.dtype

    def refl(idx, n):  # REFLECT_101: -1 -> 1, n -> n-2
        return jnp.where(idx < 0, -idx, jnp.where(idx > n - 1, 2 * (n - 1) - idx, idx))

    i0 = jnp.floor(jnp.clip(v, 0.0, h - 1.0)).astype(jnp.int32)
    j0 = jnp.floor(jnp.clip(u, 0.0, w_img - 1.0)).astype(jnp.int32)
    ip, im = refl(i0 + 1, h), refl(i0 - 1, h)
    jp, jm = refl(j0 + 1, w_img), refl(j0 - 1, w_img)
    k = u.shape[0]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (k, h), 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (k, w_img), 1)
    oh = lambda idx, iota: (iota == idx[:, None]).astype(dtype)

    # chain 1: row i0 -> {value at j0, gx via column difference}
    rowa = jnp.einsum("kh,hw->kw", oh(i0, iota_r), img, precision=precision)
    cw = jnp.stack([oh(j0, iota_c), 0.5 * (oh(jp, iota_c) - oh(jm, iota_c))])
    val_gx = jnp.einsum("skw,kw->sk", cw, rowa, precision=precision)
    # chain 2: row difference -> gy at column j0
    d_row = 0.5 * (oh(ip, iota_r) - oh(im, iota_r))
    rowb = jnp.einsum("kh,hw->kw", d_row, img, precision=precision)
    gy = jnp.einsum("kw,kw->k", rowb, oh(j0, iota_c), precision=precision)
    return val_gx[0], val_gx[1], gy


def gather_floor_mm(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, precision=_PREC_HI):
    """Floor-lookup gather of a single (H, W) image -> (K,). Exact."""
    return gather_channels_mm(img[None], u, v, bilinear=False, precision=precision)[0]


def gather_bilinear_mm(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, precision=None):
    """Bilinear gather of a single (H, W) image -> (K,)."""
    return gather_channels_mm(img[None], u, v, bilinear=True, precision=precision)[0]
