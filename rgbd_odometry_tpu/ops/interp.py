"""Image sampling: floor gather and the reference's sqrt-of-squares bilinear.

The reference samples the distance transform at reprojected points with a
floor lookup (/root/reference/src/SolveDVO.cpp:446, __INTERPOLATE plug off) and
keeps an optional bilinear-of-squares interpolation (`interpolate`,
:1285-1308) — both reproduced here as batched gathers.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_floor(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """img[floor(v), floor(u)] with clamped indices.

    The reference's bound check admits coordinates up to (cols, rows)
    *inclusive* (/root/reference/src/SolveDVO.cpp:370-373, :435-441) and then
    indexes with floor — we clamp to the valid range instead of reading out of
    bounds; callers mask invisible points separately so the sampled value for
    them never contributes.
    """
    h, w = img.shape[-2:]
    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 1)
    flat = img.reshape(img.shape[:-2] + (h * w,))
    idx = vi * w + ui
    if img.ndim == 2:
        return jnp.take(flat, idx, axis=-1)
    return jnp.take_along_axis(flat, idx, axis=-1)


def gather_bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain bilinear sampling with clamped coordinates."""
    h, w = img.shape[-2:]
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = u - x0.astype(img.dtype)
    fy = v - y0.astype(img.dtype)
    flat = img.reshape(img.shape[:-2] + (h * w,))

    def g(yy, xx):
        idx = yy * w + xx
        if img.ndim == 2:
            return jnp.take(flat, idx, axis=-1)
        return jnp.take_along_axis(flat, idx, axis=-1)

    top = g(y0, x0) * (1.0 - fx) + g(y0, x1) * fx
    bot = g(y1, x0) * (1.0 - fx) + g(y1, x1) * fx
    return top * (1.0 - fy) + bot * fy


def gather_sqrt_bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """The reference's `interpolate`: bilinear blend of *squared* samples with
    sqrt at each stage (/root/reference/src/SolveDVO.cpp:1285-1308).

    Net effect: sqrt of the bilinear interpolation of F^2 (the intermediate
    sqrt/square pairs cancel algebraically).
    """
    h, w = img.shape[-2:]
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(u).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(jnp.ceil(v).astype(jnp.int32), 0, h - 1)
    fx = u - x0.astype(img.dtype)
    fy = v - y0.astype(img.dtype)
    flat = img.reshape(img.shape[:-2] + (h * w,))

    def g(yy, xx):
        idx = yy * w + xx
        if img.ndim == 2:
            return jnp.take(flat, idx, axis=-1)
        return jnp.take_along_axis(flat, idx, axis=-1)

    f00, f01 = g(y0, x0), g(y0, x1)
    f10, f11 = g(y1, x0), g(y1, x1)
    top2 = (1.0 - fx) * f00 * f00 + fx * f01 * f01
    bot2 = (1.0 - fx) * f10 * f10 + fx * f11 * f11
    return jnp.sqrt((1.0 - fy) * top2 + fy * bot2)
