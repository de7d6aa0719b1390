"""Image gradients with OpenCV border semantics.

Replaces `SolveDVO::imageGradient` (/root/reference/src/SolveDVO.cpp:1063-1098):
3x3 central-difference kernels (+-0.5) applied with cv::filter2D, whose default
border is BORDER_REFLECT_101; and provides the aperture-3 Sobel used inside
cv::Canny (which pads with BORDER_REPLICATE).
"""

from __future__ import annotations

import jax.numpy as jnp

_PAD_MODE = {"reflect101": "reflect", "replicate": "edge"}


def _pad(img: jnp.ndarray, pad: int, border: str) -> jnp.ndarray:
    return jnp.pad(
        img,
        [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)],
        mode=_PAD_MODE[border],
    )


def central_gradient(img: jnp.ndarray):
    """(gx, gy) with gx = 0.5*(I[y, x+1] - I[y, x-1]) etc.

    Matches the reference kernels kernX=[-0.5, 0, .5] (row) and
    kernY=[-0.5, 0, .5]^T (/root/reference/src/SolveDVO.cpp:1077-1082) under
    filter2D correlation with its default REFLECT_101 border (which makes the
    outermost-row/col gradient exactly zero, as in OpenCV).
    """
    p = _pad(img, 1, "reflect101")
    gx = 0.5 * (p[..., 1:-1, 2:] - p[..., 1:-1, :-2])
    gy = 0.5 * (p[..., 2:, 1:-1] - p[..., :-2, 1:-1])
    return gx, gy


def sobel3(img: jnp.ndarray, border: str = "replicate"):
    """Aperture-3 Sobel (gx, gy) from one padded copy of the image.

    cv::Canny (aperture 3, /root/reference/src/SolveDVO.cpp:1705) computes its
    Sobel with BORDER_REPLICATE — the default here.
    gx kernel = [[-1,0,1],[-2,0,2],[-1,0,1]] (correlation), gy = gx^T.
    """
    p = _pad(img, 1, border)
    c = p[..., 1:-1, :]  # rows aligned, padded cols
    u = p[..., :-2, :]
    d = p[..., 2:, :]
    sy = u + 2.0 * c + d  # y-smoothed, cols still padded
    gx = sy[..., :, 2:] - sy[..., :, :-2]
    sx = p[..., :, :-2] + 2.0 * p[..., :, 1:-1] + p[..., :, 2:]  # x-smoothed, rows padded
    gy = sx[..., 2:, :] - sx[..., :-2, :]
    return gx, gy
