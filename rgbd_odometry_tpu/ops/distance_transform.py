"""Exact Euclidean (L2) distance transform, TPU-native.

Replaces cv::distanceTransform(inverted_edges, CV_DIST_L2, CV_DIST_MASK_PRECISE)
(/root/reference/src/SolveDVO.cpp:1709, :1771) — OpenCV's "precise" mode is the
exact Felzenszwalb-Huttenlocher EDT. The classic algorithm's per-row parabola
envelope is inherently sequential, so this implementation restructures it
TPU-first as two fully-parallel passes:

  phase 1 (columns): nearest-edge distance within each column via two
      cumulative mins (`lax.cummin`) — d_fwd[i] = i + min_{j<=i}(c[j]-j),
      d_bwd[i] = -i + min_{j>=i}(c[j]+j); both are O(HW) vector work.
  phase 2 (rows): D^2[y,x] = min_i ( g[y,i]^2 + (x-i)^2 ) — a min-plus
      reduction against the parabola cost matrix, expressed as a fused
      broadcast+min-reduce that XLA keeps in registers (never materializing
      the (H,W,W) intermediate). O(HW^2) VPU flops, embarrassingly parallel —
      the right trade on TPU vs. the O(HW) sequential envelope scan.

Also provides the min-max normalization to 0..255 applied by the reference
(__SCALE_NORMALIZE_DISTANCE_TRANFROM, /root/reference/include/SolveDVO.h:103;
cv::normalize at src/SolveDVO.cpp:1712).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1.0e7  # "no edge in this column" sentinel; clamped before squaring


def _column_distance(zero_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-column 1D distance to the nearest True in `zero_mask` (along rows).

    Returns float distances; columns with no edge get a large sentinel.
    """
    h = zero_mask.shape[-2]
    axis = zero_mask.ndim - 2  # lax.cummin requires a non-negative axis
    idx = jnp.arange(h, dtype=jnp.float32)[..., :, None]
    c = jnp.where(zero_mask, 0.0, _BIG)
    fwd = idx + jax.lax.cummin(c - idx, axis=axis)
    bwd = -idx + jax.lax.cummin(c + idx, axis=axis, reverse=True)
    return jnp.minimum(jnp.minimum(fwd, bwd), _BIG)


def edt_l2_squared(zero_mask: jnp.ndarray) -> jnp.ndarray:
    """Squared exact L2 distance to the nearest True pixel of `zero_mask`."""
    w = zero_mask.shape[-1]
    g = _column_distance(zero_mask)
    g = jnp.minimum(g, 65504.0)  # keep g^2 finite even for empty columns
    g2 = g * g
    xs = jnp.arange(w, dtype=jnp.float32)
    # parabola cost C[x, i] = (x - i)^2, shape (W, W)
    cost = (xs[:, None] - xs[None, :]) ** 2
    # D2[..., y, x] = min_i ( g2[..., y, i] + C[x, i] )
    d2 = jnp.min(g2[..., :, None, :] + cost, axis=-1)
    return d2


def edt_l2(zero_mask: jnp.ndarray) -> jnp.ndarray:
    """Exact L2 distance transform (distance to nearest True pixel)."""
    return jnp.sqrt(edt_l2_squared(zero_mask))


def edt_l2_squared_windowed(zero_mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Squared L2 EDT with the row-phase min-plus restricted to a +-radius
    column window.

    EXACT for every pixel whose true distance is <= radius (the minimizing
    column offset |x-i*| is bounded by the distance itself); pixels farther
    from all edges get an overestimate (>= true). The full min-plus is
    O(W) work per output; this is O(2*radius+1) — ~5x cheaper at W=320,
    R=32. Intended for the production Gauss-Newton profile, whose robust
    weight 6/(6+r^2) makes residuals beyond ~10 px negligible anyway; the
    reference-parity mode keeps the exact transform.
    """
    g = _column_distance(zero_mask)
    g = jnp.minimum(g, 65504.0)
    g2 = g * g
    d2 = g2
    big = jnp.asarray(4.0e9, g2.dtype)
    for dx in range(1, radius + 1):
        c = float(dx * dx)
        pad = [(0, 0)] * (g2.ndim - 1)
        left = jnp.pad(g2, pad + [(dx, 0)], constant_values=big)[..., : g2.shape[-1]]
        right = jnp.pad(g2, pad + [(0, dx)], constant_values=big)[..., dx:]
        d2 = jnp.minimum(d2, jnp.minimum(left, right) + c)
    return d2


def normalize_minmax(dt: jnp.ndarray, lo: float = 0.0, hi: float = 255.0) -> jnp.ndarray:
    """cv::normalize(..., 0, 255, NORM_MINMAX) over the full image
    (/root/reference/src/SolveDVO.cpp:1712)."""
    dmin = jnp.min(dt, axis=(-2, -1), keepdims=True)
    dmax = jnp.max(dt, axis=(-2, -1), keepdims=True)
    scale = (hi - lo) / jnp.maximum(dmax - dmin, 1e-12)
    return (dt - dmin) * scale + lo


def distance_transform_of_edges(
    edges: jnp.ndarray, normalize: bool = True
) -> jnp.ndarray:
    """The reference's full chain: DT of the *inverted* edge map
    (edges become the zero set: /root/reference/src/SolveDVO.cpp:1706-1712),
    optionally min-max normalized to 0..255."""
    dt = edt_l2(edges)
    if normalize:
        dt = normalize_minmax(dt)
    return dt
