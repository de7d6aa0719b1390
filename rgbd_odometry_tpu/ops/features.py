"""Sparse feature front-end: Harris corners + patch descriptors + matching.

TPU-native replacement for the reference's SURF/FLANN front-end
(`PnPOdometry`, /root/reference/include/PnPOdometry.h:100-102: SURF detector/
descriptor; FLANN matching src/PnPOdometry.cpp:443-500). SURF is patented,
CPU-bound and pointer-chasing; the TPU redesign keeps the *role* (detect
repeatable keypoints on the ref/now frames, describe, match, filter) with
hardware-shaped pieces:

  * Harris corner response — pure conv/elementwise (VPU),
  * fixed-K top-score corners with validity masks (static shapes),
  * descriptors: mean/std-normalized dense patches, extracted for ALL corners
    in one multi-channel MXU matmul-gather over pre-shifted image copies,
  * matching: one (K, K) squared-distance matrix on the MXU + mutual-nearest
    and distance-gate filtering (the reference's fallback filter keeps
    matches with d <= 3*min_d, src/PnPOdometry.cpp:472-492).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rgbd_odometry_tpu.ops.gradient import sobel3
from rgbd_odometry_tpu.ops.matmul_gather import gather_channels_mm

_PREC = jax.lax.Precision.HIGHEST


class Keypoints(NamedTuple):
    uv: jnp.ndarray  # (K, 2) float pixel coords [x, y]
    score: jnp.ndarray  # (K,)
    desc: jnp.ndarray  # (K, D) L2-normalized descriptors
    valid: jnp.ndarray  # (K,)
    count: jnp.ndarray  # () int32


def _box3(x):
    p = jnp.pad(x, [(1, 1), (1, 1)], mode="edge")
    return (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    )


def harris_response(gray: jnp.ndarray, k: float = 0.04) -> jnp.ndarray:
    """Harris corner response R = det(M) - k tr(M)^2 with 3x3 aggregation."""
    gx, gy = sobel3(gray)
    sxx = _box3(gx * gx)
    syy = _box3(gy * gy)
    sxy = _box3(gx * gy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def _nms3(resp):
    p = jnp.pad(resp, [(1, 1), (1, 1)], constant_values=-jnp.inf)
    m = resp
    for dy in range(3):
        for dx in range(3):
            m = jnp.maximum(m, p[dy : dy + resp.shape[0], dx : dx + resp.shape[1]])
    return resp >= m


def detect_and_describe(
    gray: jnp.ndarray,
    k_max: int = 512,
    patch: int = 8,
    min_response_frac: float = 1e-4,
    border: int = 8,
) -> Keypoints:
    """Detect top-K Harris corners and extract normalized patch descriptors.

    Descriptor extraction trick: the (patch*patch) samples around every corner
    are the corner positions gathered from (patch*patch) *shifted copies* of
    the image — one stacked multi-channel matmul-gather serves all corners
    and all offsets at once.
    """
    h, w = gray.shape
    resp = harris_response(gray)
    # suppress the border (patch support must stay inside the image)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    peak = _nms3(resp) & inside & (resp > min_response_frac * jnp.max(resp))
    score_map = jnp.where(peak, resp, -jnp.inf)
    scores, idx = jax.lax.top_k(score_map.reshape(-1), k_max)
    valid = jnp.isfinite(scores)
    uy = (idx // w).astype(gray.dtype)
    ux = (idx % w).astype(gray.dtype)
    uv = jnp.stack([ux, uy], axis=-1)
    count = jnp.sum(valid.astype(jnp.int32))

    # shifted image stack: channel (dy, dx) = image shifted so that sampling
    # at (u, v) reads pixel (v + dy - patch/2, u + dx - patch/2)
    half = patch // 2
    shifts = []
    for dy in range(-half, half):
        for dx in range(-half, half):
            shifts.append(jnp.roll(gray, (-dy, -dx), axis=(0, 1)))
    stack = jnp.stack(shifts)  # (patch*patch, H, W)
    d = gather_channels_mm(stack, uv[:, 0], uv[:, 1], bilinear=False, precision=_PREC)
    desc = d.T  # (K, patch*patch)
    mu = jnp.mean(desc, axis=-1, keepdims=True)
    desc = desc - mu
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-6)
    desc = jnp.where(valid[..., None], desc, 0.0)
    return Keypoints(uv=uv, score=scores, desc=desc, valid=valid, count=count)


class Matches(NamedTuple):
    ref_idx: jnp.ndarray  # (K,) index into ref keypoints (for each now kp)
    dist: jnp.ndarray  # (K,) match distance
    good: jnp.ndarray  # (K,) bool — passed mutual + distance gate
    num_good: jnp.ndarray  # () int32


def match(
    ref: Keypoints,
    now: Keypoints,
    dist_gate_factor: float = 3.0,
    ratio: float = 0.9,
    dist_gate_floor: float = 1e-3,
) -> Matches:
    """Mutual-nearest matching with the reference's distance gate.

    Distance matrix on the MXU; `good` requires (a) mutual nearest neighbour,
    (b) Lowe-style ratio vs the 2nd neighbour, (c) d <= max(3*min_d, floor) —
    the reference's fallback filter (src/PnPOdometry.cpp:472-492).

    The relative gate degenerates when the two frames are NEARLY IDENTICAL:
    one near-perfect match drives min_d toward 0 and 3*min_d then rejects
    every other true match (measured on near-duplicate synthetic frames:
    min_d 0.024 -> 8 of ~45 true matches pass). `dist_gate_floor` bounds the
    gate from below; the default 1e-3 preserves the reference semantics,
    relocalization queries (where a near-duplicate IS the success case) use
    ~0.2 — true-match patch distances cluster under ~0.15, outliers above
    ~0.45 on unit-norm descriptors.
    """
    # squared L2 distance via inner products (descriptors are unit-norm)
    sim = jnp.einsum("id,jd->ij", now.desc, ref.desc, precision=_PREC)
    d2 = jnp.maximum(2.0 - 2.0 * sim, 0.0)
    big = jnp.asarray(1e9, d2.dtype)
    d2 = jnp.where(now.valid[:, None] & ref.valid[None, :], d2, big)

    best_ref = jnp.argmin(d2, axis=1)  # for each now kp
    best_d = jnp.min(d2, axis=1)
    # second-best for the ratio test
    d2_wo = d2.at[jnp.arange(d2.shape[0]), best_ref].set(big)
    second_d = jnp.min(d2_wo, axis=1)
    # mutual check
    best_now_for_ref = jnp.argmin(d2, axis=0)
    mutual = best_now_for_ref[best_ref] == jnp.arange(d2.shape[0])

    dist = jnp.sqrt(best_d)
    min_d = jnp.min(jnp.where(now.valid, dist, jnp.inf))
    gate = dist <= jnp.maximum(dist_gate_factor * min_d, dist_gate_floor)
    ratio_ok = best_d <= (ratio * ratio) * second_d
    good = now.valid & mutual & gate & ratio_ok & (best_d < big * 0.5)
    return Matches(
        ref_idx=best_ref,
        dist=dist,
        good=good,
        num_good=jnp.sum(good.astype(jnp.int32)),
    )
