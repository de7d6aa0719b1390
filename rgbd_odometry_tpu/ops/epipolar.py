"""Epipolar-geometry match filtering: vmapped 8-point fundamental-matrix RANSAC.

TPU-native counterpart of `PnPOdometry::ransacTest`
(/root/reference/src/PnPOdometry.cpp:500-535), which runs
cv::findFundamentalMat(CV_FM_RANSAC, distance=3px, confidence=0.99) over the
descriptor matches and keeps only epipolar-consistent pairs before PnP.
Descriptor-space filters (mutual/ratio/distance gates) cannot reject a match
that is visually similar but geometrically impossible; this one can.

Design (all static shapes, one jit):
  * every hypothesis draws 8 random valid correspondences (the same
    top-k-of-randomized-scores trick as solvers.pnp.ransac_pnp),
  * the 8-point system is solved per hypothesis as the smallest eigenvector
    of the 9x9 normal matrix A^T A (eigh vmaps cleanly on TPU; both point
    sets are Hartley-normalized first for conditioning),
  * rank-2 is enforced with one batched 3x3 SVD,
  * scoring uses the Sampson distance (the first-order geometric error;
    OpenCV's RANSAC uses the symmetric epipolar distance — equivalent
    gating behaviour at these thresholds),
  * the best hypothesis's inlier set is the filter output.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def _hartley_normalize(uv: jnp.ndarray, valid: jnp.ndarray):
    """Similarity transform T so that valid points have zero centroid and
    RMS radius sqrt(2). Returns (uv_normalized (K,2), T (3,3))."""
    w = valid.astype(uv.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(uv * w[:, None], axis=0) / n
    d = jnp.sqrt(jnp.sum(jnp.sum((uv - mu) ** 2, -1) * w) / n)
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-8)
    uvn = (uv - mu) * s
    T = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], uv.dtype
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * mu[0]).at[1, 2].set(-s * mu[1])
    return uvn, T


def _eight_point(uv1n, uv2n, weights):
    """Weighted 8-point solve: f = argmin |W A f|, |f|=1 via eigh(A^T W A).

    Rows of A encode x2^T F x1 = 0 with x1 = (u1, v1, 1), x2 = (u2, v2, 1).
    """
    u1, v1 = uv1n[:, 0], uv1n[:, 1]
    u2, v2 = uv2n[:, 0], uv2n[:, 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )  # (K, 9)
    Aw = A * weights[:, None]
    N = jnp.einsum("ki,kj->ij", Aw, A, precision=_PREC)  # (9, 9)
    evals, evecs = jnp.linalg.eigh(N)
    f = evecs[:, 0]  # smallest eigenvalue
    return f.reshape(3, 3)


def _rank2(F):
    """Project F to rank 2 (zero the smallest singular value)."""
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return (U * S[None, :]) @ Vt


def sampson_distance(F, uv1, uv2):
    """First-order geometric epipolar error (pixels^2 scale under pixel F)."""
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=-1)  # (K,3)
    x2 = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], axis=-1)
    Fx1 = x1 @ F.T  # (K,3): F x1
    Ftx2 = x2 @ F  # (K,3): F^T x2
    num = jnp.sum(x2 * Fx1, axis=-1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


class EpipolarFilterResult(NamedTuple):
    inliers: jnp.ndarray  # (K,) bool — epipolar-consistent matches
    num_inliers: jnp.ndarray  # () int32
    F: jnp.ndarray  # (3, 3) best fundamental matrix (pixel coords)


def ransac_fundamental_filter(
    key: jax.Array,
    uv1: jnp.ndarray,  # (K, 2) pixel coords in image 1 (now)
    uv2: jnp.ndarray,  # (K, 2) pixel coords in image 2 (ref), paired with uv1
    valid: jnp.ndarray,  # (K,) bool — candidate matches to filter
    num_hypotheses: int = 64,
    threshold_px: float = 3.0,
    min_points: int = 8,
) -> EpipolarFilterResult:
    """RANSAC F-matrix inlier filter over matched point pairs.

    `threshold_px` mirrors the reference's distance=3
    (/root/reference/src/PnPOdometry.cpp:463: ransacTest(..., 3, 0.99)).
    When fewer than `min_points` matches are valid the filter passes
    everything through (an F cannot be estimated; the reference falls back
    to its distance threshold in that regime, :472-492).
    """
    k = uv1.shape[0]
    dtype = uv1.dtype
    if k < 8:
        # fewer match SLOTS than a minimal sample: statically pass through
        # (top_k(k=8) would fail at trace time; the runtime min_points guard
        # below covers the few-VALID-matches case)
        return EpipolarFilterResult(
            inliers=valid,
            num_inliers=jnp.sum(valid.astype(jnp.int32)),
            F=jnp.zeros((3, 3), dtype),
        )
    uv1n, T1 = _hartley_normalize(uv1, valid)
    uv2n, T2 = _hartley_normalize(uv2, valid)
    keys = jax.random.split(key, num_hypotheses)
    thr2 = jnp.asarray(threshold_px * threshold_px, dtype)

    def one_hypothesis(k_i):
        scores = jax.random.uniform(k_i, (k,)) + jnp.where(valid, 1.0, -1.0)
        _, sel = jax.lax.top_k(scores, 8)
        w = (jnp.zeros((k,), bool).at[sel].set(True) & valid).astype(dtype)
        Fn = _eight_point(uv1n, uv2n, w)
        F = _rank2(T2.T @ Fn @ T1)  # back to pixel coordinates
        d2 = sampson_distance(F, uv1, uv2)
        inl = valid & (d2 < thr2)
        return F, jnp.sum(inl.astype(jnp.int32))

    Fs, counts = jax.vmap(one_hypothesis)(keys)
    best = jnp.argmax(counts)
    F_b = Fs[best]
    d2 = sampson_distance(F_b, uv1, uv2)
    inliers = valid & (d2 < thr2)
    # degenerate-input guard: with too few candidates, pass matches through
    enough = jnp.sum(valid.astype(jnp.int32)) >= min_points
    inliers = jnp.where(enough, inliers, valid)
    return EpipolarFilterResult(
        inliers=inliers,
        num_inliers=jnp.sum(inliers.astype(jnp.int32)),
        F=F_b,
    )
