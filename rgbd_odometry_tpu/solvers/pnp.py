"""Sparse PnP pose estimation: Gauss-Newton PnP + vectorized RANSAC.

Rebuilds the reference's two sparse paths:
  * `SolvePnP::PnP` (/root/reference/src/SolvePnP.cpp:148-203): hand-rolled
    Gauss-Newton on *normalized-plane* residuals r = K^-1 u - dehom(R^T(P-T))
    (:294-323), per-point 2x6 Jacobian J = -A1 A2 with
    A2 = [-R^T | hat(R^T (P-T))] (:252-292), 5 fixed iterations, right-
    multiplied exponential update T = R exp_t + T, R = R exp_R (:188-192);
  * the `cv::solvePnPRansac` stage of `PnPOdometry::pnpEstimation`
    (/root/reference/src/PnPOdometry.cpp:537-592), re-designed TPU-first: all
    RANSAC hypotheses solve *in parallel* under `vmap` (S independent GN
    solves from minimal subsets), inliers are scored in one batched
    reprojection pass, and the winner is refined on its inlier set — no
    sequential hypothesis loop.

Everything is fixed-shape: correspondences arrive as (K, 3)/(K, 2) with a
validity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rgbd_odometry_tpu.core import geometry as geo
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.ops.linalg6 import chol_solve6

_PREC = jax.lax.Precision.HIGHEST


def normalized_residuals(obj_pts, im_pts_norm, R, t, valid):
    """r_i = u_norm_i - dehom(R^T (P_i - t)), zeroed for invalid points
    (`computeResidue`, SolvePnP.cpp:298-323; image points pre-normalized by
    K^-1 once, outside the loop)."""
    pb = jnp.einsum("kj,nk->nj", R, obj_pts - t, precision=_PREC)
    z = pb[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    proj = pb[..., :2] / zs[..., None]
    r = im_pts_norm - proj
    return jnp.where(valid[..., None], r, 0.0), pb


def gn_pnp_step(obj_pts, im_pts_norm, R, t, valid):
    """One GN iteration of `SolvePnP::PnP` (:156-194). Returns updated (R, t)
    and the pre-update residual norm."""
    r, pb = normalized_residuals(obj_pts, im_pts_norm, R, t, valid)
    z = pb[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    # A1 (2x3) rows (:270-276)
    a1_r0 = jnp.stack([1.0 / zs, jnp.zeros_like(zs), -pb[..., 0] / (zs * zs)], -1)
    a1_r1 = jnp.stack([jnp.zeros_like(zs), 1.0 / zs, -pb[..., 1] / (zs * zs)], -1)
    # A2 = [-R^T | hat(pb)]  (:279-289); row-vector a times A2:
    #   a @ (-R^T) = -(R a);   a @ hat(pb) = a x pb
    def j_row(a1):
        jt = -jnp.einsum("jk,nk->nj", R, a1, precision=_PREC)
        jr = jnp.cross(a1, pb)
        return jnp.concatenate([jt, jr], axis=-1)

    # d(proj)/d(psi) rows; residual jacobian J = -(these) (:291)
    ju = j_row(a1_r0)
    jv = j_row(a1_r1)
    J = -jnp.stack([ju, jv], axis=-2)  # (K, 2, 6)
    J = jnp.where(valid[..., None, None], J, 0.0)
    H = jnp.einsum("kri,krj->ij", J, J, precision=_PREC)
    g = jnp.einsum("kri,kr->i", J, r, precision=_PREC)
    # reference: H=-sum(J^T J); e=sum(J^T r); del = H^-1 e  == -(JtJ)^-1 Jt r
    H = H + 1e-9 * jnp.eye(6, dtype=H.dtype)
    delta = -chol_solve6(H, g)
    xR, xt = geo.se3_exp(delta)
    t_new = t + jnp.einsum("ij,j->i", R, xt, precision=_PREC)
    R_new = jnp.matmul(R, xR, precision=_PREC)
    return R_new, t_new, jnp.linalg.norm(r)


def gn_pnp(
    obj_pts: jnp.ndarray,
    im_pts_norm: jnp.ndarray,
    valid: jnp.ndarray,
    R0=None,
    t0=None,
    iterations: int = 5,
):
    """Fixed-iteration GN PnP (5 iterations as the reference, :156)."""
    dtype = obj_pts.dtype
    R = jnp.eye(3, dtype=dtype) if R0 is None else R0
    t = jnp.zeros((3,), dtype) if t0 is None else t0

    def body(carry, _):
        R, t = carry
        R2, t2, rn = gn_pnp_step(obj_pts, im_pts_norm, R, t, valid)
        return (R2, t2), rn

    (R, t), rnorms = jax.lax.scan(body, (R, t), None, length=iterations)
    return R, t, rnorms


def normalize_image_points(im_pts: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """K^-1 applied to pixel points (SolvePnP.cpp:311-313)."""
    return jnp.stack(
        [(im_pts[..., 0] - intr.cx) / intr.fx, (im_pts[..., 1] - intr.cy) / intr.fy],
        axis=-1,
    )


class RansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray  # (K,) bool
    num_inliers: jnp.ndarray  # () int32
    best_hypothesis: jnp.ndarray  # () int32


def ransac_pnp(
    key: jax.Array,
    obj_pts: jnp.ndarray,  # (K, 3)
    im_pts_norm: jnp.ndarray,  # (K, 2) normalized-plane points
    valid: jnp.ndarray,  # (K,) bool
    num_hypotheses: int = 64,
    sample_size: int = 4,  # 4 points over-determine the 6-DoF GN solve and
    # keep the all-inlier sample probability workable at low match counts
    inlier_thresh: float = 0.01,  # normalized-plane units (~5px at fx=500)
    hypothesis_iters: int = 4,
    refine_iters: int = 5,
    R0=None,
    t0=None,
) -> RansacResult:
    """TPU-parallel RANSAC PnP: every hypothesis is a vmapped GN solve from a
    random minimal subset; scoring is one batched residual pass; the winner
    is refined on its inliers. Functional equivalent of cv::solvePnPRansac
    with an initial guess (PnPOdometry.cpp:571)."""
    k = obj_pts.shape[0]
    dtype = obj_pts.dtype
    R0 = jnp.eye(3, dtype=dtype) if R0 is None else R0
    t0 = jnp.zeros((3,), dtype) if t0 is None else t0

    # random subsets biased to valid points: weight invalid with -inf scores
    keys = jax.random.split(key, num_hypotheses)

    def one_hypothesis(k_i):
        scores = jax.random.uniform(k_i, (k,)) + jnp.where(valid, 1.0, -1.0)
        _, sel = jax.lax.top_k(scores, sample_size)
        sub_valid = jnp.zeros((k,), bool).at[sel].set(True) & valid
        R, t, _ = gn_pnp(obj_pts, im_pts_norm, sub_valid, R0, t0, hypothesis_iters)
        r, _ = normalized_residuals(obj_pts, im_pts_norm, R, t, valid)
        err = jnp.linalg.norm(r, axis=-1)
        inl = valid & (err < inlier_thresh)
        return R, t, jnp.sum(inl.astype(jnp.int32))

    Rs, ts, counts = jax.vmap(one_hypothesis)(keys)
    best = jnp.argmax(counts)
    R_b = Rs[best]
    t_b = ts[best]
    r, _ = normalized_residuals(obj_pts, im_pts_norm, R_b, t_b, valid)
    inliers = valid & (jnp.linalg.norm(r, axis=-1) < inlier_thresh)
    R_f, t_f, _ = gn_pnp(obj_pts, im_pts_norm, inliers, R_b, t_b, refine_iters)
    return RansacResult(
        R=R_f, t=t_f, inliers=inliers, num_inliers=counts[best], best_hypothesis=best
    )


# ----------------------------------------------------------------------
# Chessboard front-end (SolvePnP's input path)
# ----------------------------------------------------------------------


def chessboard_object_points(rows: int = 6, cols: int = 9, square: float = 1.0):
    """The planar chessboard model the reference builds for its 9x6 board
    (`getChessBoardPts`, SolvePnP.cpp:97-140). z=0 plane, row-major corners."""
    import numpy as np

    ys, xs = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    return np.stack(
        [xs.reshape(-1) * square, ys.reshape(-1) * square, np.zeros(rows * cols)], -1
    ).astype(np.float32)


def find_chessboard(gray_u8, rows: int = 6, cols: int = 9):
    """Host-side chessboard corner detection via OpenCV (the reference uses
    cv::findChessboardCorners, SolvePnP.cpp:108). Returns (N,2) float pixel
    corners or None. Detection is a host/ingest concern, not a TPU hot path.
    """
    import cv2
    import numpy as np

    found, corners = cv2.findChessboardCorners(gray_u8.astype("uint8"), (cols, rows))
    if not found:
        return None
    return np.asarray(corners).reshape(-1, 2)
