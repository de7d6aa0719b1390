"""Crossval of the sparse feature-VO geometry stages against OpenCV.

The reference's `PnPOdometry` delegates these stages to OpenCV itself
(`ransacTest` -> cv::findFundamentalMat, /root/reference/src/PnPOdometry.cpp:
502-535; `pnpEstimation` -> cv::solvePnPRansac, :537-592), so cv2 on
identical correspondence sets IS the executed upstream implementation.
The full 3-scene x 4-condition record lives in
validation/refbuild/pnp_crossval.py (PNP_CROSSVAL_r5.log: PnP pose errors
identical to cv2 to 3 decimals on every row; F-filter Jaccard >= 0.89).
"""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from rgbd_odometry_tpu.config import CameraConfig
from rgbd_odometry_tpu.core import geometry as geo
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.ops.epipolar import ransac_fundamental_filter
from rgbd_odometry_tpu.solvers import pnp

CAM = CameraConfig()
K_MAT = np.array([[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1.0]])


def _scene(seed=0, n=160, noise_px=0.0, outlier_frac=0.0):
    rng = np.random.default_rng(seed)
    P = np.stack(
        [rng.uniform(-1.2, 1.2, n), rng.uniform(-0.9, 0.9, n),
         rng.uniform(1.2, 3.0, n)], -1)
    psi = np.array([0.05, -0.03, 0.02, 0.03, -0.02, 0.015], np.float32)
    Rg, tg = geo.se3_exp(jnp.asarray(psi))
    Rg = np.asarray(Rg, np.float64)
    tg = np.asarray(tg, np.float64)
    Pn = (P - tg) @ Rg
    uv_ref = (P[:, :2] / P[:, 2:]) * [CAM.fx, CAM.fy] + [CAM.cx, CAM.cy]
    uv = (Pn[:, :2] / Pn[:, 2:]) * [CAM.fx, CAM.fy] + [CAM.cx, CAM.cy]
    if noise_px:
        uv = uv + rng.normal(0, noise_px, uv.shape)
    inlier_true = np.ones(n, bool)
    if outlier_frac:
        idx = rng.choice(n, int(n * outlier_frac), replace=False)
        uv[idx] = rng.uniform([0, 0], [CAM.width, CAM.height], (len(idx), 2))
        inlier_true[idx] = False
    return P, uv_ref, uv, inlier_true, Rg, tg


def _cv2_pose_to_ours(rvec, tvec):
    """cv2: X_cam = R X + t  ->  ours: X_cam = R^T (P - t)."""
    R_cv = cv2.Rodrigues(rvec)[0]
    return R_cv.T, (-R_cv.T @ tvec).ravel()


def test_fundamental_filter_matches_cv2_clean():
    """Clean data: both keep every correspondence (identical inlier sets)."""
    P, uv_ref, uv, inlier_true, _, _ = _scene()
    res = ransac_fundamental_filter(
        jax.random.PRNGKey(1), jnp.asarray(uv, jnp.float32),
        jnp.asarray(uv_ref, jnp.float32), jnp.ones((len(uv),), bool))
    _F, mask = cv2.findFundamentalMat(uv, uv_ref, cv2.FM_RANSAC, 3.0, 0.99)
    assert np.asarray(res.inliers).all()
    assert mask.ravel().astype(bool).all()


def test_fundamental_filter_matches_cv2_under_outliers():
    """25% outliers + 0.3px noise: near-total true-inlier recall, outliers
    rejected, and the surviving set agrees with cv2's (Jaccard)."""
    P, uv_ref, uv, inlier_true, _, _ = _scene(noise_px=0.3, outlier_frac=0.25)
    res = ransac_fundamental_filter(
        jax.random.PRNGKey(1), jnp.asarray(uv, jnp.float32),
        jnp.asarray(uv_ref, jnp.float32), jnp.ones((len(uv),), bool))
    ours = np.asarray(res.inliers)
    _F, mask = cv2.findFundamentalMat(uv, uv_ref, cv2.FM_RANSAC, 3.0, 0.99)
    cv = mask.ravel().astype(bool)
    n_true = inlier_true.sum()
    assert (ours & inlier_true).sum() >= 0.95 * n_true
    assert (ours & ~inlier_true).sum() <= 0.15 * (~inlier_true).sum()
    jac = (ours & cv).sum() / (ours | cv).sum()
    assert jac >= 0.85, jac


def test_ransac_pnp_matches_cv2_pose():
    """Same correspondences through ransac_pnp and cv2.solvePnPRansac: both
    reject the outliers and land on the same pose (identical inlier-set GN
    optimum; the crossval log shows equality to 3 decimals)."""
    P, _uv_ref, uv, inlier_true, Rg, tg = _scene(noise_px=0.3, outlier_frac=0.25)
    imn = pnp.normalize_image_points(jnp.asarray(uv, jnp.float32),
                                     Intrinsics.from_config(CAM))
    rp = pnp.ransac_pnp(jax.random.PRNGKey(2), jnp.asarray(P, jnp.float32),
                        imn, jnp.ones((len(uv),), bool))
    R_o = np.asarray(rp.R, np.float64)
    t_o = np.asarray(rp.t, np.float64)
    ok, rvec, tvec, inl = cv2.solvePnPRansac(
        P, uv, K_MAT, None, reprojectionError=5.0, confidence=0.99,
        flags=cv2.SOLVEPNP_ITERATIVE)
    assert ok
    R_c, t_c = _cv2_pose_to_ours(rvec, tvec)
    # both accurate vs exact GT
    assert np.linalg.norm(t_o - tg) < 0.004
    assert np.linalg.norm(t_c - tg) < 0.004
    # and mutually consistent (same optimum)
    assert np.linalg.norm(t_o - t_c) < 5e-4, np.linalg.norm(t_o - t_c)
    assert np.linalg.norm(
        cv2.Rodrigues(R_o @ R_c.T)[0]) < 5e-4
    # inlier sets agree
    cv_in = np.zeros(len(uv), bool)
    cv_in[inl.ravel()] = True
    ours_in = np.asarray(rp.inliers)
    jac = (ours_in & cv_in).sum() / (ours_in | cv_in).sum()
    assert jac >= 0.95, jac
