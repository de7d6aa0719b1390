"""Legacy dense photometric DVO solver, TPU-native.

Rebuilds the reference's second odometry path — `RGBDOdometry` +
`EPoseEstimator` + `PyramidalStorage`
(/root/reference/src/RGBDOdometry.cpp, src/EPoseEstimator.cpp,
src/PyramidalStorage.cpp) — with its structure preserved:

  * semi-dense point selection by image-gradient threshold at the *reference*
    frame (const_gradientThreshold=5, RGBDOdometry.cpp:32,:466),
  * photometric Jacobian precomputed ONCE per reference keyframe, reused for
    every incoming frame (`computeJacobianAllLevels`, :363-398) — the
    inverse-compositional trick that made the CPU path real-time,
  * Gauss-Newton on the fixed normal matrix A = J^T J with warp-and-difference
    residuals epsilon = I_ref - I_now(pi(T^-1 X)) (`computeEpsilon`,
    :602-700), update T <- T * exp(psi)^-1 (:566-579),
  * 3 iterations per level, coarse levels only (levels 3 then 2; level 0
    explicitly skipped as "not real time", :376,:162-164), early exit at
    ||eps|| < 200 (:555-556),
  * per-level cached {points, intensities, J, A} — `PyramidalStorage`'s role
    (include/PyramidalStorage.h:37-78) as a pytree.

Deviations from the reference, deliberate and documented:
  * the reference swaps image rows/cols in back-projection and sampling
    (X from row index against fx, :471-473 and :667-684) and its Jacobian
    table contains an apparent typo (tJ(0,xc) = fx*fx*invZ, :485 — gx is
    missing). We implement the standard Cremers-DVO analytic Jacobian in the
    consistent (x=col, y=row) convention instead; structure and constants
    match.
  * optional Huber-style robust weighting (BASELINE.json config 3) on top of
    the reference's unweighted least squares.

TPU design: fixed-capacity top-K points, one MXU matmul-gather per iteration
for intensity sampling, the 6x6 normal solve on precomputed A (factored once
per keyframe).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rgbd_odometry_tpu.config import PhotometricConfig
from rgbd_odometry_tpu.core import geometry as geo
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.ops.linalg6 import chol_solve6
from rgbd_odometry_tpu.ops.matmul_gather import gather_channels_mm

_PREC = jax.lax.Precision.HIGHEST


class PhotoRefLevel(NamedTuple):
    """Per-level reference cache: the `PyramidalStorage` equivalent."""

    pts3d: jnp.ndarray  # (K, 3) metres
    intensity: jnp.ndarray  # (K,) I_ref at the selected pixels
    J: jnp.ndarray  # (K, 6) photometric Jacobian at the ref pose
    A: jnp.ndarray  # (6, 6) = J^T J (plus tiny damping)
    valid: jnp.ndarray  # (K,) bool
    count: jnp.ndarray  # () int32


def extract_photo_ref_level(
    gray: jnp.ndarray,
    depth_mm: jnp.ndarray,
    intr: Intrinsics,
    k_max: int,
    cfg: PhotometricConfig,
) -> PhotoRefLevel:
    """Select gradient-rich pixels, back-project, precompute J and A.

    Selection: |gx| >= threshold (the reference tests the raw x-gradient
    only, RGBDOdometry.cpp:466) AND depth valid. Gradients are forward
    differences ([-1, 1] kernels, :423-428).
    """
    h, w = gray.shape
    # forward-difference gradients (kern [-1,1] / [-1,1]^T, :423-428)
    gx = jnp.pad(gray[:, 1:] - gray[:, :-1], ((0, 0), (0, 1)))
    gy = jnp.pad(gray[1:, :] - gray[:-1, :], ((0, 1), (0, 0)))
    sel = (gx >= cfg.gradient_threshold) & (depth_mm > cfg.min_depth_mm)
    flat = sel.reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))
    k_max = min(k_max, h * w)  # coarse levels can be smaller than the cap
    score, idx = jax.lax.top_k(flat.astype(jnp.float32), k_max)
    valid = score > 0.0
    ys = (idx // w).astype(gray.dtype)
    xs = (idx % w).astype(gray.dtype)
    z = jnp.where(valid, jnp.take(depth_mm.reshape(-1), idx), 1000.0) / 1000.0
    x3 = z * (xs - intr.cx) / intr.fx
    y3 = z * (ys - intr.cy) / intr.fy
    pts3d = jnp.stack([x3, y3, z], axis=-1)
    inten = jnp.where(valid, jnp.take(gray.reshape(-1), idx), 0.0)
    gxs = jnp.where(valid, jnp.take(gx.reshape(-1), idx), 0.0)
    gys = jnp.where(valid, jnp.take(gy.reshape(-1), idx), 0.0)

    # photometric Jacobian dr/dpsi at the ref pose for the update
    # T <- T exp(psi)^-1 (RGBDOdometry.cpp:579): T(psi)^-1 X = exp(psi) X',
    # so dX'/dv = +I, dX'/dw = -hat(X'), and with r = I_ref - I_now(pi(X')):
    # dr/dv = -(grad(I) A1), dr/dw = +cross(grad(I) A1, X')
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ga = jnp.stack(
        [
            gxs * intr.fx / zs,
            gys * intr.fy / zs,
            -(gxs * intr.fx * x3 / zs + gys * intr.fy * y3 / zs) / zs,
        ],
        axis=-1,
    )
    j_trans = -ga
    j_rot = jnp.cross(ga, pts3d)
    J = jnp.concatenate([j_trans, j_rot], axis=-1)
    J = jnp.where(valid[..., None], J, 0.0)
    A = jnp.einsum("ni,nj->ij", J, J, precision=_PREC)
    A = A + 1e-6 * jnp.trace(A) / 6.0 * jnp.eye(6, dtype=J.dtype)
    return PhotoRefLevel(pts3d=pts3d, intensity=inten, J=J, A=A, valid=valid, count=count)


def _snap(c, eps=2e-3):
    """Snap coordinates within eps of an integer onto it before flooring.

    The float32 back-project/reproject roundtrip perturbs an integer pixel
    coordinate by ~1e-4; raw floor() then falls one pixel short for half the
    points — and photometric points sit ON intensity gradients, so that
    off-by-one injects O(gradient) residuals at zero motion. (The reference
    is immune only because it computes in double, RGBDOdometry.cpp:653-668.)
    """
    r = jnp.round(c)
    return jnp.where(jnp.abs(c - r) < eps, r, c)


def _sample_now(gray: jnp.ndarray, u, v, mode: str, bilinear: bool = False):
    u = _snap(u)
    v = _snap(v)
    if mode == "mxu":
        return gather_channels_mm(gray[None], u, v, bilinear=bilinear, precision=_PREC)[0]
    if bilinear:
        from rgbd_odometry_tpu.ops.interp import gather_bilinear

        return gather_bilinear(gray, u, v)
    h, w = gray.shape
    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 1)
    return jnp.take(gray.reshape(-1), vi * w + ui)


def photometric_residual(ref: PhotoRefLevel, now_gray, intr: Intrinsics, R, t, cfg: PhotometricConfig):
    """epsilon_i = I_ref(p_i) - I_now(pi(R^T (X_i - t))), zero when warped out
    of frame (`computeEpsilon`, RGBDOdometry.cpp:602-700)."""
    h, w = now_gray.shape
    xp = jnp.einsum("kj,nk->nj", R, ref.pts3d - t, precision=_PREC)
    z = xp[..., 2]
    zinv = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = intr.fx * xp[..., 0] * zinv + intr.cx
    v = intr.fy * xp[..., 1] * zinv + intr.cy
    visible = (u >= 0) & (u < w) & (v >= 0) & (v < h) & ref.valid
    inow = _sample_now(now_gray, u, v, cfg.gather_mode, cfg.bilinear)
    eps = jnp.where(visible, ref.intensity - inow, 0.0)
    return eps, visible


def solve_level(
    ref: PhotoRefLevel,
    now_gray: jnp.ndarray,
    intr: Intrinsics,
    R0,
    t0,
    cfg: PhotometricConfig,
):
    """Fixed-count Gauss-Newton at one level (`gaussNewtonIterations`,
    RGBDOdometry.cpp:514-597): psi = A^-1 (-J^T W eps); T <- T exp(psi)^-1;
    early exit when ||eps|| < eps_norm_exit freezes the state."""

    def body(carry, _):
        R, t, done, best_e, best_R, best_t = carry
        eps, visible = photometric_residual(ref, now_gray, intr, R, t, cfg)
        enorm = jnp.linalg.norm(eps)
        # best-iterate tracking: the frozen-A scheme wanders once converged
        # (same guard the edge solver carries, SolveDVO.cpp:696-705)
        is_better = enorm <= best_e
        best_e = jnp.where(is_better, enorm, best_e)
        best_R = jnp.where(is_better, R, best_R)
        best_t = jnp.where(is_better, t, best_t)
        newly_done = enorm < cfg.eps_norm_exit
        if cfg.use_huber:
            # Huber weights on intensity residuals (BASELINE config 3)
            absr = jnp.abs(eps)
            wgt = jnp.where(absr <= cfg.huber_delta, 1.0, cfg.huber_delta / jnp.maximum(absr, 1e-9))
            wgt = jnp.where(visible, wgt, 0.0)
        else:
            wgt = visible.astype(eps.dtype)
        b = -jnp.einsum("nj,n->j", ref.J, wgt * eps, precision=_PREC)
        if cfg.reweight_normal_matrix:
            A = jnp.einsum("ni,nj->ij", ref.J * wgt[..., None], ref.J, precision=_PREC)
            A = A + 1e-6 * jnp.maximum(jnp.trace(A), 1.0) / 6.0 * jnp.eye(6, dtype=A.dtype)
        else:
            A = ref.A
        psi = chol_solve6(A, b)
        pn = jnp.linalg.norm(psi)
        psi = psi * jnp.where(pn > cfg.max_step, cfg.max_step / jnp.maximum(pn, 1e-30), 1.0)
        xR, xt = geo.se3_exp(psi)
        # T <- T * exp(psi)^-1  (RGBDOdometry.cpp:579)
        xRi, xti = geo.inverse(xR, xt)
        t_new = t + jnp.einsum("ij,j->i", R, xti, precision=_PREC)
        R_new = jnp.matmul(R, xRi, precision=_PREC)
        do = (~done) & (~newly_done)
        return (
            jnp.where(do, R_new, R),
            jnp.where(do, t_new, t),
            done | newly_done,
            best_e,
            best_R,
            best_t,
        ), enorm

    big = jnp.asarray(1e30, now_gray.dtype)
    (R, t, _, _, best_R, best_t), enorms = jax.lax.scan(
        body,
        (R0, t0, jnp.asarray(False), big, R0, t0),
        None,
        length=cfg.iterations_per_level,
    )
    return best_R, best_t, enorms


def solve_pyramid(
    ref_levels: Tuple[PhotoRefLevel, ...],
    now_gray_pyr: Tuple[jnp.ndarray, ...],
    intr: Intrinsics,
    cfg: PhotometricConfig,
    R0=None,
    t0=None,
):
    """Coarse-to-fine over `cfg.levels` (reference: 3 then 2; level 0 skipped
    for cost, RGBDOdometry.cpp:162-164,:376)."""
    dtype = now_gray_pyr[0].dtype
    R = jnp.eye(3, dtype=dtype) if R0 is None else R0
    t = jnp.zeros((3,), dtype) if t0 is None else t0
    history = {}
    for level in cfg.levels:
        if level >= len(now_gray_pyr):
            continue
        R, t, enorms = solve_level(
            ref_levels[level], now_gray_pyr[level], intr.at_level(level), R, t, cfg
        )
        history[level] = enorms
    return R, t, history


def extract_photo_ref(
    gray_pyr, depth_pyr, intr: Intrinsics, cfg: PhotometricConfig, max_points: Tuple[int, ...]
) -> Tuple[PhotoRefLevel, ...]:
    """`computeJacobianAllLevels` (RGBDOdometry.cpp:363-398) over all levels."""
    return tuple(
        extract_photo_ref_level(g, d, intr.at_level(lvl), max_points[lvl], cfg)
        for lvl, (g, d) in enumerate(zip(gray_pyr, depth_pyr))
    )


def warp_image(gray: jnp.ndarray, depth_mm: jnp.ndarray, intr: Intrinsics, R, t):
    """Dense warp render of a frame under (R, t) — `EPoseEstimator::warpImage`
    (/root/reference/src/EPoseEstimator.cpp:490-553) for visualization and
    debugging; bilinear MXU sampling, zeros where unmapped."""
    h, w = gray.shape
    ys = jnp.arange(h, dtype=gray.dtype)
    xs = jnp.arange(w, dtype=gray.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    z = depth_mm / 1000.0
    X = jnp.stack(
        [z * (gx - intr.cx) / intr.fx, z * (gy - intr.cy) / intr.fy, z], axis=-1
    ).reshape(-1, 3)
    xp = jnp.einsum("kj,nk->nj", R, X - t, precision=_PREC)
    zp = xp[..., 2]
    zinv = 1.0 / jnp.where(jnp.abs(zp) < 1e-12, 1e-12, zp)
    u = intr.fx * xp[..., 0] * zinv + intr.cx
    v = intr.fy * xp[..., 1] * zinv + intr.cy
    inside = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (zp > 0)
    vals = gather_channels_mm(gray[None], u, v, bilinear=True)[0]
    return jnp.where(inside, vals, 0.0).reshape(h, w)
