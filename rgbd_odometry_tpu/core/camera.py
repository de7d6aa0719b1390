"""Camera intrinsics as a pytree, projection/back-projection, undistortion.

Replaces the reference's scattered intrinsics handling: per-level scaled K
(/root/reference/src/SolveDVO.cpp:231-235, 334-345), meshgrid back-projection
(/root/reference/src/EPoseEstimator.cpp:439-477), and the cv::undistort calls
in the ingest nodes (/root/reference/src/camTopic2PublisherPyD.cpp:86-117).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rgbd_odometry_tpu.config import CameraConfig


class Intrinsics(NamedTuple):
    """Pinhole intrinsics as a jittable pytree of scalars."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @staticmethod
    def from_config(cfg: CameraConfig, dtype=jnp.float32) -> "Intrinsics":
        return Intrinsics(
            fx=jnp.asarray(cfg.fx, dtype),
            fy=jnp.asarray(cfg.fy, dtype),
            cx=jnp.asarray(cfg.cx, dtype),
            cy=jnp.asarray(cfg.cy, dtype),
        )

    def at_level(self, level: int) -> "Intrinsics":
        """Intrinsics at pyramid `level`: every entry scaled by 2^-level.

        Matches the reference's scaleMatrix*K projection
        (/root/reference/src/SolveDVO.cpp:334-345: u = s*(fx*x+cx)) and the
        back-projection scaling tmpfx=1/(s*fx), tmpcx=s*cx (:231-235).
        """
        s = 2.0 ** (-level)
        return Intrinsics(self.fx * s, self.fy * s, self.cx * s, self.cy * s)

    def matrix(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )


def backproject(depth_mm: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """Dense back-projection of a (H, W) depth map (millimetres) to (H, W, 3)
    camera-frame points in metres.

    Depth mm->m conversion for numerical conditioning as in the reference
    (/root/reference/src/SolveDVO.cpp:248). Pixel (x=col, y=row):
    X = Z (x-cx)/fx, Y = Z (y-cy)/fy (:249-250).
    """
    h, w = depth_mm.shape[-2:]
    ys = jnp.arange(h, dtype=depth_mm.dtype)
    xs = jnp.arange(w, dtype=depth_mm.dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    z = depth_mm / 1000.0
    x = z * (grid_x - intr.cx) / intr.fx
    y = z * (grid_y - intr.cy) / intr.fy
    return jnp.stack([x, y, z], axis=-1)


def backproject_points(uv: jnp.ndarray, depth_mm: jnp.ndarray, intr: Intrinsics) -> jnp.ndarray:
    """Back-project sparse pixels: uv (..., 2) [x, y] + depth (...,) mm -> (..., 3) m."""
    z = depth_mm / 1000.0
    x = z * (uv[..., 0] - intr.cx) / intr.fx
    y = z * (uv[..., 1] - intr.cy) / intr.fy
    return jnp.stack([x, y, z], axis=-1)


def project(points: jnp.ndarray, intr: Intrinsics, eps: float = 1e-12) -> jnp.ndarray:
    """Project (..., 3) camera-frame points (m) to (..., 2) pixels [u, v].

    Dehomogenize then apply K — the reference's scaleMatrix*K*dehom
    (/root/reference/src/SolveDVO.cpp:334-345); level scaling comes from using
    `Intrinsics.at_level`.
    """
    z = points[..., 2]
    z_inv = 1.0 / jnp.where(jnp.abs(z) < eps, eps, z)
    u = intr.fx * points[..., 0] * z_inv + intr.cx
    v = intr.fy * points[..., 1] * z_inv + intr.cy
    return jnp.stack([u, v], axis=-1)


def transform_points(R: jnp.ndarray, t: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply the reference's warp X' = R^T (X - t)
    (/root/reference/src/SolveDVO.cpp:330): (cR, cT) maps ref->now as the
    *pose of now in ref*, so points move by the inverse."""
    return jnp.einsum("...ji,...nj->...ni", R, pts - t[..., None, :])


def undistort_map(cfg: CameraConfig, dtype=jnp.float32):
    """Precompute the plumb-bob undistortion sampling grid (H, W, 2) [x, y].

    Equivalent of cv::undistort in the ingest nodes
    (/root/reference/src/camTopic2PublisherPyD.cpp:86-117): for each output
    pixel, the distorted source location to sample (bilinear).
    With zero distortion this is the identity grid.
    """
    k1, k2, p1, p2, k3 = cfg.distortion
    ys = jnp.arange(cfg.height, dtype=dtype)
    xs = jnp.arange(cfg.width, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    xn = (gx - cfg.cx) / cfg.fx
    yn = (gy - cfg.cy) / cfg.fy
    r2 = xn * xn + yn * yn
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    x_d = xn * radial + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
    y_d = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
    map_x = x_d * cfg.fx + cfg.cx
    map_y = y_d * cfg.fy + cfg.cy
    return jnp.stack([map_x, map_y], axis=-1)


def remap_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear remap of (H, W) image with sampling grid (H, W, 2) [x, y]."""
    h, w = img.shape[-2:]
    x = jnp.clip(grid[..., 0], 0.0, w - 1.0)
    y = jnp.clip(grid[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = x - x0.astype(img.dtype)
    wy = y - y0.astype(img.dtype)
    flat = img.reshape(img.shape[:-2] + (h * w,))

    def gat(yy, xx):
        return jnp.take(flat, yy * w + xx, axis=-1)

    top = gat(y0, x0) * (1 - wx) + gat(y0, x1) * wx
    bot = gat(y1, x0) * (1 - wx) + gat(y1, x1) * wx
    return top * (1 - wy) + bot * wy
