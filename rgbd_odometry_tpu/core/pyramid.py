"""Image-pyramid construction and frame preprocessing.

Replaces the reference's ingest-side pyramid building
(/root/reference/src/camTopic2PublisherPyD.cpp:339-347: 4 levels at scales
1/2..1/16 of VGA with INTER_NEAREST, gray via cvtColor) and its depth fixes
(float-m depth * 1000 -> uint16 mm with 0 -> 1, :72-80; the solver-side
zero-depth fix /root/reference/src/SolveDVO.cpp:512).

Nearest-neighbour downsampling by powers of two composes exactly
(cv::resize INTER_NEAREST at scale 1/2 picks src[2*i], so two successive
halvings equal one quartering), so building levels 1..3 from level 0 is
bit-identical to the reference building every level from VGA.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class FramePyramid(NamedTuple):
    """One RGB-D frame as per-level (gray, depth) tensors.

    TPU-native replacement for the RGBDFramePyd message
    (/root/reference/msg/RGBDFramePyd.msg:1-3): levels are a tuple (pytree) of
    static-shape arrays, fine (level 0) -> coarse.
      gray:  intensities 0..255 float
      depth: millimetres float (0 sanitized to 1)
    """

    gray: Tuple[jnp.ndarray, ...]
    depth: Tuple[jnp.ndarray, ...]

    @property
    def num_levels(self) -> int:
        return len(self.gray)


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.601 luma, matching cv::cvtColor RGB2GRAY
    (/root/reference/src/camTopic2PublisherPyD.cpp:347). Input (..., H, W, 3)
    in 0..255; output rounded to integral values like the 8-bit reference."""
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=rgb.dtype)
    gray = jnp.einsum("...c,c->...", rgb, w)
    return jnp.round(gray)


def sanitize_depth(depth_mm: jnp.ndarray) -> jnp.ndarray:
    """Replace exact-zero (invalid) depth with 1 mm.

    Reference: :76-78 of camTopic2PublisherPyD.cpp and SolveDVO.cpp:512 — a
    1 mm depth back-projects essentially to the camera centre and is then
    rejected by the >100 mm point-selection predicate (SolveDVO.cpp:1251).
    """
    return jnp.where(depth_mm == 0, jnp.ones_like(depth_mm), depth_mm)


def downsample_nearest(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """INTER_NEAREST downsampling by an integer power-of-two factor:
    out[i, j] = in[factor*i, factor*j] (cv::resize nearest semantics)."""
    return img[..., ::factor, ::factor]


def build_pyramid(
    gray0: jnp.ndarray, depth0_mm: jnp.ndarray, num_levels: int = 4
) -> FramePyramid:
    """Build a `num_levels` pyramid from level-0 gray (0..255) + depth (mm).

    Level 0 corresponds to the reference's half-VGA base resolution
    (/root/reference/src/camTopic2PublisherPyD.cpp:341-345).
    """
    depth0_mm = sanitize_depth(depth0_mm)
    grays = [gray0]
    depths = [depth0_mm]
    for _ in range(1, num_levels):
        grays.append(downsample_nearest(grays[-1], 2))
        depths.append(downsample_nearest(depths[-1], 2))
    return FramePyramid(gray=tuple(grays), depth=tuple(depths))


def pyramid_from_vga(
    rgb_vga: jnp.ndarray, depth_vga_mm: jnp.ndarray, num_levels: int = 4
) -> FramePyramid:
    """Full ingest path from a VGA RGB-D frame, matching the converter node:
    gray conversion, half-res base level, nearest pyramid, depth sanitize."""
    gray_vga = rgb_to_gray(rgb_vga) if rgb_vga.ndim >= 3 and rgb_vga.shape[-1] == 3 else rgb_vga
    return build_pyramid(
        downsample_nearest(gray_vga, 2),
        downsample_nearest(depth_vga_mm, 2),
        num_levels=num_levels,
    )
