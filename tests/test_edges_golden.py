"""Golden tests for Canny + distance transform against OpenCV.

The reference's numerics flow through cv::Canny and cv::distanceTransform
(/root/reference/src/SolveDVO.cpp:1705-1712); these tests pin our TPU-native
implementations to OpenCV outputs on synthetic imagery — the test pyramid the
reference never had (SURVEY.md section 4).
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_odometry_tpu.ops.canny import canny
from rgbd_odometry_tpu.ops.distance_transform import (
    distance_transform_of_edges,
    edt_l2,
    normalize_minmax,
)
from rgbd_odometry_tpu.ops.gradient import central_gradient, sobel3


def _synthetic_scene(rng, h=120, w=160):
    """Piecewise-constant blocks + circles: strong clean edges like indoor TUM
    scenes, without the noise that makes NMS tie-breaking chaotic."""
    img = np.full((h, w), 40, np.uint8)
    img[20:70, 30:90] = 160
    img[50:100, 80:140] = 90
    cv2.circle(img, (120, 40), 22, 210, -1)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    return img


def test_sobel_matches_opencv(rng):
    img = _synthetic_scene(rng).astype(np.float32)
    gx_cv = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3, borderType=cv2.BORDER_REPLICATE)
    gy_cv = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3, borderType=cv2.BORDER_REPLICATE)
    gx, gy = sobel3(jnp.asarray(img), border="replicate")
    np.testing.assert_allclose(np.asarray(gx), gx_cv, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy), gy_cv, atol=1e-3)


def test_central_gradient_matches_filter2d(rng):
    img = rng.uniform(0, 255, (64, 80)).astype(np.float32)
    kx = np.array([[0, 0, 0], [-0.5, 0, 0.5], [0, 0, 0]], np.float32)
    ky = kx.T.copy()
    gx_cv = cv2.filter2D(img, cv2.CV_32F, kx)
    gy_cv = cv2.filter2D(img, cv2.CV_32F, ky)
    gx, gy = central_gradient(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(gx), gx_cv, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), gy_cv, atol=1e-4)


def test_canny_matches_opencv():
    """BIT-EXACT vs cv2.Canny — no tolerance. Early rounds carried a <2e-3
    mismatch allowance here; a 200-image randomized bisect (2026-08-21,
    smooth fields / raw white noise / noisy blocks / textured gradients,
    plus an exact-int64 reimplementation of OpenCV's NMS+BFS as a referee)
    measured ZERO divergent pixels on every image: the float32 NMS emulation
    (ops/canny._nms docstring) is exact in practice and the hysteresis
    fixpoint is exactly BFS connectivity. Any future nonzero diff here is a
    real regression, not noise."""
    rng = np.random.default_rng(0)
    img = _synthetic_scene(rng)
    edges_cv = cv2.Canny(img, 150, 100, apertureSize=3, L2gradient=True) > 0
    edges = np.asarray(canny(jnp.asarray(img, jnp.float32), 100.0, 150.0))
    np.testing.assert_array_equal(edges, edges_cv)


def test_canny_natural_image():
    rng = np.random.default_rng(3)
    # smooth random field -> curvy edges exercising all NMS sectors
    img = cv2.GaussianBlur(rng.uniform(0, 255, (96, 128)).astype(np.float32), (0, 0), 4.0)
    img = cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    edges_cv = cv2.Canny(img, 150, 100, apertureSize=3, L2gradient=True) > 0
    edges = np.asarray(canny(jnp.asarray(img, jnp.float32), 100.0, 150.0))
    np.testing.assert_array_equal(edges, edges_cv)


def test_canny_exact_on_adversarial_imagery():
    """The NMS tie/sector-boundary cases that motivated the old tolerance:
    raw white noise (chaotic ties in every sector) and noisy step edges.
    Exactness holds on all of them (subset of the 200-image bisect; one
    shared shape keeps this one compile)."""
    import jax

    f = jax.jit(lambda g: canny(g, 100.0, 150.0))
    for seed in range(8):
        rng = np.random.default_rng(seed)
        if seed % 2:
            img = rng.integers(0, 256, (96, 128)).astype(np.uint8)
        else:
            img = np.full((96, 128), 40, np.uint8)
            img[20:60, 30:80] = 170
            img = (img + rng.normal(0, 8, (96, 128))).clip(0, 255).astype(np.uint8)
        edges_cv = cv2.Canny(img, 150, 100, apertureSize=3, L2gradient=True) > 0
        edges = np.asarray(f(jnp.asarray(img, jnp.float32)))
        np.testing.assert_array_equal(edges, edges_cv, err_msg=f"seed {seed}")


def test_canny_multi_bit_identical_to_per_level():
    """The level-fused Canny (one stacked NMS + one hysteresis fixpoint for
    the whole pyramid, ops/canny.canny_multi) must equal per-level canny()
    bit for bit — the guard rows reproduce each level's zero border."""
    from rgbd_odometry_tpu.ops.canny import canny_multi

    rng = np.random.default_rng(5)
    img = _synthetic_scene(rng)
    pyr = [jnp.asarray(img[:: 2**l, :: 2**l], jnp.float32) for l in range(4)]
    fused = canny_multi(tuple(pyr), 100.0, 150.0)
    for l, g in enumerate(pyr):
        single = canny(g, 100.0, 150.0)
        np.testing.assert_array_equal(
            np.asarray(fused[l]), np.asarray(single), err_msg=f"level {l}"
        )
    # and under vmap (the batched bench/production path)
    batch = tuple(jnp.stack([g, g + 0.0, jnp.flip(g, -1)]) for g in pyr)
    import jax

    fused_b = jax.vmap(lambda *gs: canny_multi(gs, 100.0, 150.0))(*batch)
    for l in range(4):
        np.testing.assert_array_equal(
            np.asarray(fused_b[l][2]),
            np.asarray(canny(jnp.flip(pyr[l], -1), 100.0, 150.0)),
        )


def test_edt_matches_opencv(rng):
    mask = np.zeros((60, 80), np.uint8)
    pts = rng.integers(0, [60, 80], size=(25, 2))
    mask[pts[:, 0], pts[:, 1]] = 1
    # OpenCV: distance to nearest zero pixel of src; src = 255 - edges*255
    src = (255 - mask * 255).astype(np.uint8)
    dt_cv = cv2.distanceTransform(src, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
    dt = np.asarray(edt_l2(jnp.asarray(mask > 0)))
    np.testing.assert_allclose(dt, dt_cv, atol=1e-3)


def test_edt_empty_and_full():
    # no edges: large finite values, no NaN/inf
    dt = np.asarray(edt_l2(jnp.zeros((16, 16), bool)))
    assert np.isfinite(dt).all() and (dt > 1e3).all()
    # all edges: exactly zero
    dt = np.asarray(edt_l2(jnp.ones((16, 16), bool)))
    np.testing.assert_allclose(dt, 0.0)


def test_full_edge_dt_chain_matches_opencv(rng):
    """The reference's exact per-level chain: Canny -> invert -> DT -> minmax
    normalize (/root/reference/src/SolveDVO.cpp:1705-1712)."""
    img = _synthetic_scene(rng)
    edges_cv = cv2.Canny(img, 150, 100, apertureSize=3, L2gradient=True)
    dt_cv = cv2.distanceTransform(255 - edges_cv, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
    dt_cv = cv2.normalize(dt_cv, None, 0.0, 255.0, cv2.NORM_MINMAX)

    edges = canny(jnp.asarray(img, jnp.float32), 100.0, 150.0)
    dt = np.asarray(distance_transform_of_edges(edges, normalize=True))
    # a handful of differing edge pixels shift the DT locally; compare robustly
    err = np.abs(dt - dt_cv)
    assert np.median(err) < 1.0
    assert err.mean() < 2.0


def test_normalize_minmax():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    y = np.asarray(normalize_minmax(x))
    assert y.min() == 0.0 and abs(y.max() - 255.0) < 1e-4
