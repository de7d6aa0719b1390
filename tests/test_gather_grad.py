"""Unit tests for the derived-gradient bilinear gather and the strided
Gauss-Newton normal equations (round-2 perf work)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.core.pyramid import build_pyramid
from rgbd_odometry_tpu.core import geometry as geo
from rgbd_odometry_tpu.io.synthetic import render_pair
from rgbd_odometry_tpu.ops.matmul_gather import (
    gather_bilinear_mm,
    gather_bilinear_value_grad_mm,
)
from rgbd_odometry_tpu.solvers import edge_dvo


def _bilinear_np(img, u, v):
    h, w = img.shape
    u = np.clip(u, 0, w - 1)
    v = np.clip(v, 0, h - 1)
    j0 = np.floor(u).astype(int)
    i0 = np.floor(v).astype(int)
    j1 = np.minimum(j0 + 1, w - 1)
    i1 = np.minimum(i0 + 1, h - 1)
    fu, fv = u - j0, v - i0
    return (
        img[i0, j0] * (1 - fu) * (1 - fv)
        + img[i0, j1] * fu * (1 - fv)
        + img[i1, j0] * (1 - fu) * fv
        + img[i1, j1] * fu * fv
    )


def test_value_matches_bilinear_gather():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    u = rng.uniform(-2, 66, 300).astype(np.float32)
    v = rng.uniform(-2, 50, 300).astype(np.float32)
    val, gu, gv = gather_bilinear_value_grad_mm(jnp.asarray(img), jnp.asarray(u), jnp.asarray(v))
    ref = _bilinear_np(img.astype(np.float64), u.astype(np.float64), v.astype(np.float64))
    np.testing.assert_allclose(np.asarray(val), ref, rtol=1e-5, atol=1e-3)
    old = gather_bilinear_mm(jnp.asarray(img), jnp.asarray(u), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(val), np.asarray(old), rtol=1e-5, atol=1e-3)


def test_gradient_matches_finite_differences():
    """g_u, g_v are the exact partials of the bilinear interpolant: compare
    against central differences of the sampled surface at interior points
    away from cell boundaries (where the interpolant is smooth)."""
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    # keep fractional parts in [0.3, 0.7] so a +-0.05 probe stays in-cell
    u = (rng.integers(2, 60, 400) + rng.uniform(0.3, 0.7, 400)).astype(np.float32)
    v = (rng.integers(2, 44, 400) + rng.uniform(0.3, 0.7, 400)).astype(np.float32)
    val, gu, gv = gather_bilinear_value_grad_mm(jnp.asarray(img), jnp.asarray(u), jnp.asarray(v))
    h = 0.05
    fd_u = (_bilinear_np(img, u + h, v) - _bilinear_np(img, u - h, v)) / (2 * h)
    fd_v = (_bilinear_np(img, u, v + h) - _bilinear_np(img, u, v - h)) / (2 * h)
    np.testing.assert_allclose(np.asarray(gu), fd_u, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gv), fd_v, rtol=1e-3, atol=1e-2)


def test_gradient_zero_at_clamped_borders():
    img = jnp.asarray(np.arange(12.0, dtype=np.float32).reshape(3, 4) * 7.0)
    # right edge: u = W-1 -> j0 == j1 -> g_u == 0; bottom edge likewise
    val, gu, gv = gather_bilinear_value_grad_mm(
        img, jnp.asarray([3.0, 1.2]), jnp.asarray([1.2, 2.0])
    )
    assert float(gu[0]) == 0.0
    assert float(gv[1]) == 0.0


def test_floor_cgrads_bitwise_equals_channel_gather():
    """The derived floor-mode value+gradient gather must equal gathering the
    three precomputed channels BITWISE (f32 one-hot matmuls are exact and
    0.5x scaling commutes with rounding) — this is what lets the reference-
    parity mode use it without any oracle drift."""
    from rgbd_odometry_tpu.ops.gradient import central_gradient
    from rgbd_odometry_tpu.ops.matmul_gather import (
        gather_channels_mm,
        gather_floor_value_cgrads_mm,
    )

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (48, 64)).astype(np.float32))
    gx, gy = central_gradient(img)
    chans = jnp.stack([img, gx, gy])
    u = jnp.asarray(rng.uniform(-2, 66, 500).astype(np.float32))
    v = jnp.asarray(rng.uniform(-2, 50, 500).astype(np.float32))
    ref = gather_channels_mm(chans, u, v, bilinear=False)
    val, gxs, gys = gather_floor_value_cgrads_mm(img, u, v)
    np.testing.assert_array_equal(np.asarray(val), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(gxs), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(gys), np.asarray(ref[2]))


def test_windowed_edt_exact_within_radius():
    """edt_l2_squared_windowed == exact EDT wherever true distance <= radius,
    and never underestimates elsewhere."""
    from rgbd_odometry_tpu.ops.distance_transform import (
        edt_l2_squared,
        edt_l2_squared_windowed,
    )

    rng = np.random.default_rng(0)
    mask = rng.uniform(size=(48, 64)) < 0.01  # sparse edges -> big distances
    mask[20, 30] = True
    exact = np.asarray(edt_l2_squared(jnp.asarray(mask)))
    for radius in (4, 8, 16):
        win = np.asarray(edt_l2_squared_windowed(jnp.asarray(mask), radius))
        inside = exact <= radius * radius
        np.testing.assert_allclose(win[inside], exact[inside], rtol=1e-6)
        assert (win + 1e-6 >= exact).all()
    # degenerate: no edges at all -> finite overestimates, no NaN/inf
    empty = np.asarray(edt_l2_squared_windowed(jnp.zeros((16, 16), bool), 4))
    assert np.isfinite(empty).all()


def test_gauss_newton_windowed_profile_accuracy():
    """The production profile (edt_window + unnormalized pixel-unit DT)
    recovers pose as well as the exact-EDT default."""
    cam = CameraConfig(width=160, height=120, fx=176.0, fy=176.0, cx=79.5, cy=59.5)
    intr = Intrinsics.from_config(cam)
    psi = np.array([0.012, -0.008, 0.006, 0.004, -0.005, 0.003], np.float32)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=0)
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 2)
    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), 2)
    cfg = SolverConfig(
        method="gauss_newton",
        iterations=(15, 6),
        edt_window=16,
        normalize_dt=False,
    )
    feats = edge_dvo.extract_ref_features(ref.gray, ref.depth, intr, cfg, (4096, 1024))
    tgts = edge_dvo.prepare_now_targets(now.gray, cfg)
    R, t, _ = edge_dvo.solve_pyramid(feats, tgts, intr, cfg)
    R_gt, t_gt = geo.se3_exp(jnp.asarray(psi))
    assert float(jnp.linalg.norm(t - t_gt)) < 0.02
    assert float(jnp.linalg.norm(R - R_gt)) < 0.02


def test_deferred_accept_lm_matches_standard_and_survives_rejects():
    """Deferred-accept LM: identical pose recovery to standard LM on clean
    scenes (all-accept regime is step-for-step the same math), and still
    converges when proposals get rejected (tiny initial damping + huge
    trust region force early overshoots)."""
    import dataclasses

    cam = CameraConfig(width=160, height=120, fx=176.0, fy=176.0, cx=79.5, cy=59.5)
    intr = Intrinsics.from_config(cam)
    psi = np.array([0.012, -0.008, 0.006, 0.004, -0.005, 0.003], np.float32)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=0)
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 2)
    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), 2)
    R_gt, t_gt = geo.se3_exp(jnp.asarray(psi))

    base = SolverConfig(method="gauss_newton", iterations=(15, 6), lm_jacobian_stride=8)
    outs = {}
    for deferred in (False, True):
        cfg = dataclasses.replace(base, lm_deferred_accept=deferred)
        feats = edge_dvo.extract_ref_features(ref.gray, ref.depth, intr, cfg, (4096, 1024))
        tgts = edge_dvo.prepare_now_targets(now.gray, cfg)
        R, t, diags = edge_dvo.solve_pyramid(feats, tgts, intr, cfg)
        outs[deferred] = (np.asarray(R), np.asarray(t))
        assert float(jnp.linalg.norm(t - t_gt)) < 0.02
        # full-resolution diagnostics contract holds in both modes
        assert diags[0].final_epsilons.shape[0] == 4096
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=2e-5)

    # reject-heavy regime: near-zero damping + wide trust region overshoots,
    # the deferred verdict must revert and recover
    wild = dataclasses.replace(
        base, lm_deferred_accept=True, lm_damping=1e-9, lm_trust_region=0.5
    )
    feats = edge_dvo.extract_ref_features(ref.gray, ref.depth, intr, wild, (4096, 1024))
    tgts = edge_dvo.prepare_now_targets(now.gray, wild)
    R, t, _ = edge_dvo.solve_pyramid(feats, tgts, intr, wild)
    assert np.isfinite(np.asarray(t)).all()
    assert float(jnp.linalg.norm(t - t_gt)) < 0.05


@pytest.mark.parametrize("jstride", [1, 4])
def test_gauss_newton_recovers_pose_with_jacobian_stride(jstride):
    """The strided normal equations must not change what the solver finds:
    same synthetic scene, pose error within the usual LM bound either way,
    and full-resolution diagnostics regardless of stride."""
    cam = CameraConfig(width=160, height=120, fx=176.0, fy=176.0, cx=79.5, cy=59.5)
    intr = Intrinsics.from_config(cam)
    psi = np.array([0.012, -0.008, 0.006, 0.004, -0.005, 0.003], np.float32)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=0)
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 2)
    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), 2)
    cfg = SolverConfig(
        method="gauss_newton", iterations=(15, 6), lm_jacobian_stride=jstride
    )
    feats = edge_dvo.extract_ref_features(ref.gray, ref.depth, intr, cfg, (4096, 1024))
    tgts = edge_dvo.prepare_now_targets(now.gray, cfg)
    R, t, diags = edge_dvo.solve_pyramid(feats, tgts, intr, cfg)
    R_gt, t_gt = geo.se3_exp(jnp.asarray(psi))
    assert float(jnp.linalg.norm(t - t_gt)) < 0.02
    assert float(jnp.linalg.norm(R - R_gt)) < 0.02
    # diagnostics are full-resolution: residual vector sized to the full
    # capacity and visibility counted over all valid points
    fin = diags[0]
    assert fin.final_epsilons.shape[0] == 4096
    assert 0.5 < float(fin.visible_ratio) <= 1.0
    assert float(fin.best_energy) > 0.0
