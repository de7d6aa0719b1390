"""Unit tests: matmul-gather vs take-gather, undistortion, subgradient oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from rgbd_odometry_tpu.ops.interp import gather_bilinear, gather_floor
from rgbd_odometry_tpu.ops.matmul_gather import gather_channels_mm


def test_matmul_gather_floor_exact(rng):
    img = jnp.asarray(rng.uniform(0, 255, (48, 64)).astype(np.float32))
    u = jnp.asarray(rng.uniform(-2, 66, 200).astype(np.float32))
    v = jnp.asarray(rng.uniform(-2, 50, 200).astype(np.float32))
    a = np.asarray(gather_floor(img, u, v))
    b = np.asarray(
        gather_channels_mm(img[None], u, v, bilinear=False, precision=jax.lax.Precision.HIGHEST)[0]
    )
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_matmul_gather_bilinear_matches_take(rng):
    img = jnp.asarray(rng.uniform(0, 255, (48, 64)).astype(np.float32))
    u = jnp.asarray(rng.uniform(0, 63, 200).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 47, 200).astype(np.float32))
    a = np.asarray(gather_bilinear(img, u, v))
    b = np.asarray(
        gather_channels_mm(img[None], u, v, bilinear=True, precision=jax.lax.Precision.HIGHEST)[0]
    )
    np.testing.assert_allclose(b, a, atol=1e-2)


def test_matmul_gather_multichannel(rng):
    imgs = jnp.asarray(rng.uniform(0, 10, (3, 32, 40)).astype(np.float32))
    u = jnp.asarray(rng.uniform(0, 39, 64).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 31, 64).astype(np.float32))
    out = gather_channels_mm(imgs, u, v, bilinear=True, precision=jax.lax.Precision.HIGHEST)
    assert out.shape == (3, 64)
    for c in range(3):
        ref = np.asarray(gather_bilinear(imgs[c], u, v))
        np.testing.assert_allclose(np.asarray(out[c]), ref, atol=1e-3)


def test_undistort_roundtrip():
    """Plumb-bob undistortion map vs cv2.initUndistortRectifyMap."""
    import cv2

    from rgbd_odometry_tpu.config import CameraConfig
    from rgbd_odometry_tpu.core.camera import remap_bilinear, undistort_map

    cam = CameraConfig(
        width=64, height=48, fx=60.0, fy=60.0, cx=31.5, cy=23.5,
        distortion=(0.15, -0.1, 0.001, -0.002, 0.05),
    )
    grid = np.asarray(undistort_map(cam))
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    map_x, map_y = cv2.initUndistortRectifyMap(
        K, np.asarray(cam.distortion), None, K, (cam.width, cam.height), cv2.CV_32FC1
    )
    np.testing.assert_allclose(grid[..., 0], map_x, atol=1e-3)
    np.testing.assert_allclose(grid[..., 1], map_y, atol=1e-3)
    # remap runs and keeps shape
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (48, 64)).astype(np.float32))
    out = remap_bilinear(img, jnp.asarray(grid))
    assert out.shape == (48, 64)


def test_subgradient_iteration_matches_numpy_oracle(rng):
    """One sub-gradient iteration vs an independent numpy re-derivation of
    the reference equations (/root/reference/src/SolveDVO.cpp:619-1017):
    floor gather, w=6/(6+r^2/.25), quirk Jacobian, g=J^T W eps (+L2 reg),
    d=(1-b)g+bd, psi=-step*P*d, trust projection, SE3 exp, right-compose.
    """
    from rgbd_odometry_tpu.config import SolverConfig
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core import geometry as geo
    from rgbd_odometry_tpu.solvers import edge_dvo

    K = 64
    h, w = 40, 56
    dt = rng.uniform(0, 20, (h, w)).astype(np.float32)
    dgx = rng.uniform(-1, 1, (h, w)).astype(np.float32)
    dgy = rng.uniform(-1, 1, (h, w)).astype(np.float32)
    pts = np.stack(
        [rng.uniform(-0.5, 0.5, K), rng.uniform(-0.4, 0.4, K), rng.uniform(1.5, 3.0, K)], -1
    ).astype(np.float32)
    valid = np.ones(K, bool)
    fx = fy = 50.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0

    intr = Intrinsics(jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy))
    cfg = SolverConfig(gather_mode="take", rotationize=False)  # pure reference math
    ref = edge_dvo.RefLevel(
        pts3d=jnp.asarray(pts), uv=jnp.zeros((K, 2), jnp.float32),
        valid=jnp.asarray(valid), count=jnp.asarray(K, jnp.int32),
    )
    now = edge_dvo.NowLevel(
        dt=jnp.asarray(dt), dgx=jnp.asarray(dgx), dgy=jnp.asarray(dgy),
        edges=jnp.zeros((h, w), bool), scale=jnp.float32(1.0),
        chans=jnp.stack([jnp.asarray(dt), jnp.asarray(dgx), jnp.asarray(dgy)]),
    )
    R1, t1, diag = edge_dvo.run_level(
        ref, now, intr, jnp.eye(3), jnp.zeros(3), cfg, n_iters=1
    )
    # run_level returns the BEST iterate = the initial pose for 1 iter; use
    # 2 iterations and compare the recorded energies + pose after iter 1
    R2, t2, diag2 = edge_dvo.run_level(
        ref, now, intr, jnp.eye(3), jnp.zeros(3), cfg, n_iters=2
    )

    # ---- numpy oracle, iteration 0 at identity ----
    xp = pts.copy()
    z = xp[:, 2]
    xn, yn = xp[:, 0] / z, xp[:, 1] / z
    u = fx * xn + cx
    v = fy * yn + cy
    vis = (u >= 0) & (u <= w) & (v >= 0) & (v <= h)
    ui = np.clip(np.floor(u).astype(int), 0, w - 1)
    vi = np.clip(np.floor(v).astype(int), 0, h - 1)
    eps = np.where(vis, dt[vi, ui], 0.0)
    wgt = np.where(vis, 6.0 / (6.0 + eps**2 / 0.25), 0.0)
    E0 = np.linalg.norm(eps)
    g0 = np.where(vis, dgx[vi, ui], 0.0)
    g1 = np.where(vis, dgy[vi, ui], 0.0)
    ga = np.stack([g0 * fx, g1 * fy, -(g0 * fx * xn + g1 * fy * yn)], -1)
    j_trans = -ga  # R = I
    hvec = np.stack([xn, yn, np.ones(K)], -1)
    j_rot = np.cross(ga, hvec)
    J = np.where(vis[:, None], np.concatenate([j_trans, j_rot], -1), 0.0)
    g = (J * (wgt * eps)[:, None]).sum(0)
    # L2 reg at identity: log = 0, norm 0 -> no contribution
    d = 0.5 * g  # momentum from zero
    P = np.array([1, 1, 1, 0.5, 0.5, 0.5])
    psi = -9.0e-2 * P * d
    n = np.linalg.norm(psi)
    if n > 0.003:
        psi = psi * 0.003 / n
    Rx, tx = geo.se3_exp(jnp.asarray(psi, jnp.float32))
    R_expect = np.asarray(Rx)
    t_expect = np.asarray(tx)

    e_curve = np.asarray(diag2.energy)
    assert abs(e_curve[0] - E0) < 1e-2 * max(E0, 1)
    # pose after iteration 0 is what iteration 1's energy was evaluated at;
    # compare directly against the oracle's updated pose via solver internals
    J2, eps2, w2, vis2, E1, _ = edge_dvo._jacobian_residual(
        jnp.asarray(R_expect), jnp.asarray(t_expect), ref, now, intr, cfg
    )
    assert abs(e_curve[1] - float(E1)) < 1e-2 * max(float(E1), 1)
