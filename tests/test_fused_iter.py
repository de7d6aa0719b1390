"""Pallas fused GN-iteration kernel vs the XLA einsum path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
from rgbd_odometry_tpu.core import geometry as geo
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.core.pyramid import build_pyramid
from rgbd_odometry_tpu.io.synthetic import render_pair
from rgbd_odometry_tpu.pallas.fused_iter import fused_gn_terms
from rgbd_odometry_tpu.solvers import edge_dvo


def _setup():
    cam = CameraConfig(width=160, height=120, fx=176.0, fy=176.0, cx=79.5, cy=59.5)
    intr = Intrinsics.from_config(cam)
    psi = np.array([0.012, -0.008, 0.006, 0.004, -0.005, 0.003], np.float32)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=0)
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 1)
    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), 1)
    # the kernel implements the production semantics: pixel-unit DT,
    # interpolant gradients, textbook Jacobian, pixel-sigma weights
    cfg = SolverConfig(
        method="gauss_newton", normalize_dt=False, gn_gradient_mode="interpolant"
    )
    feats = edge_dvo.extract_ref_level(ref.gray[0], ref.depth[0], intr, 1024, cfg)
    tgts = edge_dvo.prepare_now_level(now.gray[0], cfg)
    return intr, cfg, feats, tgts


def test_fused_kernel_matches_xla_path():
    intr, cfg, ref, now = _setup()
    R0, t0 = geo.se3_exp(
        jnp.asarray([0.003, -0.002, 0.001, 0.002, 0.001, -0.002], jnp.float32)
    )
    J, eps, wgt, visible, energy, vis_ratio = edge_dvo._jacobian_residual(
        R0, t0, ref, now, intr, cfg
    )
    Jw = J * wgt[..., None]
    H_x = jnp.einsum("ni,nj->ij", Jw, J)
    g_x = jnp.einsum("nj,n->j", Jw, eps)

    H_p, g_p, e_p, nv_p = fused_gn_terms(
        R0,
        t0,
        ref.pts3d,
        ref.valid,
        now.chans[0],
        float(intr.fx),
        float(intr.fy),
        float(intr.cx),
        float(intr.cy),
        sigma2_px=cfg.gn_weight_sigma2_px,
        k_block=512,
        interpret=jax.default_backend() == "cpu",
    )
    # bf16 row-mixes + different reduction orders: agreement to ~1% relative
    # (entries span 1e3..1e6; near-zero entries get a scale-relative atol)
    H_x, g_x = np.asarray(H_x), np.asarray(g_x)
    np.testing.assert_allclose(
        np.asarray(H_p), H_x, rtol=1e-2, atol=1e-3 * np.abs(H_x).max()
    )
    np.testing.assert_allclose(
        np.asarray(g_p), g_x, rtol=1e-2, atol=1e-3 * np.abs(g_x).max()
    )
    np.testing.assert_allclose(float(e_p), float(energy), rtol=1e-3)
    assert int(nv_p) == int(np.asarray(visible).sum())
