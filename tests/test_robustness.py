"""Robustness validation on degraded scenes — the manipulations the
reference's bagManip harness envisions ("add noise, tinker with illumination
etc.", /root/reference/src/bagManip.cpp:1): procedural texture, sensor noise,
and illumination drift, all with exact ground-truth poses."""

import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
from rgbd_odometry_tpu.core import geometry as geo
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.core.pyramid import build_pyramid
from rgbd_odometry_tpu.io.synthetic import Degradations, degrade_frame, render_pair
from rgbd_odometry_tpu.solvers import edge_dvo

CAM = CameraConfig(width=160, height=120, fx=176.0, fy=176.0, cx=79.5, cy=59.5)
PSI = np.array([0.012, -0.008, 0.006, 0.004, -0.005, 0.003], np.float32)


def _align(degrade, seed=0, levels=2, method="gauss_newton"):
    (rg, rd), (ng, nd), (R_gt, t_gt) = render_pair(CAM, PSI, seed=seed, degrade=degrade)
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), levels)
    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), levels)
    intr = Intrinsics.from_config(CAM)
    cfg = SolverConfig(method=method, iterations=(15, 8))
    R, t, diags = edge_dvo.align_pair(
        ref.gray, ref.depth, now.gray, intr, cfg, max_points=(4096, 1024)
    )
    return (
        float(jnp.linalg.norm(t - jnp.asarray(t_gt, t.dtype))),
        float(jnp.linalg.norm(R - jnp.asarray(R_gt, R.dtype))),
    )


def test_degradations_change_the_images():
    clean = render_pair(CAM, PSI, seed=0)
    deg = Degradations(texture_amp=25.0, noise_sigma=2.0, illum_gain_per_frame=0.01)
    dirty = render_pair(CAM, PSI, seed=0, degrade=deg)
    assert not np.array_equal(clean[0][0], dirty[0][0])
    # texture is world-anchored: both frames carry it
    assert np.std(dirty[0][0] - clean[0][0]) > 1.0
    # noise is per-frame independent
    d0 = dirty[0][0] - clean[0][0]
    d1 = dirty[1][0] - clean[1][0]
    assert not np.array_equal(d0, d1)


def test_illumination_drift_accumulates():
    g = np.full((40, 50), 100.0, np.float32)
    d = np.full((40, 50), 1000.0, np.float32)
    deg = Degradations(illum_gain_per_frame=0.02, illum_bias_per_frame=1.0)
    g5, _ = degrade_frame(g, d, 5, deg)
    assert abs(float(np.median(g5)) - (100 * 1.1 + 5)) < 1.0


@pytest.mark.parametrize(
    "name,deg,tol_t",
    [
        ("clean", None, 0.01),
        ("texture", Degradations(texture_amp=25.0), 0.015),
        ("noise", Degradations(noise_sigma=2.0), 0.015),
        ("illum", Degradations(illum_gain_per_frame=0.05), 0.015),
        (
            "all",
            Degradations(
                texture_amp=20.0, noise_sigma=1.5, illum_gain_per_frame=0.03
            ),
            0.02,
        ),
    ],
)
def test_edge_dvo_recovers_pose_under_degradation(name, deg, tol_t):
    """Edge alignment is intensity-threshold based, so moderate noise and
    illumination drift must not break pose recovery (Canny gradients scale
    with gain; the DT geometry is unchanged)."""
    t_err, r_err = _align(deg)
    assert t_err < tol_t, f"{name}: t_err {t_err}"
    assert r_err < 2 * tol_t, f"{name}: r_err {r_err}"


def test_depth_noise_degrades_gracefully():
    t_err, r_err = _align(Degradations(depth_noise_mm=10.0))
    assert t_err < 0.03
    assert r_err < 0.03
