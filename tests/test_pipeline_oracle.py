"""Full-chain pipeline oracle: cv2-native numerics from raw frames to pose.

`test_subgradient_oracle.py` proves the 50-iteration optimizer loop against a
float64 oracle, but it feeds the *device-produced* DT and gradients into that
oracle — so the frame-preparation chain Canny -> invert -> EDT -> min-max
normalize -> +-0.5 central gradients -> point selection -> back-projection
(/root/reference/src/SolveDVO.cpp:1740-1799 feeding :619-1017) was only ever
verified stage-by-stage against OpenCV, never as a *composition*.

This test closes that gap with an oracle that never touches the device
pipeline: starting from raw synthetic gray/depth frames it runs the
reference's own OpenCV calls — `cv2.Canny(150, 100, apertureSize=3,
L2gradient=True)` (:1705), `cv2.distanceTransform(DIST_L2, DIST_MASK_PRECISE)`
on the inverted edge map (:1708-1712), 0..255 min-max normalization (:1713),
`cv2.filter2D` with the +-0.5 central-difference kernels (:1725-1728) — in
float64, selects edge ∧ depth>100mm points (:1251), back-projects them with
the per-level intrinsics (:231-235), and drives the float64 loop oracle
coarse-to-fine exactly like `solvePyramidalIterations` (:2096-2104). The
device's `align_pair` composition must then match iteration by iteration:
per-level energy curves, per-iteration pose trajectories, best-iterate
bookkeeping, and the final pose.

Preconditions asserted (not assumed) per scene/level:
  * the device Canny equals cv2.Canny bit-exactly (else pixel-level DT
    differences would be a measurement artifact, not a parity signal),
  * the selected point SET (pixel coordinates) is identical,
  * the edge census stays below the point capacity (so top-k is a no-op
    reordering and both sides solve over the same set).

Tolerances and the iteration budget: the only numeric daylight left is the
DT itself — cv2's float32 DIST_MASK_PRECISE vs our float32 exact EDT round
differently at ~1.5e-5 absolute (measured; both exact algorithms). Under
that perturbation the sub-gradient loop is a *chaotic* map at the finest
level: a committed bifurcation analysis (2026-08, this file's history)
measured iteration-by-iteration agreement at ~3e-5 for all 50 iterations at
level 1 on every scene, and at level 0 strict agreement until a discrete
floor-pixel flip at iteration 27/30 on two of three scenes, after which the
trajectories separate — exactly as two runs of the *reference itself* would
under an EDT-library rounding change. The test therefore asserts the full
50-iteration schedule at level 1 and a 20-iteration strict prefix at level 0
(any compositional defect — wrong normalization constant, kernel, selection
predicate, level scaling — shows at iteration 0-2 with O(1)-O(100) error);
DT/gradient maps are additionally compared elementwise, which pins the frame
chain with no dynamics in the loop at all.
"""

from __future__ import annotations

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.core.pyramid import build_pyramid
from rgbd_odometry_tpu.io.synthetic import render_pair
from rgbd_odometry_tpu.solvers import edge_dvo

from oracle_subgradient import run_level_oracle

ITERS = (20, 50)  # per level; see module docstring on the level-0 prefix
NUM_LEVELS = 2
MAX_PTS = (4096, 1024)
CAM = CameraConfig(width=160, height=120, fx=176.0, fy=176.0, cx=79.5, cy=59.5)

SCENES = [
    # (seed, twist psi) — distinct geometry and motion per scene
    (1, np.array([0.010, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32)),
    (4, np.array([-0.012, 0.006, -0.004, -0.005, 0.003, 0.006], np.float32)),
    (8, np.array([0.004, 0.010, 0.008, 0.006, 0.002, -0.005], np.float32)),
]


# --------------------------------------------------------------------------
# The cv2/numpy float64 frame pipeline (the oracle side; no device code)
# --------------------------------------------------------------------------


def _np_pyramid(gray, depth_mm, num_levels):
    """INTER_NEAREST power-of-two pyramid + zero-depth -> 1mm sanitize
    (/root/reference/src/camTopic2PublisherPyD.cpp:72-80, 339-347)."""
    d0 = np.asarray(depth_mm, np.float64)
    d0 = np.where(d0 == 0.0, 1.0, d0)
    grays = [np.asarray(gray, np.float64)]
    depths = [d0]
    for _ in range(1, num_levels):
        grays.append(grays[-1][::2, ::2])
        depths.append(depths[-1][::2, ::2])
    return grays, depths


def _cv2_canny(gray_f64):
    u8 = np.round(gray_f64).astype(np.uint8)  # synthetic gray is integral
    return cv2.Canny(u8, 150, 100, apertureSize=3, L2gradient=True)


def _np_now_level(gray_f64):
    """cv2.Canny -> invert -> precise EDT -> min-max 0..255 -> filter2D +-0.5
    (/root/reference/src/SolveDVO.cpp:1705-1728), all float64 past the EDT."""
    edges = _cv2_canny(gray_f64)
    dt = cv2.distanceTransform(
        (255 - edges).astype(np.uint8), cv2.DIST_L2, cv2.DIST_MASK_PRECISE
    ).astype(np.float64)
    dmin, dmax = dt.min(), dt.max()
    dt = (dt - dmin) * (255.0 / max(dmax - dmin, 1e-12))
    kx = np.array([[0, 0, 0], [-0.5, 0, 0.5], [0, 0, 0]], np.float64)
    dgx = cv2.filter2D(dt, cv2.CV_64F, kx)
    dgy = cv2.filter2D(dt, cv2.CV_64F, kx.T.copy())
    return edges > 0, dt, dgx, dgy


def _np_ref_level(gray_f64, depth_f64, level):
    """Edge ∧ depth>100mm selection + float64 back-projection with the
    2^-level-scaled intrinsics (/root/reference/src/SolveDVO.cpp:1251,
    :224-265)."""
    edges = _cv2_canny(gray_f64) > 0
    sel = edges & (depth_f64 > 100.0)
    vs, us = np.nonzero(sel)
    s = 2.0 ** (-level)
    fx, fy, cx, cy = CAM.fx * s, CAM.fy * s, CAM.cx * s, CAM.cy * s
    z = depth_f64[vs, us] / 1000.0
    x = z * (us - cx) / fx
    y = z * (vs - cy) / fy
    pts3d = np.stack([x, y, z], axis=-1)
    return pts3d, us, vs, (fx, fy, cx, cy)


def _generic_start(scene):
    """Non-identity warm start keeping reprojections off pixel boundaries
    (same rationale as test_subgradient_oracle._generic_start)."""
    from rgbd_odometry_tpu.core import geometry as geo

    start_twist = jnp.asarray(
        [0.003, -0.002, 0.001, 0.002, 0.001, -0.002], jnp.float32
    ) * (1.0 + 0.3 * scene)
    return geo.se3_exp(start_twist)


@pytest.mark.parametrize("scene", range(len(SCENES)))
def test_full_chain_matches_cv2_oracle(scene):
    seed, psi = SCENES[scene]
    (rg, rd), (ng, nd), _ = render_pair(CAM, psi, seed=seed)

    # ---- oracle side: cv2/numpy float64 end to end -----------------------
    ref_grays, ref_depths = _np_pyramid(rg, rd, NUM_LEVELS)
    now_grays, _ = _np_pyramid(ng, nd, NUM_LEVELS)

    # ---- device side: the package's own full composition -----------------
    ref_pyr = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), NUM_LEVELS)
    now_pyr = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), NUM_LEVELS)
    # defaults == reference parity; per-level iteration budget per docstring
    cfg = SolverConfig(method="subgradient", iterations=ITERS)
    intr = Intrinsics.from_config(CAM)
    ref_levels = edge_dvo.extract_ref_features(
        ref_pyr.gray, ref_pyr.depth, intr, cfg, MAX_PTS
    )
    now_levels = edge_dvo.prepare_now_targets(now_pyr.gray, cfg)

    R_dev, t_dev = _generic_start(scene)
    R_orc = np.asarray(R_dev, np.float64)
    t_orc = np.asarray(t_dev, np.float64)

    for level in range(NUM_LEVELS - 1, -1, -1):
        g_ref, d_ref = ref_grays[level], ref_depths[level]
        g_now = now_grays[level]

        # precondition: device Canny == cv2.Canny bit-exactly on both frames
        for g, dev_edges in (
            (g_ref, None),
            (g_now, now_levels[level].edges),
        ):
            cv = _cv2_canny(g) > 0
            dev = (
                np.asarray(dev_edges)
                if dev_edges is not None
                else np.asarray(
                    edge_dvo.canny(
                        jnp.asarray(g, jnp.float32), cfg.canny_low, cfg.canny_high
                    )
                )
            )
            np.testing.assert_array_equal(
                dev, cv, err_msg=f"canny not bit-exact (scene {scene}, level {level})"
            )

        # oracle frame pipeline
        pts3d, us, vs, (fx, fy, cx, cy) = _np_ref_level(g_ref, d_ref, level)
        _, dt, dgx, dgy = _np_now_level(g_now)

        # chaos-free compositional pin: the device's normalized DT and its
        # central-difference gradients equal the cv2-native float64 chain
        # elementwise (float32-rounding daylight only, measured ~1.5e-5)
        np.testing.assert_allclose(
            np.asarray(now_levels[level].dt, np.float64), dt, atol=1e-3,
            err_msg=f"DT map diverged from cv2 chain (scene {scene}, level {level})",
        )
        np.testing.assert_allclose(
            np.asarray(now_levels[level].dgx, np.float64), dgx, atol=1e-3,
            err_msg=f"DT gradient-x diverged (scene {scene}, level {level})",
        )
        np.testing.assert_allclose(
            np.asarray(now_levels[level].dgy, np.float64), dgy, atol=1e-3,
            err_msg=f"DT gradient-y diverged (scene {scene}, level {level})",
        )

        # precondition: identical selected point set, below capacity
        ref_l = ref_levels[level]
        n_dev = int(ref_l.count)
        assert n_dev == len(us) > 50
        assert n_dev < MAX_PTS[level], "capacity reached: top-k would subset"
        uv_dev = np.asarray(ref_l.uv)[np.asarray(ref_l.valid)]
        assert set(map(tuple, uv_dev.astype(int))) == set(zip(us, vs))

        # device level solve with per-iteration trajectory
        n_iters = ITERS[level]
        best_R_d, best_t_d, diag, (Rs_d, ts_d) = edge_dvo.run_level(
            ref_l,
            now_levels[level],
            intr.at_level(level),
            R_dev,
            t_dev,
            cfg,
            n_iters,
            collect_trajectory=True,
        )

        # oracle level solve on the cv2-native inputs
        orc = run_level_oracle(
            dt, dgx, dgy, pts3d, np.ones(len(us), bool),
            fx, fy, cx, cy, R_orc, t_orc, n_iters,
        )

        assert orc["energies"][0] > 0.0
        np.testing.assert_allclose(
            np.asarray(diag.energy, np.float64),
            orc["energies"],
            rtol=1e-4,
            atol=5e-3,
            err_msg=f"energy curve diverged (scene {scene}, level {level})",
        )
        np.testing.assert_allclose(
            np.asarray(Rs_d, np.float64), orc["Rs"], atol=1e-5,
            err_msg=f"rotation trajectory diverged (scene {scene}, level {level})",
        )
        np.testing.assert_allclose(
            np.asarray(ts_d, np.float64), orc["ts"], atol=1e-5,
            err_msg=f"translation trajectory diverged (scene {scene}, level {level})",
        )
        assert int(diag.best_iter) == orc["best_iter"]
        np.testing.assert_allclose(
            float(diag.best_energy), orc["best_energy"], rtol=1e-4, atol=5e-3
        )

        # warm-start the next (finer) level from each side's own best pose
        R_dev, t_dev = best_R_d, best_t_d
        R_orc, t_orc = orc["best_R"], orc["best_t"]

    # ---- align_pair is exactly this composition ---------------------------
    R_ap, t_ap, _ = edge_dvo.align_pair(
        ref_pyr.gray,
        ref_pyr.depth,
        now_pyr.gray,
        intr,
        cfg,
        max_points=MAX_PTS,
        R0=_generic_start(scene)[0],
        t0=_generic_start(scene)[1],
    )
    np.testing.assert_allclose(np.asarray(R_ap), np.asarray(R_dev), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_ap), np.asarray(t_dev), atol=1e-6)
