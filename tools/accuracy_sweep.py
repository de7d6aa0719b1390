"""Multi-scene pose-accuracy sweep with exact ground truth.

Renders N distinct synthetic scenes x M motion magnitudes, solves each pair
with (a) the production LM profile and (b) the reference-parity sub-gradient
schedule, and reports translation/rotation error statistics. Run on the real
chip: python tools/accuracy_sweep.py

The numbers land in BASELINE.md as the standing accuracy record (real-TUM
parity vs the C++ reference remains environment-blocked; see VALIDATION.md).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SCENES = 12
MOTION_SCALES = {"small": 0.5, "nominal": 1.0, "large": 2.0}
BASE_PSI = np.array([0.01, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
    from rgbd_odometry_tpu.core import geometry as geo
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.synthetic import render_pair
    from rgbd_odometry_tpu.solvers import edge_dvo

    cam = CameraConfig()
    intr = Intrinsics.from_config(cam)
    max_pts = (4096, 2048, 1024, 512)
    profiles = {
        "production_lm": SolverConfig(
            method="gauss_newton",
            iterations=(18, 6, 4, 3),
            lm_jacobian_stride=8,
            edt_window=32,
            normalize_dt=False,
            lm_deferred_accept=True,  # matches bench.py's production profile
        ),
        "reference_parity_subgradient": SolverConfig(method="subgradient"),
    }

    report = {}
    for scale_name, scale in MOTION_SCALES.items():
        # render all scene pairs for this motion magnitude
        rgs, rds, ngs, gts = [], [], [], []
        rng = np.random.default_rng(7)
        for seed in range(N_SCENES):
            jitter = 1.0 + 0.2 * rng.standard_normal(6).astype(np.float32)
            psi = BASE_PSI * scale * jitter
            (rg, rd), (ng, nd), (R_gt, t_gt) = render_pair(cam, psi, seed=seed)
            ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 4)
            now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), 4)
            rgs.append(ref.gray)
            rds.append(ref.depth)
            ngs.append(now.gray)
            gts.append((R_gt, t_gt))
        rg_b = tuple(jnp.stack([r[l] for r in rgs]) for l in range(4))
        rd_b = tuple(jnp.stack([r[l] for r in rds]) for l in range(4))
        ng_b = tuple(jnp.stack([r[l] for r in ngs]) for l in range(4))
        R_gt = np.stack([g[0] for g in gts])
        t_gt = np.stack([g[1] for g in gts])

        for pname, cfg in profiles.items():
            f = jax.jit(
                jax.vmap(
                    lambda a, b, c: edge_dvo.align_pair(a, b, c, intr, cfg, max_pts)[:2]
                )
            )
            R, t = f(rg_b, rd_b, ng_b)
            R, t = np.asarray(R, np.float64), np.asarray(t, np.float64)
            t_err = np.linalg.norm(t - t_gt, axis=-1)
            # geodesic rotation error
            tr = np.einsum("nij,nij->n", R, R_gt)
            r_err = np.arccos(np.clip((tr - 1) / 2, -1, 1))
            key = f"{pname}/{scale_name}"
            report[key] = {
                "t_err_mm_mean": round(float(t_err.mean() * 1e3), 2),
                "t_err_mm_median": round(float(np.median(t_err) * 1e3), 2),
                "t_err_mm_max": round(float(t_err.max() * 1e3), 2),
                "r_err_mrad_mean": round(float(r_err.mean() * 1e3), 2),
                "r_err_mrad_max": round(float(r_err.max() * 1e3), 2),
            }
            print(key, report[key], flush=True)

    print(json.dumps({"n_scenes": N_SCENES, "results": report}))


if __name__ == "__main__":
    main()
