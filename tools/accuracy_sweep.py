"""Multi-scene, multi-motion-family pose-accuracy sweep with exact ground truth.

Renders N distinct synthetic scenes x M motion magnitudes x F motion
*families*, solves each pair with the canonical solver profiles
(rgbd_odometry_tpu/profiles.py), and reports translation/rotation error
statistics per family. Run on the real chip:

    python tools/accuracy_sweep.py [--scenes N] [--families a,b,...]
                                   [--profiles production_320,parity_320]

Profiles (one place for every tuned configuration — bench.py and the
validation sweeps share them):

    production_320   tuned LM profile at the reference's 320x240 resolution
                     (the bench.py headline; formerly "production_lm")
    parity_320       the reference's own sub-gradient schedule, constant-for-
                     constant (formerly "reference_parity_subgradient")
    production_vga   true-VGA 5-level profile — the configuration the
                     reference explicitly could not afford
                     (/root/reference/src/camTopic2PublisherPyD.cpp:341-345)

Motion families (round-3 diversification — the round-2 sweep jittered ONE
base twist by +-20% per component, which almost never flips a sign, so every
solved motion shared a single direction pattern):

    mixed           the historical base twist (continuity with round-2 numbers)
    mixed_flipped   the same twist, all six signs flipped
    trans_dominant  translation ~6x the rotation magnitude
    rot_dominant    rotation ~4x the translation magnitude
    pure_tx         single-axis: x-translation only
    pure_ry         single-axis: yaw rotation only

Each family is jittered +-20% per component (multiplicative, so zero
components stay zero and family identity is preserved).

The numbers land in BASELINE.md as the standing accuracy record (real-TUM
parity vs the C++ reference remains environment-blocked; see VALIDATION.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOTION_SCALES = {"small": 0.5, "nominal": 1.0, "large": 2.0}
FAMILIES = {
    "mixed": np.array([0.01, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32),
    "mixed_flipped": np.array(
        [-0.01, 0.008, -0.005, -0.004, 0.006, -0.003], np.float32
    ),
    "trans_dominant": np.array(
        [0.012, -0.010, 0.008, 0.0015, -0.0012, 0.0010], np.float32
    ),
    "rot_dominant": np.array(
        [0.002, -0.0015, 0.001, 0.008, -0.007, 0.006], np.float32
    ),
    "pure_tx": np.array([0.015, 0.0, 0.0, 0.0, 0.0, 0.0], np.float32),
    "pure_ry": np.array([0.0, 0.0, 0.0, 0.0, 0.009, 0.0], np.float32),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--families", type=str, default=",".join(FAMILIES))
    ap.add_argument(
        "--profiles", type=str, default="production_320,parity_320",
        help="comma-separated profile names from rgbd_odometry_tpu.profiles",
    )
    ap.add_argument(
        "--supersample", type=int, default=3,
        help="renderer anti-aliasing factor (3 = accuracy-suite default)",
    )
    args = ap.parse_args()
    families = {k: FAMILIES[k] for k in args.families.split(",")}

    import jax
    import jax.numpy as jnp

    from rgbd_odometry_tpu import profiles as profiles_mod
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.synthetic import render_pair
    from rgbd_odometry_tpu.solvers import edge_dvo

    def _make_profile(spec: str):
        # "name" or "name:arg" (e.g. production_vga:4 = 4 polish iterations)
        name, _, arg = spec.partition(":")
        fn = getattr(profiles_mod, name)
        return fn(int(arg)) if arg else fn()

    profiles = {spec: _make_profile(spec) for spec in args.profiles.split(",")}

    # jit once per profile: shapes are identical across families/scales
    def _make_solver(prof):
        intr = Intrinsics.from_config(prof.camera)
        return jax.jit(
            jax.vmap(
                lambda a, b, c: edge_dvo.align_pair(
                    a, b, c, intr, prof.solver, prof.max_points
                )[:2]
            )
        )

    solvers = {pname: _make_solver(prof) for pname, prof in profiles.items()}

    report = {}
    worst = {pname: 0.0 for pname in profiles}
    for fam_name, base_psi in families.items():
        for scale_name, scale in MOTION_SCALES.items():
            rng = np.random.default_rng(7)
            psis = []
            for _ in range(args.scenes):
                jitter = 1.0 + 0.2 * rng.standard_normal(6).astype(np.float32)
                psis.append(base_psi * scale * jitter)

            for pname, prof in profiles.items():
                nlv = prof.num_levels
                rgs, rds, ngs, gts = [], [], [], []
                for seed, psi in enumerate(psis):
                    (rg, rd), (ng, nd), (R_gt, t_gt) = render_pair(
                        prof.camera, psi, seed=seed,
                        supersample=args.supersample,
                    )
                    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), nlv)
                    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), nlv)
                    rgs.append(ref.gray)
                    rds.append(ref.depth)
                    ngs.append(now.gray)
                    gts.append((R_gt, t_gt))
                rg_b = tuple(jnp.stack([r[l] for r in rgs]) for l in range(nlv))
                rd_b = tuple(jnp.stack([r[l] for r in rds]) for l in range(nlv))
                ng_b = tuple(jnp.stack([r[l] for r in ngs]) for l in range(nlv))
                R_gt = np.stack([g[0] for g in gts])
                t_gt = np.stack([g[1] for g in gts])

                R, t = solvers[pname](rg_b, rd_b, ng_b)
                R, t = np.asarray(R, np.float64), np.asarray(t, np.float64)
                t_err = np.linalg.norm(t - t_gt, axis=-1)
                # geodesic rotation error
                tr = np.einsum("nij,nij->n", R, R_gt)
                r_err = np.arccos(np.clip((tr - 1) / 2, -1, 1))
                key = f"{pname}/{fam_name}/{scale_name}"
                report[key] = {
                    "t_err_mm_mean": round(float(t_err.mean() * 1e3), 2),
                    "t_err_mm_median": round(float(np.median(t_err) * 1e3), 2),
                    "t_err_mm_max": round(float(t_err.max() * 1e3), 2),
                    "r_err_mrad_mean": round(float(r_err.mean() * 1e3), 2),
                    "r_err_mrad_max": round(float(r_err.max() * 1e3), 2),
                }
                worst[pname] = max(worst[pname], float(t_err.max() * 1e3))
                print(key, report[key], flush=True)

    print(json.dumps({"n_scenes": args.scenes, "worst_t_err_mm": worst,
                      "results": report}))


if __name__ == "__main__":
    main()
