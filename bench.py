"""Benchmark: batched edge-DVO frame-pair alignments per second per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.json north star): >= 1000 VGA frame-pair alignments/s/chip
on TPU v5e at the reference's 320x240 working resolution, 4-level pyramid.
vs_baseline = value / 1000.

Each "alignment" is the reference's FULL per-frame hot path (SURVEY.md
section 3.1): Canny edge extraction + exact-L2 distance transform + DT
gradients on the now frame at 4 pyramid levels, ref-edge top-K selection +
back-projection, then the coarse-to-fine solve. Run on the real chip by the
driver; keep stdout to the single JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.synthetic import render_pair
    from rgbd_odometry_tpu.solvers import edge_dvo

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cam = CameraConfig()  # reference base: 320x240, Freiburg-1 intrinsics
    num_levels = 4
    max_pts = (4096, 2048, 1024, 512)
    # production LM profile: accuracy measured equal to (50,8,5,4) on the
    # synthetic suite (0.1-0.5px reprojection) at ~2x the throughput
    cfg = SolverConfig(method="gauss_newton", iterations=(18, 6, 4, 3))
    intr = Intrinsics.from_config(cam)

    # distinct synthetic pairs so nothing degenerates
    rng_psis = [
        np.array([0.01, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32),
        np.array([-0.012, 0.006, 0.002, -0.003, 0.005, 0.002], np.float32),
    ]
    pyrs = []
    for i in range(2):
        (rg, rd), (ng, nd), _ = render_pair(cam, rng_psis[i % 2], seed=i)
        pyrs.append(
            (
                build_pyramid(jnp.asarray(rg), jnp.asarray(rd), num_levels),
                build_pyramid(jnp.asarray(ng), jnp.asarray(nd), num_levels),
            )
        )
    rg_b = tuple(
        jnp.stack([pyrs[i % 2][0].gray[l] for i in range(batch)]) for l in range(num_levels)
    )
    rd_b = tuple(
        jnp.stack([pyrs[i % 2][0].depth[l] for i in range(batch)]) for l in range(num_levels)
    )
    ng_b = tuple(
        jnp.stack([pyrs[i % 2][1].gray[l] for i in range(batch)]) for l in range(num_levels)
    )

    fn = jax.jit(
        jax.vmap(
            lambda a, b, c: edge_dvo.align_pair(a, b, c, intr, cfg, max_pts)[:2]
        )
    )
    R, t = fn(rg_b, rd_b, ng_b)
    jax.block_until_ready((R, t))  # compile + warm

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        R, t = fn(rg_b, rd_b, ng_b)
    jax.block_until_ready((R, t))
    dt = (time.perf_counter() - t0) / reps
    pairs_per_s = batch / dt

    print(
        json.dumps(
            {
                "metric": "edge-DVO frame-pair alignments/sec/chip (320x240, 4-level, full pipeline)",
                "value": round(pairs_per_s, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / 1000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
