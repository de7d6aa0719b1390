"""A/B run_level level-0 cost across gradient-mode x jacobian-stride.

Run: python tools/profile_variants.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.synthetic import render_pair
    from rgbd_odometry_tpu.solvers import edge_dvo

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cam = CameraConfig()
    intr = Intrinsics.from_config(cam)
    intr0 = intr.at_level(0)
    base = SolverConfig(method="gauss_newton", iterations=(18, 6, 4, 3))

    psi = np.array([0.01, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=0)
    ref_p = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 1)
    now_p = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), 1)
    f_ref = jax.jit(jax.vmap(lambda g, d: edge_dvo.extract_ref_level(g, d, intr0, 4096, base)))
    f_now = jax.jit(jax.vmap(lambda g: edge_dvo.prepare_now_level(g, base)))
    feats = f_ref(jnp.stack([ref_p.gray[0]] * batch), jnp.stack([ref_p.depth[0]] * batch))
    tgts = f_now(jnp.stack([now_p.gray[0]] * batch))
    jax.block_until_ready((feats, tgts))

    res = {}
    psi_gt = psi

    for gmode in ["channels", "interpolant"]:
        for jstride in [1, 2, 4, 8]:
            cfg = dataclasses.replace(base, gn_gradient_mode=gmode, lm_jacobian_stride=jstride)
            f = jax.jit(
                jax.vmap(
                    lambda fe, tg: edge_dvo.run_level(
                        fe, tg, intr0, jnp.eye(3), jnp.zeros(3), cfg, 18
                    )[:2]
                )
            )
            ms = timed(f, feats, tgts) * 1e3
            R, t = f(feats, tgts)
            from rgbd_odometry_tpu.core import geometry as geo

            R_gt, t_gt = geo.se3_exp(jnp.asarray(psi_gt))
            terr = float(jnp.linalg.norm(t[0] - t_gt))
            res[f"{gmode}_s{jstride}"] = {
                "ms": round(ms, 2),
                "t_err": round(terr, 5),
            }
            print(f"{gmode} stride {jstride}: {ms:.2f} ms, t_err {terr:.5f}", flush=True)

    print(json.dumps({"batch": batch, **res}))


if __name__ == "__main__":
    main()
