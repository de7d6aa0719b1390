"""Breakdown of prepare_now_targets (Canny / EDT / gradients) per level on
the real chip, plus the pallas-vs-xla EDT A/B at all four pyramid shapes.

Run: python tools/profile_targets.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.synthetic import render_pair
    from rgbd_odometry_tpu.ops.canny import canny
    from rgbd_odometry_tpu.ops.distance_transform import (
        distance_transform_of_edges,
        edt_l2_squared,
    )
    from rgbd_odometry_tpu.ops.gradient import central_gradient
    from rgbd_odometry_tpu.solvers import edge_dvo

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cam = CameraConfig()
    cfg = SolverConfig(method="gauss_newton")
    psi = np.array([0.01, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=0)
    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), 4)

    res = {}
    f_all = jax.jit(jax.vmap(lambda g: edge_dvo.prepare_now_targets(g, cfg)))
    gb = tuple(jnp.stack([g] * batch) for g in now.gray)
    jax.block_until_ready(gb)
    res["targets_all4_ms"] = timed(f_all, gb) * 1e3

    for lvl in range(4):
        g = jnp.stack([now.gray[lvl]] * batch)
        f_canny = jax.jit(jax.vmap(lambda x: canny(x, 100.0, 150.0)))
        edges = f_canny(g)
        jax.block_until_ready(edges)
        res[f"l{lvl}_canny_ms"] = timed(f_canny, g) * 1e3
        f_edt = jax.jit(jax.vmap(lambda e: distance_transform_of_edges(e, normalize=False)))
        res[f"l{lvl}_edt_xla_ms"] = timed(f_edt, edges) * 1e3
        f_grad = jax.jit(jax.vmap(lambda e: central_gradient(distance_transform_of_edges(e, normalize=True))))
        res[f"l{lvl}_edt_norm_grad_ms"] = timed(f_grad, edges) * 1e3
        # pallas EDT
        try:
            from rgbd_odometry_tpu.pallas.edt import edt_l2_squared_pallas

            interp = jax.default_backend() not in ("tpu",)
            f_pal = jax.jit(jax.vmap(lambda e: jnp.sqrt(edt_l2_squared_pallas(e, interpret=interp))))
            o1 = f_pal(edges)
            o2 = f_edt(edges)
            jax.block_until_ready((o1, o2))
            res[f"l{lvl}_edt_pallas_ms"] = timed(f_pal, edges) * 1e3
            res[f"l{lvl}_edt_agree"] = float(jnp.max(jnp.abs(o1 - o2)))
        except Exception as e:  # noqa: BLE001
            res[f"l{lvl}_edt_pallas_error"] = str(e)[:200]

    out = {}
    for k, v in res.items():
        out[k] = round(v, 4) if isinstance(v, float) else v
    out["batch"] = batch
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
