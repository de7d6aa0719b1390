"""Per-stage timing breakdown of the batched edge-DVO hot path on the real
chip. Run: python tools/profile_breakdown.py [batch]

Measures, per frame (batch-normalized):
  * prepare_now_targets (Canny + EDT + gradients, 4 levels)
  * solve_pyramid given precomputed targets (the LM iterations)
  * full step (targets + solve)
  * extract_ref_features (amortized 1/5 in the bench)
  * isolated gather+Jacobian cost per level-0 LM iteration
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=6):
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
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.synthetic import render_pair
    from rgbd_odometry_tpu.solvers import edge_dvo

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cam = CameraConfig()
    num_levels = 4
    max_pts = (2048, 1024, 512, 512)
    cfg = SolverConfig(
        method="gauss_newton", iterations=(18, 6, 4, 3), lm_jacobian_stride=8,
        edt_window=16, normalize_dt=False, lm_deferred_accept=True,
    )  # the adopted bench.py production profile (r3)
    intr = Intrinsics.from_config(cam)

    psi = np.array([0.01, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=0)
    ref = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), num_levels)
    now = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), num_levels)
    ref_g = tuple(jnp.stack([g] * batch) for g in ref.gray)
    ref_d = tuple(jnp.stack([d] * batch) for d in ref.depth)
    now_g = tuple(jnp.stack([g] * batch) for g in now.gray)
    jax.block_until_ready((ref_g, ref_d, now_g))

    f_ref = jax.jit(jax.vmap(lambda g, d: edge_dvo.extract_ref_features(g, d, intr, cfg, max_pts)))
    feats = f_ref(ref_g, ref_d)
    jax.block_until_ready(feats)

    f_targets = jax.jit(jax.vmap(lambda ng: edge_dvo.prepare_now_targets(ng, cfg)))
    targets = f_targets(now_g)
    jax.block_until_ready(targets)

    f_solve = jax.jit(
        jax.vmap(lambda f, t: edge_dvo.solve_pyramid(f, t, intr, cfg)[:2])
    )
    f_full = jax.jit(
        jax.vmap(
            lambda f, ng: edge_dvo.solve_pyramid(
                f, edge_dvo.prepare_now_targets(ng, cfg), intr, cfg
            )[:2]
        )
    )

    res = {}
    res["targets_ms"] = timed(f_targets, now_g) * 1e3
    res["solve_ms"] = timed(f_solve, feats, targets) * 1e3
    res["full_ms"] = timed(f_full, feats, now_g) * 1e3
    res["ref_extract_ms"] = timed(f_ref, ref_g, ref_d) * 1e3

    # per-level run_level cost
    for lvl, iters in enumerate(cfg.iterations):
        fl = jax.jit(
            jax.vmap(
                lambda f, t: edge_dvo.run_level(
                    f, t, intr.at_level(lvl), jnp.eye(3), jnp.zeros(3), cfg, iters
                )[:2],
                in_axes=(0, 0),
            )
        )
        fsub = jax.tree_util.tree_map(lambda x: x, tuple(feats)[lvl])
        tsub = tuple(targets)[lvl]
        res[f"level{lvl}_ms_{iters}it"] = timed(fl, fsub, tsub) * 1e3

    # isolated gather+Jacobian per level-0 iteration (18x for comparability)
    def g18(f, t):
        def body(carry, _):
            J, eps, wgt, vis, e, vr = edge_dvo._jacobian_residual(
                jnp.eye(3), jnp.zeros(3), f, t, intr.at_level(0), cfg
            )
            return carry + e, None

        out, _ = jax.lax.scan(body, jnp.asarray(0.0), None, length=18)
        return out

    fg = jax.jit(jax.vmap(g18))
    res["gather_jac_18x_lvl0_ms"] = timed(fg, tuple(feats)[0], tuple(targets)[0]) * 1e3

    per_frame_ms = (res["full_ms"] + res["ref_extract_ms"] / 5.0) / batch
    res["per_frame_ms"] = per_frame_ms
    res["frames_per_s"] = 1e3 / per_frame_ms
    res = {k: round(v, 3) for k, v in res.items()}
    res["batch"] = batch
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
