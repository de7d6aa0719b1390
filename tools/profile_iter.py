"""Fine-grained per-iteration cost probe for the level-0 LM loop.

Each probe runs an 18-iteration lax.scan whose body DEPENDS on the carry
(via a tiny pose perturbation), so XLA cannot hoist the work out of the
loop. Dispatch overhead is measured with a null scan and subtracted.

Run: python tools/profile_iter.py [batch]
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
    import jax
    import jax.numpy as jnp

    from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
    from rgbd_odometry_tpu.core import geometry as geo
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.synthetic import render_pair
    from rgbd_odometry_tpu.ops.linalg6 import chol_solve6
    from rgbd_odometry_tpu.solvers import edge_dvo

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cam = CameraConfig()
    cfg = SolverConfig(method="gauss_newton", iterations=(18, 6, 4, 3))
    intr = Intrinsics.from_config(cam)
    intr0 = intr.at_level(0)

    psi = np.array([0.01, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=0)
    ref_p = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 1)
    now_p = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), 1)
    f_ref = jax.jit(
        jax.vmap(lambda g, d: edge_dvo.extract_ref_level(g, d, intr0, 4096, cfg))
    )
    f_now = jax.jit(jax.vmap(lambda g: edge_dvo.prepare_now_level(g, cfg)))
    feats = f_ref(
        jnp.stack([ref_p.gray[0]] * batch), jnp.stack([ref_p.depth[0]] * batch)
    )
    tgts = f_now(jnp.stack([now_p.gray[0]] * batch))
    jax.block_until_ready((feats, tgts))

    N = 18
    res = {}

    def scan18(body_fn):
        def one(f, t):
            def body(carry, _):
                R, tt = carry
                out = body_fn(R, tt, f, t)
                # tie the next pose to the output so nothing hoists
                d = (out * 1e-12).astype(jnp.float32)
                R2 = R + d * 0.0
                t2 = tt + d
                return (R2, t2 + 1e-9), None

            (Rf, tf), _ = jax.lax.scan(
                body, (jnp.eye(3), jnp.zeros(3) + 1e-4), None, length=N
            )
            return tf

        return jax.jit(jax.vmap(one))

    # 0) null scan: dispatch + loop overhead
    f0 = scan18(lambda R, t, f, tg: jnp.sum(R) + jnp.sum(t))
    res["null_ms"] = timed(f0, feats, tgts) * 1e3

    # 1) project only
    def p_project(R, t, f, tg):
        xn, yn, z, u, v, vis = edge_dvo._project(R, t, f, tg, intr0)
        return jnp.sum(u) + jnp.sum(v)

    res["project_ms"] = timed(scan18(p_project), feats, tgts) * 1e3

    # 2) project + 3-channel gather (bilinear mxu)
    def p_gather(R, t, f, tg):
        from rgbd_odometry_tpu.ops.matmul_gather import gather_channels_mm

        xn, yn, z, u, v, vis = edge_dvo._project(R, t, f, tg, intr0)
        s = gather_channels_mm(tg.chans, u, v, bilinear=True)
        return jnp.sum(s.astype(jnp.float32))

    res["project_gather3_ms"] = timed(scan18(p_gather), feats, tgts) * 1e3

    # 3) full jacobian+residual
    def p_jac(R, t, f, tg):
        J, eps, wgt, vis, e, vr = edge_dvo._jacobian_residual(R, t, f, tg, intr0, cfg)
        return jnp.sum(J) + e

    res["jacobian_residual_ms"] = timed(scan18(p_jac), feats, tgts) * 1e3

    # 4) jac + H/g + chol solve
    def p_lm(R, t, f, tg):
        J, eps, wgt, vis, e, vr = edge_dvo._jacobian_residual(R, t, f, tg, intr0, cfg)
        Jw = J * wgt[..., None]
        H = jnp.einsum("ni,nj->ij", Jw, J)
        g = jnp.einsum("nj,n->j", Jw, eps)
        diag = jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-8))
        psi6 = -chol_solve6(H + 1e-4 * diag, g)
        return jnp.sum(psi6) + e

    res["lm_solve_ms"] = timed(scan18(p_lm), feats, tgts) * 1e3

    # 5) + exp/compose/rotationize
    def p_pose(R, t, f, tg):
        J, eps, wgt, vis, e, vr = edge_dvo._jacobian_residual(R, t, f, tg, intr0, cfg)
        Jw = J * wgt[..., None]
        H = jnp.einsum("ni,nj->ij", Jw, J)
        g = jnp.einsum("nj,n->j", Jw, eps)
        diag = jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-8))
        psi6 = -chol_solve6(H + 1e-4 * diag, g)
        xR, xt = geo.se3_exp(psi6)
        R2 = geo.rotationize(jnp.matmul(R, xR), cfg.rotationize_method)
        return jnp.sum(R2) + jnp.sum(t + xt) + e

    res["pose_update_ms"] = timed(scan18(p_pose), feats, tgts) * 1e3

    # 6) + accept/reject residual pass (stride 4 -> 1024 pts)
    stride = max(1, min(cfg.lm_proposal_stride, 4096 // 512))
    def p_accept(R, t, f, tg):
        base = p_pose(R, t, f, tg)
        sub = edge_dvo.RefLevel(
            pts3d=f.pts3d[::stride], uv=f.uv[::stride],
            valid=f.valid[::stride], count=jnp.maximum(f.count // stride, 1),
        )
        _, _, _, e2, *_ = edge_dvo._project_and_sample(R, t, sub, tg, intr0, cfg)
        return base + e2

    res["with_accept_pass_ms"] = timed(scan18(p_accept), feats, tgts) * 1e3

    # full run_level for reference
    frl = jax.jit(
        jax.vmap(
            lambda f, t: edge_dvo.run_level(
                f, t, intr0, jnp.eye(3), jnp.zeros(3), cfg, N
            )[:2]
        )
    )
    res["run_level_ms"] = timed(frl, feats, tgts) * 1e3

    res = {k: round(v, 3) for k, v in res.items()}
    res["batch"] = batch
    res["iters"] = N
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
