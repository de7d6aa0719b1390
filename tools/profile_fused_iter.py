"""A/B: the Pallas fused GN-iteration kernel vs the XLA einsum path, on the
real chip, in the realistic setting (18-iteration scan whose pose depends on
the previous step, vmapped over a batch).

Run: python tools/profile_fused_iter.py [batch] [K]
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
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.synthetic import render_pair
    from rgbd_odometry_tpu.ops.linalg6 import chol_solve6
    from rgbd_odometry_tpu.pallas.fused_iter import fused_gn_terms
    from rgbd_odometry_tpu.solvers import edge_dvo
    from rgbd_odometry_tpu.core import geometry as geo

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cam = CameraConfig()
    intr = Intrinsics.from_config(cam)
    intr0 = intr.at_level(0)
    cfg = SolverConfig(
        method="gauss_newton", normalize_dt=False, edt_window=32
    )

    psi = np.array([0.01, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=0)
    ref_p = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 1)
    now_p = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), 1)
    f_ref = jax.jit(jax.vmap(lambda g, d: edge_dvo.extract_ref_level(g, d, intr0, K, cfg)))
    f_now = jax.jit(jax.vmap(lambda g: edge_dvo.prepare_now_level(g, cfg)))
    feats = f_ref(jnp.stack([ref_p.gray[0]] * batch), jnp.stack([ref_p.depth[0]] * batch))
    tgts = f_now(jnp.stack([now_p.gray[0]] * batch))
    jax.block_until_ready((feats, tgts))

    N = 18
    res = {"batch": batch, "K": K}

    def lm18_xla(f, t):
        def body(carry, _):
            R, tt = carry
            J, eps, wgt, vis, e, vr = edge_dvo._jacobian_residual(R, tt, f, t, intr0, cfg)
            Jw = J * wgt[..., None]
            H = jnp.einsum("ni,nj->ij", Jw, J)
            g = jnp.einsum("nj,n->j", Jw, eps)
            diag = jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-8))
            psi6 = -chol_solve6(H + 1e-4 * diag, g)
            xR, xt = geo.se3_exp(psi6 * 0.5)
            return (jnp.matmul(R, xR), tt + xt), e

        (Rf, tf), es = jax.lax.scan(body, (jnp.eye(3), jnp.zeros(3)), None, length=N)
        return tf, es[-1]

    def lm18_pallas(f, t):
        img = t.chans[0]

        def body(carry, _):
            R, tt = carry
            H, g, e, nv = fused_gn_terms(
                R, tt, f.pts3d, f.valid, img,
                float(intr0.fx), float(intr0.fy), float(intr0.cx), float(intr0.cy),
                sigma2_px=cfg.gn_weight_sigma2_px, k_block=min(512, K),
            )
            diag = jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-8))
            psi6 = -chol_solve6(H + 1e-4 * diag, g)
            xR, xt = geo.se3_exp(psi6 * 0.5)
            return (jnp.matmul(R, xR), tt + xt), e

        (Rf, tf), es = jax.lax.scan(body, (jnp.eye(3), jnp.zeros(3)), None, length=N)
        return tf, es[-1]

    fx = jax.jit(jax.vmap(lm18_xla))
    fp = jax.jit(jax.vmap(lm18_pallas))
    tx, ex = fx(feats, tgts)
    tp, ep = fp(feats, tgts)
    jax.block_until_ready((tx, tp))
    res["final_t_agree"] = float(jnp.max(jnp.abs(tx - tp)))
    res["xla_18it_ms"] = round(timed(fx, feats, tgts) * 1e3, 2)
    res["pallas_18it_ms"] = round(timed(fp, feats, tgts) * 1e3, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
