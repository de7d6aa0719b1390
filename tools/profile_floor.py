"""Ablation bound on the per-iteration solve floor (BASELINE.md round-3
"solve-floor characterization" row).

The production LM iteration is latency-bound on a small-op chain after the
gather (6x6 assembly -> damped Cholesky -> trust region -> se3_exp ->
compose -> rotationize). This tool bounds what a fused kernel for that
chain could possibly save by ablating pieces and letting XLA dead-code
eliminate them, timing `solve_pyramid` at the production profile each time:

  base        : the shipping profile
  no_rot      : rotationize disabled (config flag)
  cheap_solve : chol_solve6 -> -g (Cholesky chain dead, H einsum kept live)
  dead_H      : chol_solve6 -> -g with H unused (H einsum also dead)
  dead_chain  : dead_H + se3_exp -> identity + no rotationize (everything
                after the g einsum dead; remaining cost = gather + Jacobian
                + weights + energy + g einsum + scan/where bookkeeping)

The base-vs-dead_chain delta is the CEILING on any post-gather fusion win.
Run: python tools/profile_floor.py [batch]
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
    from rgbd_odometry_tpu.solvers import edge_dvo

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cam = CameraConfig()
    max_pts = (2048, 1024, 512, 512)

    def make_cfg(**kw):
        base = dict(
            method="gauss_newton", iterations=(18, 6, 4, 3),
            lm_jacobian_stride=8, edt_window=16, normalize_dt=False,
            lm_deferred_accept=True, extract_selection="segmented",
        )
        base.update(kw)
        return SolverConfig(**base)

    cfg = make_cfg()
    intr = Intrinsics.from_config(cam)

    psi = np.array([0.01, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=0)
    refp = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 4)
    nowp = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), 4)
    ref_g = tuple(jnp.stack([g] * batch) for g in refp.gray)
    ref_d = tuple(jnp.stack([d] * batch) for d in refp.depth)
    now_g = tuple(jnp.stack([g] * batch) for g in nowp.gray)
    jax.block_until_ready((ref_g, ref_d, now_g))

    feats = jax.jit(
        jax.vmap(lambda g, d: edge_dvo.extract_ref_features(g, d, intr, cfg, max_pts))
    )(ref_g, ref_d)
    targets = jax.jit(jax.vmap(lambda ng_: edge_dvo.prepare_now_targets(ng_, cfg)))(now_g)
    jax.block_until_ready((feats, targets))

    real_chol = edge_dvo.chol_solve6
    real_exp = geo.se3_exp

    def run_variant(name, cfg_v, chol=None, exp=None):
        edge_dvo.chol_solve6 = chol or real_chol
        geo.se3_exp = exp or real_exp
        try:
            f = jax.jit(jax.vmap(lambda f_, t_: edge_dvo.solve_pyramid(f_, t_, intr, cfg_v)[:2]))
            ms = timed(f, feats, targets) * 1e3
        finally:
            edge_dvo.chol_solve6 = real_chol
            geo.se3_exp = real_exp
        print(f"{name:12s} {ms:8.2f} ms/batch", flush=True)
        return ms

    def cheap_keepH(H, g):
        return -(g + jnp.sum(H[..., 0, :]) * 1e-12)

    def cheap_deadH(H, g):
        return -g * 1e-3

    def exp_identity(p):
        return jnp.eye(3, dtype=p.dtype), p[:3] * 0.0

    real_jr = edge_dvo._jacobian_residual

    def run_variant2(name, cfg_v, chol=None, exp=None, jr=None):
        edge_dvo._jacobian_residual = jr or real_jr
        try:
            return run_variant(name, cfg_v, chol=chol, exp=exp)
        finally:
            edge_dvo._jacobian_residual = real_jr

    def const_psi(H, g):
        return jnp.full((6,), 1e-5, g.dtype)

    def fake_jr(R, t, ref, now, intr_l, cfg_v):
        # all gathers dead; shapes preserved; a data dependence on the pose
        # keeps the scan body from collapsing entirely
        k = ref.pts3d.shape[0]
        dtype = ref.pts3d.dtype
        e = jnp.sum(R[0]) * 1e-12 + jnp.sum(t) * 1e-12
        J = jnp.zeros((k, 6), dtype) + e
        eps = jnp.zeros((k,), dtype) + e
        return J, eps, eps + 1.0, jnp.ones((k,), bool), e + 1.0, jnp.asarray(1.0, dtype)

    res = {}
    res["base"] = run_variant("base", cfg)
    res["no_rot"] = run_variant("no_rot", make_cfg(rotationize=False))
    res["cheap_solve"] = run_variant("cheap_solve", cfg, chol=cheap_keepH)
    res["dead_H"] = run_variant("dead_H", cfg, chol=cheap_deadH)
    res["dead_chain"] = run_variant(
        "dead_chain", make_cfg(rotationize=False), chol=cheap_deadH, exp=exp_identity
    )
    # psi constant: J, g, H and the gradient gathers all dead; the value
    # gather + weights + energy survive (accept logic still fed)
    res["const_psi"] = run_variant("const_psi", cfg, chol=const_psi)
    # whole _jacobian_residual faked: bounds the scan/bookkeeping skeleton
    # (plus per-level final full-res diagnostics, which still run real)
    res["scan_only"] = run_variant2("scan_only", cfg, jr=fake_jr)
    # re-measure base at the end to expose same-session drift
    res["base_recheck"] = run_variant("base2", cfg)
    res["batch"] = batch
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v for k, v in res.items()}))


if __name__ == "__main__":
    main()
