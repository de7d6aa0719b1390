"""The flagship edge-alignment DVO solver, TPU-native.

Re-designs `SolveDVO` (/root/reference/src/SolveDVO.cpp) — reference-keyframe
edge pixels aligned against the distance transform of the current frame's edge
map, minimized coarse-to-fine with a damped/projected sub-gradient method on
SE(3) — as pure-functional, statically-shaped JAX:

  * ragged per-level edge lists (`preProcessRefFrame`, :269-303) become
    fixed-capacity top-K point tensors with validity masks,
  * the per-point Jacobian/residual C++ loops (:306-462) become batched
    (K,·) vector algebra feeding one fused JᵀWε (and JᵀWJ) reduction,
  * `runIterations` (:619-1017) becomes a `lax.scan` carrying
    (R, t, momentum, best-iterate) with the exact reference schedule:
    momentum β=0.5, preconditioner diag(1,1,1,.5,.5,.5), step 9e-2/(itr-4),
    L2 regularization λ=0.05 on the normalized log-pose, trust-region radius
    0.003, early stop |ψ|<1e-7, best-iterate return,
  * the coarse-to-fine schedule (:2096-2104) is a Python-level loop over the
    4 static level shapes inside one jit,
  * everything `vmap`s over frame-pairs — the headline TPU win the
    single-pair C++ pipeline cannot express.

A Gauss-Newton/LM mode (6x6 normal-equation solve — trivial on the MXU) is
provided as the fast path; the sub-gradient mode is bit-faithful to the
reference semantics including its quirks (see `_jacobian_residual`).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_odometry_tpu.config import SolverConfig
from rgbd_odometry_tpu.core import geometry as geo
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.ops.canny import canny, canny_multi
from rgbd_odometry_tpu.ops.distance_transform import distance_transform_of_edges
from rgbd_odometry_tpu.ops.gradient import central_gradient
from rgbd_odometry_tpu.ops.interp import gather_bilinear, gather_floor, gather_sqrt_bilinear
from rgbd_odometry_tpu.ops.linalg6 import chol_solve6
from rgbd_odometry_tpu.ops.matmul_gather import (
    gather_bilinear_value_grad_mm,
    gather_channels_mm,
    gather_floor_value_cgrads_mm,
)

_PREC = jax.lax.Precision.HIGHEST


class RefLevel(NamedTuple):
    """Fixed-capacity edge-point set of the reference keyframe at one level.

    Replaces `_ref_edge_3d` / `_ref_edge_2d` / `_ref_roi_mask`
    (/root/reference/include/SolveDVO.h:218-220).
    """

    pts3d: jnp.ndarray  # (K, 3) metres, camera frame
    uv: jnp.ndarray  # (K, 2) pixel coords at this level
    valid: jnp.ndarray  # (K,) bool
    count: jnp.ndarray  # () int32 — number of valid points


class NowLevel(NamedTuple):
    """Distance-transform target of the current frame at one level.

    Replaces `now_distance_transform` / `now_DT_gradientX/Y`
    (/root/reference/include/SolveDVO.h:230-233).
    """

    dt: jnp.ndarray  # (H, W) float (0-255-normalized when cfg.normalize_dt)
    dgx: jnp.ndarray  # (H, W)
    dgy: jnp.ndarray  # (H, W)
    edges: jnp.ndarray  # (H, W) bool (kept for viz/debug parity)
    scale: jnp.ndarray  # () DT units per pixel (1.0 when not normalized)
    chans: jnp.ndarray  # (3, H, W) stacked [dt, dgx, dgy] in cfg.gather_dtype


class LevelDiagnostics(NamedTuple):
    """Per-level solve diagnostics — the reference's runIterations outputs
    (energyAtEachIteration, bestEnergyIndex, visibility ratio,
    /root/reference/src/SolveDVO.cpp:619-623) plus the final residuals needed
    by the keyframe quality triggers."""

    energy: jnp.ndarray  # (n_iters,) energy at each iteration (0 after early stop)
    best_energy: jnp.ndarray  # ()
    best_iter: jnp.ndarray  # () int32
    visible_ratio: jnp.ndarray  # () ratio at the best iterate
    final_epsilons: jnp.ndarray  # (K,) residuals at the best iterate
    final_valid: jnp.ndarray  # (K,) visibility mask at the best iterate
    num_points: jnp.ndarray  # () int32 valid ref points


# --------------------------------------------------------------------------
# Precompute: reference keyframe features & now-frame DT targets
# --------------------------------------------------------------------------


def extract_ref_level(
    gray: jnp.ndarray,
    depth_mm: jnp.ndarray,
    intr_level: Intrinsics,
    k_max: int,
    cfg: SolverConfig,
    edges: jnp.ndarray | None = None,
) -> RefLevel:
    """Edge-point selection + back-projection at one level.

    Reference chain: Canny edge map (`computeDistTransfrmOfRef`,
    /root/reference/src/SolveDVO.cpp:1705), predicate edge ∧ depth>100mm
    (`selectedPts` :1251), back-projection with level-scaled intrinsics
    (`enlistRefEdgePts` :224-265). Ragged lists become top-K with a mask.
    ``edges`` lets the caller pass a precomputed (level-fused) edge map.
    """
    if edges is None:
        edges = canny(gray, cfg.canny_low, cfg.canny_high)
    mask = edges & (depth_mm > cfg.min_depth_mm)
    h, w = mask.shape
    flat = mask.reshape(-1)
    k_max = min(k_max, h * w)  # coarse levels can be smaller than the cap
    # top-K with a fixed pseudo-random tie-break priority: when the frame has
    # more qualifying edges than capacity, the kept subset is spatially
    # uniform over the image instead of lax.top_k's row-major-first prefix
    # (which would track only the top of the image). When count <= k_max the
    # selected SET is unchanged (every edge pixel scores > 1, every non-edge
    # < 1); only the ordering differs, which the masked reductions ignore.
    # The priority is a trace-time numpy constant (exact, free at runtime).
    pri = jnp.asarray(
        (np.random.default_rng(h * w).permutation(h * w).astype(np.float32) + 0.5)
        / (h * w)
    )
    flat_score = flat.astype(jnp.float32) + pri
    if cfg.extract_selection == "segmented" and h * w >= 8 * k_max:
        # two-stage selection (see SolverConfig.extract_selection): top-32
        # per 256-pixel segment, then top-k over the S*32 candidates. One
        # big top_k over H*W is the single most expensive op of extraction
        # (36.4 -> 12.4 ms at 320x240/batch 256 on v5e); segments with >32
        # edge pixels are thinned lowest-priority-first. Zero-padding to a
        # segment multiple is harmless: pad scores are 0 < every real score.
        seg_len = 256
        n = h * w
        s = -(-n // seg_len)
        sc = jnp.pad(flat_score, (0, s * seg_len - n))
        v, i = jax.lax.top_k(sc.reshape(s, seg_len), 32)
        gi = (jnp.arange(s, dtype=jnp.int32)[:, None] * seg_len + i).reshape(-1)
        score, sel = jax.lax.top_k(v.reshape(-1), k_max)
        idx = jnp.minimum(jnp.take(gi, sel), n - 1)
        valid = score > 1.0
        # count = points actually tracked (the denominator of the visibility
        # ratio and the Laplacian b-hat): under segmented selection it
        # reflects any per-segment thinning, so it must be derived from the
        # survivors themselves.
        count = jnp.sum(valid.astype(jnp.int32))
    else:
        score, idx = jax.lax.top_k(flat_score, k_max)
        valid = score > 1.0
        # Exact selection keeps every edge pixel up to capacity, so the
        # tracked count equals min(edge census, capacity). This form is also
        # deliberately NOT sum(valid): reducing over top_k's output values
        # perturbs XLA:CPU's partitioned fusion into a latent abort() under
        # the 8-device pjit used by the test mesh (bisected 2026-08-17; the
        # two forms are semantically identical on this branch).
        count = jnp.minimum(jnp.sum(flat.astype(jnp.int32)), k_max)
    ys = (idx // w).astype(gray.dtype)
    xs = (idx % w).astype(gray.dtype)
    if cfg.gather_mode == "mxu":
        # point gathers serialize on TPU; the one-hot matmul is exact for
        # integer coordinates (floor mode) and ~4x faster here
        z_raw = gather_channels_mm(
            depth_mm[None], xs, ys, bilinear=False, precision=_PREC
        )[0]
    else:
        z_raw = jnp.take(depth_mm.reshape(-1), idx)
    z = jnp.where(valid, z_raw, 0.0) / 1000.0
    x3 = z * (xs - intr_level.cx) / intr_level.fx
    y3 = z * (ys - intr_level.cy) / intr_level.fy
    pts3d = jnp.stack([x3, y3, z], axis=-1)
    uv = jnp.stack([xs, ys], axis=-1)
    return RefLevel(pts3d=pts3d, uv=uv, valid=valid, count=count)


def prepare_now_level(
    gray: jnp.ndarray, cfg: SolverConfig, edges: jnp.ndarray | None = None
) -> NowLevel:
    """Edge map -> (inverted) distance transform -> gradients at one level.

    Reference: `computeDistTransfrmOfNow` (/root/reference/src/SolveDVO.cpp:
    1740-1799): Canny, DT of the inverted edge map, optional 0-255 min-max
    normalization, central-difference gradients of the DT. ``edges`` lets
    the caller pass a precomputed (level-fused) edge map.
    """
    if edges is None:
        edges = canny(gray, cfg.canny_low, cfg.canny_high)
    if cfg.edt_window > 0:
        from rgbd_odometry_tpu.ops.distance_transform import edt_l2_squared_windowed

        dt_raw = jnp.sqrt(edt_l2_squared_windowed(edges, cfg.edt_window))
    elif cfg.edt_backend == "pallas":
        from rgbd_odometry_tpu.pallas.edt import edt_l2_squared_pallas

        interp = jax.default_backend() != "tpu"
        dt_raw = jnp.sqrt(edt_l2_squared_pallas(edges, interpret=interp))
    else:
        dt_raw = distance_transform_of_edges(edges, normalize=False)
    if cfg.normalize_dt:
        dmin = jnp.min(dt_raw)
        dmax = jnp.max(dt_raw)
        scale = 255.0 / jnp.maximum(dmax - dmin, 1e-12)
        dt = (dt_raw - dmin) * scale
    else:
        dt = dt_raw
        scale = jnp.asarray(1.0, dt_raw.dtype)
    dgx, dgy = central_gradient(dt)
    chan_dtype = jnp.bfloat16 if (
        cfg.method == "gauss_newton" and cfg.gather_dtype == "bfloat16"
    ) else dt.dtype
    chans = jnp.stack([dt, dgx, dgy]).astype(chan_dtype)
    return NowLevel(dt=dt, dgx=dgx, dgy=dgy, edges=edges, scale=scale, chans=chans)


# --------------------------------------------------------------------------
# Residuals + Jacobians (the hot math)
# --------------------------------------------------------------------------


def _project(R, t, ref: RefLevel, now: NowLevel, intr: Intrinsics):
    """Warp + project the ref edge points; returns geometry only."""
    h, w_img = now.dt.shape
    xp = jnp.einsum("kj,nk->nj", R, ref.pts3d - t, precision=_PREC)
    z = xp[..., 2]
    zinv = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xn = xp[..., 0] * zinv
    yn = xp[..., 1] * zinv
    u = intr.fx * xn + intr.cx
    v = intr.fy * yn + intr.cy
    visible = (u >= 0.0) & (u <= w_img) & (v >= 0.0) & (v <= h) & ref.valid
    return xn, yn, z, u, v, visible


def _sample_dt(now: NowLevel, u, v, cfg: SolverConfig):
    """Single-channel DT residual sampling per the configured semantics."""
    if cfg.gather_mode == "mxu":
        if cfg.method == "gauss_newton":
            return gather_channels_mm(now.chans[:1], u, v, bilinear=True)[0].astype(
                now.dt.dtype
            )
        if cfg.interpolate_dt:
            # reference's sqrt-of-squares == sqrt(bilinear(F^2)) (:1285-1308)
            dt2 = gather_channels_mm((now.dt * now.dt)[None], u, v, bilinear=True)[0]
            return jnp.sqrt(jnp.maximum(dt2, 0.0))
        return gather_channels_mm(now.dt[None], u, v, bilinear=False, precision=_PREC)[0]
    if cfg.method == "gauss_newton":
        # GN needs a residual consistent with its interpolated gradients
        return gather_bilinear(now.dt, u, v)
    if cfg.interpolate_dt:
        return gather_sqrt_bilinear(now.dt, u, v)
    return gather_floor(now.dt, u, v)


def _project_and_sample(R, t, ref: RefLevel, now: NowLevel, intr: Intrinsics, cfg: SolverConfig):
    """Warp + project + DT residual sampling (no Jacobian): the cheap pass.

    Mirrors `getReprojectedEpsilons` (/root/reference/src/SolveDVO.cpp:425-462).
    Returns (eps, wgt, visible, energy, vis_ratio, xn, yn, z, u, v).
    """
    dtype = ref.pts3d.dtype
    xn, yn, z, u, v, visible = _project(R, t, ref, now, intr)
    eps_raw = _sample_dt(now, u, v, cfg)
    eps = jnp.where(visible, eps_raw, 0.0)
    wgt = _robust_weights(eps, visible, now, cfg)
    energy = jnp.sqrt(jnp.sum(eps * eps))  # aggregateEpsilons = ||eps|| (:1310-1320)
    n_valid = jnp.maximum(ref.count, 1)
    vis_ratio = jnp.sum(visible.astype(dtype)) / n_valid.astype(dtype)
    return eps, wgt, visible, energy, vis_ratio, xn, yn, z, u, v


def _robust_weights(eps, visible, now: NowLevel, cfg: SolverConfig):
    """w(r) = 6/(6 + r^2/sigma^2) (`getWeightOf`, src/SolveDVO.cpp:1047-1053).

    gauss_newton mode measures r in *pixels* (resolution-independent): the
    reference's sigma on the 0-255-normalized DT kills any point >~0.5px off
    (scale ~15 units/px), freezing partial alignments.
    """
    if cfg.method == "gauss_newton":
        eps_px = eps / now.scale
        return jnp.where(
            visible, 6.0 / (6.0 + eps_px * eps_px / cfg.gn_weight_sigma2_px), 0.0
        )
    return jnp.where(visible, 6.0 / (6.0 + eps * eps / cfg.weight_sigma2), 0.0)


def _jacobian_residual(R, t, ref: RefLevel, now: NowLevel, intr: Intrinsics, cfg: SolverConfig):
    """Warp, project, gather residuals, build per-point 6-vector Jacobians.

    Faithful to `computeJacobianOfNowFrame` + `getReprojectedEpsilons`
    (/root/reference/src/SolveDVO.cpp:306-462), including two deliberate
    reference quirks:

      1. the projection divides `_3d_transformed` IN PLACE (:340-341), so the
         subsequent A1/A2 Jacobian blocks are built from the *dehomogenized*
         coordinates (X/Z, Y/Z, 1) rather than (X, Y, Z) (:377-401) — i.e.
         each point's Jacobian is scaled by its depth relative to the
         textbook formula;
      2. out-of-frame tests are inclusive of the far edge (u <= W, :371,:435)
         and invisible points contribute exact zeros to J, ε and w.

    Returns (J (K,6), eps (K,), w (K,), visible (K,), energy (), vis_ratio ()).
    """
    dtype = ref.pts3d.dtype
    xn, yn, z, u, v, visible = _project(R, t, ref, now, intr)
    xp = jnp.stack([xn * z, yn * z, z], axis=-1)

    # interpolated DT gradients for GN: the floor-gathered gradient
    # (reference semantics, G at integer pixel :392-394) is up to 1px away
    # from the sampling point, which near the optimum dominates the step error
    bilinear = cfg.method == "gauss_newton"
    if cfg.gather_mode == "mxu":
        # one fused 3-channel MXU gather: DT residual + both gradients
        if bilinear and cfg.gn_gradient_mode == "interpolant":
            # 2 one-hot row matmuls of the DT channel only: value + exact
            # gradient of the bilinear interpolant (see matmul_gather)
            val, gu, gv = gather_bilinear_value_grad_mm(now.chans[0], u, v)
            eps_raw = val.astype(ref.pts3d.dtype)
            g0_raw = gu.astype(ref.pts3d.dtype)
            g1_raw = gv.astype(ref.pts3d.dtype)
        elif bilinear:
            sampled = gather_channels_mm(now.chans, u, v, bilinear=True).astype(
                ref.pts3d.dtype
            )
            eps_raw, g0_raw, g1_raw = sampled[0], sampled[1], sampled[2]
        else:
            # reference floor semantics: DT value + central-difference
            # gradients at the same integer pixel, derived from the DT's own
            # rows in 2 exact f32 one-hot matmuls (bit-equal to gathering
            # the 3 precomputed channels at 2/3 the MXU work)
            val, g0_raw, g1_raw = gather_floor_value_cgrads_mm(now.dt, u, v)
            if cfg.interpolate_dt:
                dt2 = gather_channels_mm((now.dt * now.dt)[None], u, v, bilinear=True)[0]
                eps_raw = jnp.sqrt(jnp.maximum(dt2, 0.0))
            else:
                eps_raw = val
    else:
        eps_raw = _sample_dt(now, u, v, cfg)
        if bilinear:
            g0_raw = gather_bilinear(now.dgx, u, v)
            g1_raw = gather_bilinear(now.dgy, u, v)
        else:
            g0_raw = gather_floor(now.dgx, u, v)
            g1_raw = gather_floor(now.dgy, u, v)
    eps = jnp.where(visible, eps_raw, 0.0)
    wgt = _robust_weights(eps, visible, now, cfg)
    energy = jnp.sqrt(jnp.sum(eps * eps))
    n_valid = jnp.maximum(ref.count, 1)
    vis_ratio = jnp.sum(visible.astype(dtype)) / n_valid.astype(dtype)
    g0 = jnp.where(visible, g0_raw, 0.0)
    g1 = jnp.where(visible, g1_raw, 0.0)

    mode = cfg.jacobian_mode
    if mode == "auto":
        mode = "true" if cfg.method == "gauss_newton" else "reference"
    if mode == "reference":
        # GA1 = G(1x2) @ A1(2x3) with the dehomogenized quirk (X=xn, Y=yn,
        # Z=1): A1 = [[fx, 0, -fx*xn], [0, fy, -fy*yn]] (:377-383 with Z==1).
        # Verified vs autodiff: rotation block equals the textbook Jacobian
        # (the 1/Z of A1 and the Z of hat(X') cancel), translation block is
        # scaled by each point's depth.
        ga = jnp.stack(
            [
                g0 * intr.fx,
                g1 * intr.fy,
                -(g0 * intr.fx * xn + g1 * intr.fy * yn),
            ],
            axis=-1,
        )  # (K, 3)
        # A2 = [-R^T | hat(R^T h)] with h = (xn, yn, 1)  (:385-401)
        j_trans = -jnp.einsum("jk,nk->nj", R, ga, precision=_PREC)
        hvec = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)
        m = jnp.einsum("kj,nk->nj", R, hvec, precision=_PREC)  # R^T h
        j_rot = jnp.cross(ga, m)
    else:
        # textbook image Jacobian of the right-multiplied local update
        # cR <- cR exp(hat(w)), cT <- cT + cR v  (the composition the solver
        # actually applies, :914-917): d eps/d[v,w] = G A1_true [-I | hat(X')]
        safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        ga = jnp.stack(
            [
                g0 * intr.fx / safe_z,
                g1 * intr.fy / safe_z,
                -(g0 * intr.fx * xn + g1 * intr.fy * yn) / safe_z,
            ],
            axis=-1,
        )
        j_trans = -ga
        j_rot = jnp.cross(ga, xp)
    J = jnp.concatenate([j_trans, j_rot], axis=-1)  # (K, 6)
    J = jnp.where(visible[..., None], J, 0.0)
    return J, eps, wgt, visible, energy, vis_ratio


# --------------------------------------------------------------------------
# Per-level optimizers
# --------------------------------------------------------------------------


class _LevelState(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    descent: jnp.ndarray  # momentum direction (6,) [subgradient mode]
    lm_lambda: jnp.ndarray  # () adaptive Marquardt damping [gauss_newton mode]
    done: jnp.ndarray  # () bool — early-terminated
    best_energy: jnp.ndarray
    best_R: jnp.ndarray
    best_t: jnp.ndarray
    best_iter: jnp.ndarray
    best_vis: jnp.ndarray
    best_eps: jnp.ndarray
    best_visible: jnp.ndarray


def run_level(
    ref: RefLevel,
    now: NowLevel,
    intr_level: Intrinsics,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    cfg: SolverConfig,
    n_iters: int,
    collect_trajectory: bool = False,
):
    """One pyramid level of `runIterations`
    (/root/reference/src/SolveDVO.cpp:619-1017) as a `lax.scan`.

    Semantics preserved exactly: energy is evaluated at the pose *entering*
    each iteration; the best iterate (<=, so later ties win, :696-705) is
    returned; early termination freezes the state and leaves the remaining
    energy entries at zero (:872-878 with energyAtEachIteration zero-init).

    gauss_newton with ``cfg.lm_jacobian_stride > 1`` runs the scan on every
    Nth point (uniform subsample; order is pseudo-randomized at extraction):
    the per-iteration energy curve is then over that subset (scaled by
    ~1/sqrt(N)), while ``best_energy`` / ``visible_ratio`` /
    ``final_epsilons`` are re-evaluated on ALL points at the returned pose.

    With ``collect_trajectory=True`` an extra ``(Rs (n,3,3), ts (n,3))`` of
    the per-iteration post-update poses is returned (XLA removes the outputs
    entirely when False) — used by the full-loop numpy oracle test.
    """
    dtype = R0.dtype
    lm_mode = cfg.method == "gauss_newton"

    def _strided(r: RefLevel, s: int) -> RefLevel:
        return RefLevel(
            pts3d=r.pts3d[::s],
            uv=r.uv[::s],
            valid=r.valid[::s],
            count=jnp.maximum(r.count // s, 1),
        )

    # keep >= 512 points in any strided pass: tiny capacities (coarse levels,
    # small images) need the full set for a stable decision
    cap = ref.pts3d.shape[0]
    # normal-equation subsample: J^T W J / J^T W eps are 6x6 sufficient
    # statistics; every Nth point (pseudo-random order from extraction)
    # estimates them with 1/N the gather cost. Diagnostics are re-evaluated
    # on ALL points at the best pose after the scan.
    jstride = max(1, min(int(cfg.lm_jacobian_stride), cap // 512)) if lm_mode else 1
    ref_jac = _strided(ref, jstride) if jstride > 1 else ref
    if lm_mode and jstride > 1:
        # accept/reject reuses the Jacobian subset: e_cur is then the scan
        # body's own energy, no extra slice pass
        stride = 1
        ref_sub = ref_jac
    elif lm_mode:
        stride = max(1, min(int(cfg.lm_proposal_stride), cap // 512))
        # subsampled point set for the LM accept/reject pass only (the
        # decision compares two energies on the SAME subset, so the 1/stride
        # gather is statistically sufficient and 1/stride the cost)
        ref_sub = _strided(ref, stride) if stride > 1 else ref
    else:
        stride = 1
        ref_sub = ref
    if lm_mode and cfg.lm_deferred_accept and not collect_trajectory:
        return _run_level_lm_deferred(
            ref, ref_jac, now, intr_level, R0, t0, cfg, n_iters, jstride
        )
    k = ref_jac.pts3d.shape[0]
    precond = jnp.asarray(
        [1.0, 1.0, 1.0, cfg.precondition_rot, cfg.precondition_rot, cfg.precondition_rot],
        dtype,
    )

    def body(state: _LevelState, itr):
        J, eps, wgt, visible, energy, vis_ratio = _jacobian_residual(
            state.R, state.t, ref_jac, now, intr_level, cfg
        )
        # best-iterate tracking (skipped once done)
        is_better = (energy <= state.best_energy) & (~state.done)
        best_energy = jnp.where(is_better, energy, state.best_energy)
        best_R = jnp.where(is_better, state.R, state.best_R)
        best_t = jnp.where(is_better, state.t, state.best_t)
        best_iter = jnp.where(is_better, itr, state.best_iter)
        best_vis = jnp.where(is_better, vis_ratio, state.best_vis)
        best_eps = jnp.where(is_better, eps, state.best_eps)
        best_visible = jnp.where(is_better, visible, state.best_visible)

        if lm_mode:
            psi, descent = _lm_psi(state, J, eps, wgt, cfg)
        else:
            psi, descent = _subgradient_step(state, J, eps, wgt, itr, cfg=cfg, precond=precond)

        psi_norm = jnp.linalg.norm(psi)

        xR, xt = geo.se3_exp(psi)
        new_t = state.t + jnp.einsum("ij,j->i", state.R, xt, precision=_PREC)
        new_R = jnp.matmul(state.R, xR, precision=_PREC)
        if cfg.rotationize:
            new_R = geo.rotationize(new_R, cfg.rotationize_method)

        if lm_mode:
            # true Levenberg-Marquardt: evaluate the proposal with a cheap
            # residual-only pass, accept only on decrease, adapt lambda.
            # (The near-planar scenes this solver meets make J^T W J nearly
            # singular along translation/rotation-ambiguous directions; a
            # fixed small damping lets those directions blow up.)
            _, _, _, e_new, _, _, _, _, _, _ = _project_and_sample(
                new_R, new_t, ref_sub, now, intr_level, cfg
            )
            if stride > 1:
                e_cur = jnp.sqrt(jnp.sum(eps[::stride] * eps[::stride]))
            else:
                e_cur = energy
            accept = e_new < e_cur
            # exact ties (quantized coarse-level plateaus) neither move nor
            # raise lambda — raising it would deadlock psi at ~0
            worse = e_new > e_cur
            lam = jnp.where(
                accept,
                jnp.maximum(state.lm_lambda / 3.0, 1e-8),
                jnp.where(worse, jnp.minimum(state.lm_lambda * 4.0, 1e6), state.lm_lambda),
            )
            # a REJECTED step must not trigger termination: lambda growth
            # shrinks |psi| regardless of distance to the optimum
            newly_done = accept & (psi_norm < cfg.psi_norm_termination)
            do_update = (~state.done) & (~newly_done) & accept
            lam = jnp.where(state.done, state.lm_lambda, lam)
        else:
            newly_done = psi_norm < cfg.psi_norm_termination
            lam = state.lm_lambda
            do_update = (~state.done) & (~newly_done)

        R_next = jnp.where(do_update, new_R, state.R)
        t_next = jnp.where(do_update, new_t, state.t)

        energy_out = jnp.where(state.done, 0.0, energy)
        next_state = _LevelState(
            R=R_next,
            t=t_next,
            descent=jnp.where(state.done, state.descent, descent),
            lm_lambda=lam,
            done=state.done | newly_done,
            best_energy=best_energy,
            best_R=best_R,
            best_t=best_t,
            best_iter=best_iter,
            best_vis=best_vis,
            best_eps=best_eps,
            best_visible=best_visible,
        )
        return next_state, (energy_out, R_next, t_next)

    init = _LevelState(
        R=R0,
        t=t0,
        descent=jnp.zeros((6,), dtype),
        lm_lambda=jnp.asarray(cfg.lm_damping, dtype),
        done=jnp.asarray(False),
        best_energy=jnp.asarray(1.0e10, dtype),
        best_R=jnp.eye(3, dtype=dtype),
        best_t=jnp.zeros((3,), dtype),
        best_iter=jnp.asarray(-1, jnp.int32),
        best_vis=jnp.asarray(1.0, dtype),
        best_eps=jnp.zeros((k,), dtype),
        best_visible=jnp.zeros((k,), bool),
    )
    final, (energies, traj_R, traj_t) = jax.lax.scan(
        body, init, jnp.arange(n_iters, dtype=jnp.int32)
    )

    best_R = final.best_R
    if cfg.rotationize:  # reference re-rotationizes the returned best (:997-999)
        best_R = geo.rotationize(best_R, cfg.rotationize_method)
    if jstride > 1:
        # the scan tracked subset-sized residuals; diagnostics (keyframe
        # quality triggers, b-hat, visibility) must describe ALL points at
        # the returned pose — one full residual pass, amortized over the
        # whole level's iterations
        eps_f, _, visible_f, energy_f, vis_f, *_ = _project_and_sample(
            best_R, final.best_t, ref, now, intr_level, cfg
        )
        diag = LevelDiagnostics(
            energy=energies,
            best_energy=energy_f,
            best_iter=final.best_iter,
            visible_ratio=vis_f,
            final_epsilons=eps_f,
            final_valid=visible_f,
            num_points=ref.count,
        )
    else:
        diag = LevelDiagnostics(
            energy=energies,
            best_energy=final.best_energy,
            best_iter=final.best_iter,
            visible_ratio=final.best_vis,
            final_epsilons=final.best_eps,
            final_valid=final.best_visible,
            num_points=ref.count,
        )
    if collect_trajectory:
        return best_R, final.best_t, diag, (traj_R, traj_t)
    return best_R, final.best_t, diag


def _run_level_lm_deferred(
    ref: RefLevel,
    ref_jac: RefLevel,
    now: NowLevel,
    intr_level: Intrinsics,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    cfg: SolverConfig,
    n_iters: int,
    jstride: int,
):
    """Deferred-accept Levenberg-Marquardt level solve.

    The classic LM accept/reject evaluates each proposal with an extra
    residual pass; here the NEXT iteration's Jacobian pass (whose residuals
    we need anyway) doubles as the verdict. On reject, the pose reverts and
    the step recomputes from the CARRIED previous (J, eps) with raised
    lambda — the carry costs (K_sub, 7) floats, the saved gather a full
    one-hot matmul pass. Net: every iteration performs exactly one
    gather pass (~2/3 the solver's gather work at stride 8, measured).

    Lambda adaptation runs one iteration late relative to textbook LM; the
    best-iterate return (over EVALUATED poses, like the reference's
    :696-705) keeps rejected proposals out of the result.
    """
    dtype = R0.dtype
    k = ref_jac.pts3d.shape[0]

    class _S(NamedTuple):
        R: jnp.ndarray
        t: jnp.ndarray
        Rb: jnp.ndarray  # backup pose (last ACCEPTED iterate)
        tb: jnp.ndarray
        Jb: jnp.ndarray  # (K, 6) Jacobian at the backup pose
        epsb: jnp.ndarray  # (K,) residuals at the backup pose
        eb: jnp.ndarray  # () energy at the backup pose
        wgtb: jnp.ndarray  # (K,) robust weights at the backup pose
        pending: jnp.ndarray  # () bool — current pose is an unverified proposal
        lam: jnp.ndarray
        done: jnp.ndarray
        best_energy: jnp.ndarray
        best_R: jnp.ndarray
        best_t: jnp.ndarray
        best_iter: jnp.ndarray

    def body(state: _S, itr):
        J, eps, wgt, visible, energy, vis_ratio = _jacobian_residual(
            state.R, state.t, ref_jac, now, intr_level, cfg
        )
        # verdict on the pending proposal (first iteration: nothing pending).
        # Exact energy ties (quantized coarse-level plateaus) revert the pose
        # but leave lambda UNCHANGED — raising it would shrink psi toward 0
        # without ever terminating (same tie rule as the standard LM path)
        accept = (~state.pending) | (energy < state.eb)
        worse = state.pending & (energy > state.eb)
        lam = jnp.where(state.done, state.lam, jnp.where(
            state.pending & accept, jnp.maximum(state.lam / 3.0, 1e-8),
            jnp.where(worse, jnp.minimum(state.lam * 4.0, 1e6), state.lam),
        ))
        # working iterate: current pose if accepted, backup otherwise
        R_cur = jnp.where(accept, state.R, state.Rb)
        t_cur = jnp.where(accept, state.t, state.tb)
        J_use = jnp.where(accept, J, state.Jb)
        eps_use = jnp.where(accept, eps, state.epsb)
        wgt_use = jnp.where(accept, wgt, state.wgtb)
        e_use = jnp.where(accept, energy, state.eb)

        # best-iterate over EVALUATED poses (<= so later ties win)
        is_better = (energy <= state.best_energy) & (~state.done)
        best_energy = jnp.where(is_better, energy, state.best_energy)
        best_R = jnp.where(is_better, state.R, state.best_R)
        best_t = jnp.where(is_better, state.t, state.best_t)
        best_iter = jnp.where(is_better, itr, state.best_iter)

        Jw = J_use * wgt_use[..., None]
        H = jnp.einsum("ni,nj->ij", Jw, J_use, precision=_PREC)
        g = jnp.einsum("nj,n->j", Jw, eps_use, precision=_PREC)
        diag = jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-8))
        psi = -chol_solve6(H + lam * diag, g)
        norm = jnp.linalg.norm(psi)
        scale = jnp.where(
            norm > cfg.lm_trust_region, cfg.lm_trust_region / jnp.maximum(norm, 1e-30), 1.0
        )
        psi = psi * scale
        newly_done = accept & state.pending & (jnp.linalg.norm(psi) < cfg.psi_norm_termination)
        do_update = (~state.done) & (~newly_done)

        xR, xt = geo.se3_exp(psi)
        R_prop = jnp.matmul(R_cur, xR, precision=_PREC)
        if cfg.rotationize:
            R_prop = geo.rotationize(R_prop, cfg.rotationize_method)
        t_prop = t_cur + jnp.einsum("ij,j->i", R_cur, xt, precision=_PREC)

        next_state = _S(
            R=jnp.where(do_update, R_prop, R_cur),
            t=jnp.where(do_update, t_prop, t_cur),
            Rb=jnp.where(do_update, R_cur, state.Rb),
            tb=jnp.where(do_update, t_cur, state.tb),
            Jb=jnp.where(do_update, J_use, state.Jb),
            epsb=jnp.where(do_update, eps_use, state.epsb),
            eb=jnp.where(do_update, e_use, state.eb),
            wgtb=jnp.where(do_update, wgt_use, state.wgtb),
            pending=jnp.where(state.done | newly_done, False, do_update),
            lam=lam,
            done=state.done | newly_done,
            best_energy=best_energy,
            best_R=best_R,
            best_t=best_t,
            best_iter=best_iter,
        )
        return next_state, jnp.where(state.done, 0.0, energy)

    init = _S(
        R=R0,
        t=t0,
        Rb=R0,
        tb=t0,
        Jb=jnp.zeros((k, 6), dtype),
        epsb=jnp.zeros((k,), dtype),
        eb=jnp.asarray(jnp.inf, dtype),
        wgtb=jnp.zeros((k,), dtype),
        pending=jnp.asarray(False),
        lam=jnp.asarray(cfg.lm_damping, dtype),
        done=jnp.asarray(False),
        best_energy=jnp.asarray(1.0e10, dtype),
        best_R=R0,
        best_t=t0,
        best_iter=jnp.asarray(-1, jnp.int32),
    )
    final, energies = jax.lax.scan(body, init, jnp.arange(n_iters, dtype=jnp.int32))
    best_R = final.best_R
    if cfg.rotationize:
        best_R = geo.rotationize(best_R, cfg.rotationize_method)
    # full-resolution diagnostics at the returned pose (same contract as the
    # jstride path of run_level)
    eps_f, _, visible_f, energy_f, vis_f, *_ = _project_and_sample(
        best_R, final.best_t, ref, now, intr_level, cfg
    )
    diag = LevelDiagnostics(
        energy=energies,
        best_energy=energy_f,
        best_iter=final.best_iter,
        visible_ratio=vis_f,
        final_epsilons=eps_f,
        final_valid=visible_f,
        num_points=ref.count,
    )
    return best_R, final.best_t, diag


def _subgradient_step(state: _LevelState, J, eps, wgt, itr, *, cfg: SolverConfig, precond):
    """The reference's damped/projected sub-gradient step
    (/root/reference/src/SolveDVO.cpp:714-839)."""
    dtype = eps.dtype
    # g = J^T W eps  (:777)
    g = jnp.einsum("nj,n->j", J, wgt * eps, precision=_PREC)
    if cfg.enable_l2_regularization:  # :734-743, :795-797
        cpsi = geo.se3_log(state.R, state.t)
        norm = jnp.linalg.norm(cpsi)
        cpsi = jnp.where(norm > 0, cpsi / jnp.maximum(norm, 1e-30), cpsi)
        g = g + cfg.l2_lambda * cpsi
    descent = (1.0 - cfg.momentum) * g + cfg.momentum * state.descent  # :799
    # square-summable step schedule (:772-773)
    itr_f = itr.astype(dtype)
    step = cfg.step_length / jnp.where(itr > 5, itr_f - 4.0, 1.0)
    psi = -step * precond * descent  # :816
    # trust-region projection (:830-839)
    norm = jnp.linalg.norm(psi)
    scale = jnp.where(norm > cfg.trust_region_radius, cfg.trust_region_radius / jnp.maximum(norm, 1e-30), 1.0)
    return psi * scale, descent


def _lm_psi(state: _LevelState, J, eps, wgt, cfg: SolverConfig):
    """Levenberg-Marquardt step: psi = -(J^T W J + lam diag(J^T W J))^-1 J^T W eps.

    The TPU fast path — a 6x6 MXU solve per iteration; the reference's
    cuBLAS rank-1 `J^T J` experiment (/root/reference/src/cuda.cu:169-214)
    done properly. Marquardt diagonal scaling handles the wildly different
    units of the translation vs rotation blocks; lambda adapts via the
    accept/reject logic in `run_level`. The trust region + early stop are
    shared with the sub-gradient mode so keyframe semantics stay identical.
    """
    Jw = J * wgt[..., None]
    H = jnp.einsum("ni,nj->ij", Jw, J, precision=_PREC)
    g = jnp.einsum("nj,n->j", Jw, eps, precision=_PREC)
    diag = jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-8))
    psi = -chol_solve6(H + state.lm_lambda * diag, g)
    norm = jnp.linalg.norm(psi)
    scale = jnp.where(
        norm > cfg.lm_trust_region, cfg.lm_trust_region / jnp.maximum(norm, 1e-30), 1.0
    )
    return psi * scale, state.descent


# --------------------------------------------------------------------------
# Coarse-to-fine pyramid solve + end-to-end pair alignment
# --------------------------------------------------------------------------


def solve_pyramid(
    ref_levels: Tuple[RefLevel, ...],
    now_levels: Tuple[NowLevel, ...],
    intr: Intrinsics,
    cfg: SolverConfig,
    R0: jnp.ndarray | None = None,
    t0: jnp.ndarray | None = None,
):
    """Coarse-to-fine schedule over all levels
    (/root/reference/src/SolveDVO.cpp:2096-2104): level 3 -> 0, each warm-
    starting the next. Returns (R, t, per-level diagnostics tuple)."""
    num_levels = len(ref_levels)
    dtype = ref_levels[0].pts3d.dtype
    R = jnp.eye(3, dtype=dtype) if R0 is None else R0
    t = jnp.zeros((3,), dtype) if t0 is None else t0
    diags = [None] * num_levels
    for level in range(num_levels - 1, -1, -1):
        n_iters = cfg.iterations[level] if level < len(cfg.iterations) else cfg.iterations[-1]
        if n_iters <= 0:
            continue
        R, t, diags[level] = run_level(
            ref_levels[level],
            now_levels[level],
            intr.at_level(level),
            R,
            t,
            cfg,
            n_iters,
        )
    return R, t, tuple(d for d in diags if d is not None)


def pose_information(
    ref_level: RefLevel,
    now_level: NowLevel,
    intr_level: Intrinsics,
    cfg: SolverConfig,
    R: jnp.ndarray,
    t: jnp.ndarray,
):
    """6x6 information matrix (Gauss-Newton Hessian approximation J^T W J)
    of the edge-alignment cost at pose (R, t), plus the robust residual
    variance for covariance scaling.

    Beyond the reference, which never quantifies pose uncertainty: the
    information matrix is the local quadratic model of the energy around
    the solved pose in the solver's 6-DoF twist coordinates
    (translation then rotation, the `psi` layout of `_solve_normal_eqs`).
    Weakly-constrained directions (e.g. motion parallel to all edges) show
    up as small eigenvalues; fusion consumers weight the DVO estimate by
    it and `pose_covariance` turns it into a covariance estimate.

    One Jacobian pass over ALL points of the given level at the given pose
    (the same `_jacobian_residual` the optimizer iterates); deliberately a
    standalone entry point so the hot solve path is untouched — callers
    pay one extra dispatch only when they ask.

    Returns (info (6,6), sigma2 (), n_eff ()): the unscaled J^T W J, the
    weighted residual variance sum(w e^2)/sum(w), and the effective point
    count sum(w).
    """
    J, eps, wgt, _visible, _energy, _vis = _jacobian_residual(
        R, t, ref_level, now_level, intr_level, cfg
    )
    info = jnp.einsum("ki,k,kj->ij", J, wgt, J, precision=_PREC)
    n_eff = jnp.sum(wgt)
    sigma2 = jnp.sum(wgt * eps * eps) / jnp.maximum(n_eff, 1e-6)
    return info, sigma2, n_eff


def pose_covariance(info, sigma2, n_eff=None, ridge: float = 1e-9):
    """Covariance estimate from `pose_information` outputs (host-side numpy):
    sigma^2 (J^T W J)^-1, the standard nonlinear-least-squares local
    covariance with the robust weights folded into both factors. When
    `n_eff` is given, the residual variance gets the small-sample
    n/(n - 6) degrees-of-freedom correction (negligible at the usual
    hundreds of points, meaningful on degenerate low-point scenes).
    `ridge` regularizes rank-deficient directions (degenerate scenes)."""
    info = np.asarray(info, np.float64)
    scale = float(sigma2)
    if n_eff is not None:
        n = float(n_eff)
        scale *= n / max(n - 6.0, 1.0)
    return scale * np.linalg.inv(info + ridge * np.eye(6))


def extract_ref_features(
    gray_pyr: Tuple[jnp.ndarray, ...],
    depth_pyr: Tuple[jnp.ndarray, ...],
    intr: Intrinsics,
    cfg: SolverConfig,
    max_points: Tuple[int, ...],
    edges_pyr: Tuple[jnp.ndarray, ...] | None = None,
) -> Tuple[RefLevel, ...]:
    """`preProcessRefFrame` over all levels (/root/reference/src/SolveDVO.cpp:269).

    ``edges_pyr``: precomputed per-level Canny edge maps. A keyframe is
    always a frame whose now-targets were just computed (`prepare_now_level`
    ran Canny on the same gray), so the streaming driver passes
    ``NowLevel.edges`` here and extraction skips its Canny entirely —
    bit-identical features (same edge maps), ~40% cheaper extraction.
    """
    edge_pyr = edges_pyr if edges_pyr is not None else _pyramid_edges(gray_pyr, cfg)
    return tuple(
        extract_ref_level(g, d, intr.at_level(lvl), max_points[lvl], cfg, edges=e)
        for lvl, (g, d, e) in enumerate(zip(gray_pyr, depth_pyr, edge_pyr))
    )


def _pyramid_edges(gray_pyr: Tuple[jnp.ndarray, ...], cfg: SolverConfig):
    """Per-level Canny edge maps — fused into one NMS + one hysteresis
    fixpoint across levels when cfg.fuse_level_canny (bit-identical)."""
    if cfg.fuse_level_canny and len(gray_pyr) > 1:
        return canny_multi(gray_pyr, cfg.canny_low, cfg.canny_high)
    return tuple(canny(g, cfg.canny_low, cfg.canny_high) for g in gray_pyr)


def prepare_now_targets(
    gray_pyr: Tuple[jnp.ndarray, ...], cfg: SolverConfig
) -> Tuple[NowLevel, ...]:
    """`computeDistTransfrmOfNow` over all levels (/root/reference/src/SolveDVO.cpp:1740)."""
    edge_pyr = _pyramid_edges(gray_pyr, cfg)
    return tuple(
        prepare_now_level(g, cfg, edges=e) for g, e in zip(gray_pyr, edge_pyr)
    )


def align_pair(
    ref_gray_pyr: Tuple[jnp.ndarray, ...],
    ref_depth_pyr: Tuple[jnp.ndarray, ...],
    now_gray_pyr: Tuple[jnp.ndarray, ...],
    intr: Intrinsics,
    cfg: SolverConfig,
    max_points: Tuple[int, ...] = (8192, 4096, 2048, 1024),
    R0: jnp.ndarray | None = None,
    t0: jnp.ndarray | None = None,
):
    """End-to-end: one (ref, now) frame-pair -> relative SE(3) + diagnostics.

    The whole per-frame hot path of the `dvo` node (SURVEY.md section 3.1) in
    one jittable, vmappable function.
    """
    ref_levels = extract_ref_features(ref_gray_pyr, ref_depth_pyr, intr, cfg, max_points)
    now_levels = prepare_now_targets(now_gray_pyr, cfg)
    return solve_pyramid(ref_levels, now_levels, intr, cfg, R0, t0)
