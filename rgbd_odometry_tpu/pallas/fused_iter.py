"""Pallas TPU kernel: one fused Gauss-Newton iteration's data path.

The reference's one GPU experiment accumulates J^T J with cuBLAS rank-1
updates (/root/reference/src/cuda.cu:169-214). This kernel is that intent
done for the real bottleneck (SURVEY.md §7 step 7): for one (R, t) proposal
it fuses, entirely in VMEM,

    warp+project -> bilinear DT sample + interpolant gradients (one-hot
    row matmuls on the MXU) -> per-point 6-vector Jacobian -> robust
    weights -> J^T W J (6x6), J^T W eps (6), energy, visible count

so nothing between the point tensor and the 6x6 outputs ever round-trips
HBM. The XLA einsum path (`solvers.edge_dvo._jacobian_residual`) computes
the same quantities; `tools/profile_fused_iter.py` A/Bs the two on the real
chip — BASELINE.md records the verdict.

Grid: (num_k_blocks,); each step handles a K_BLOCK slice of the points and
accumulates into the shared (6,6)/(6,) outputs (TPU grid steps execute
sequentially, so read-modify-write accumulation is safe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pose_ref, pts_ref, valid_ref, img_ref, h_ref, g_ref, stats_ref, *, fx, fy, cx, cy, sigma2_px):
    i = pl.program_id(0)
    img = img_ref[...]  # (H, W) bf16/f32
    hh, ww = img.shape
    pts = pts_ref[...]  # (K_BLOCK, 3) f32
    valid = valid_ref[:, 0] > 0  # (K_BLOCK, 1) -> (K_BLOCK,)
    R = pose_ref[0:3, 0:3]
    t = pose_ref[0:3, 3]

    # warp + project: X' = R^T (X - t)
    xp = jnp.dot(pts - t[None, :], R, preferred_element_type=jnp.float32)
    z = xp[:, 2]
    zinv = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xn = xp[:, 0] * zinv
    yn = xp[:, 1] * zinv
    u = fx * xn + cx
    v = fy * yn + cy
    visible = (u >= 0.0) & (u <= ww) & (v >= 0.0) & (v <= hh) & valid

    # bilinear sample + interpolant gradients via one-hot row/col weights
    k = pts.shape[0]
    vc = jnp.clip(v, 0.0, hh - 1.0)
    i0 = jnp.floor(vc)
    fv = vc - i0
    i0i = i0.astype(jnp.int32)
    i1i = jnp.minimum(i0i + 1, hh - 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (k, hh), 1)
    oh0 = (iota_r == i0i[:, None]).astype(img.dtype)
    oh1 = (iota_r == i1i[:, None]).astype(img.dtype)
    w_row = (1.0 - fv)[:, None].astype(img.dtype) * oh0 + fv[:, None].astype(img.dtype) * oh1
    d_row = oh1 - oh0
    uc = jnp.clip(u, 0.0, ww - 1.0)
    j0 = jnp.floor(uc)
    fu = (uc - j0).astype(jnp.float32)
    j0i = j0.astype(jnp.int32)
    j1i = jnp.minimum(j0i + 1, ww - 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (k, ww), 1)
    c0 = (iota_c == j0i[:, None]).astype(jnp.float32)
    c1 = (iota_c == j1i[:, None]).astype(jnp.float32)
    w_col = (1.0 - fu)[:, None] * c0 + fu[:, None] * c1
    d_col = c1 - c0

    rowv = jnp.dot(w_row, img, preferred_element_type=jnp.float32)  # (K, W)
    rowd = jnp.dot(d_row, img, preferred_element_type=jnp.float32)
    eps_raw = jnp.sum(rowv * w_col, axis=-1)
    gu = jnp.sum(rowv * d_col, axis=-1)
    gv = jnp.sum(rowd * w_col, axis=-1)

    eps = jnp.where(visible, eps_raw, 0.0)
    g0 = jnp.where(visible, gu, 0.0)
    g1 = jnp.where(visible, gv, 0.0)
    wgt = jnp.where(visible, 6.0 / (6.0 + eps * eps / sigma2_px), 0.0)

    # textbook image Jacobian of the right-multiplied local update
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    ga0 = g0 * fx / safe_z
    ga1 = g1 * fy / safe_z
    ga2 = -(g0 * fx * xn + g1 * fy * yn) / safe_z
    jt0 = -ga0
    jt1 = -ga1
    jt2 = -ga2
    jr0 = ga1 * z - ga2 * (yn * z)
    jr1 = ga2 * (xn * z) - ga0 * z
    jr2 = ga0 * (yn * z) - ga1 * (xn * z)
    J = jnp.stack([jt0, jt1, jt2, jr0, jr1, jr2], axis=-1)  # (K, 6)
    J = jnp.where(visible[:, None], J, 0.0)

    Jw = J * wgt[:, None]
    H = jnp.dot(Jw.T, J, preferred_element_type=jnp.float32)  # (6, 6)
    # express the remaining reductions as dots (2-D outputs — Mosaic does
    # not lower full reductions to scalars)
    g = jnp.dot(eps[None, :], Jw, preferred_element_type=jnp.float32)  # (1, 6)
    e2 = jnp.dot(eps[None, :], eps[:, None], preferred_element_type=jnp.float32)
    visf = visible.astype(jnp.float32)
    nv = jnp.dot(visf[None, :], visf[:, None], preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        g_ref[...] = jnp.zeros_like(g_ref)
        stats_ref[...] = jnp.zeros_like(stats_ref)

    # TPU VMEM stores are whole-tile: build padded (8, 128) updates in
    # registers (pad, not scatter — .at[].set lowers to scatter) and
    # accumulate full tiles
    h_tile = jnp.pad(H, ((0, 2), (0, 122)))
    g_tile = jnp.pad(g, ((0, 7), (0, 122)))
    s_tile = jnp.pad(
        jnp.concatenate([e2, nv], axis=1), ((0, 7), (0, 126))
    )
    h_ref[...] += h_tile
    g_ref[...] += g_tile
    stats_ref[...] += s_tile


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "sigma2_px", "k_block", "interpret"),
)
def fused_gn_terms(
    R: jnp.ndarray,
    t: jnp.ndarray,
    pts3d: jnp.ndarray,  # (K, 3)
    valid: jnp.ndarray,  # (K,) bool
    img: jnp.ndarray,  # (H, W) DT channel (pixel units)
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    sigma2_px: float = 1.0,
    k_block: int = 512,
    interpret: bool = False,
):
    """Returns (H (6,6), g (6,), energy (), n_visible ()) for one proposal.

    `k_block` is clamped to a divisor of K: a non-dividing block would make
    the last grid step read out-of-bounds rows whose contents are undefined
    on real TPUs (phantom "valid" points would poison the accumulators).
    """
    k = pts3d.shape[0]
    k_block = min(k_block, k)
    while k % k_block:
        k_block -= 1
    pose = jnp.zeros((8, 128), jnp.float32)
    pose = pose.at[0:3, 0:3].set(R.astype(jnp.float32))
    pose = pose.at[0:3, 3].set(t.astype(jnp.float32))
    grid = (pl.cdiv(k, k_block),)
    h6, g6, stats = pl.pallas_call(
        functools.partial(
            _kernel,
            fx=float(fx),
            fy=float(fy),
            cx=float(cx),
            cy=float(cy),
            sigma2_px=float(sigma2_px),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(img.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(pose, pts3d.astype(jnp.float32), valid.astype(jnp.int32)[:, None], img)
    return (
        h6[0:6, 0:6],
        g6[0, 0:6],
        jnp.sqrt(stats[0, 0]),
        stats[0, 1].astype(jnp.int32),
    )
