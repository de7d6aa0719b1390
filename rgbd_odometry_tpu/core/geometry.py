"""SO(3)/SE(3) Lie-group operations, pure jnp and fully batchable.

Replaces the reference's Sophus usage plus its hand-rolled helpers:
`to_se_3` (/root/reference/src/SolveDVO.cpp:1104-1132), `exponentialMap`
(:1139-1184, the closed-form Rodrigues the reference kept around but superseded
by Sophus at :905-907), and `rotationize` (:1269-1282).

Conventions (identical to Sophus::SE3d used by the reference):
  * a twist ``psi`` is a 6-vector ``[v, omega]`` — translational part first
    (/root/reference/src/SolveDVO.cpp:1143-1144).
  * ``se3_exp(psi) -> (R, t)`` with ``R = exp(hat(omega))``, ``t = V(omega) v``.

Everything works with arbitrary leading batch dimensions and float32 (TPU
native); tests compare against closed-form/scipy in float64 on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# All matmuls here are tiny (3x3 / 6-vec): force full float32 so the TPU MXU's
# default bf16 input rounding never corrupts pose math.
_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3).

    Matches `to_se_3` (/root/reference/src/SolveDVO.cpp:1104-1115).
    """
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta2: jnp.ndarray, small_thresh: float = 1e-8):
    """Taylor-safe (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3).

    The default 1e-8 threshold is the historical one the sub-gradient
    parity tests are calibrated around (se3_exp tolerates the generic
    branch's f32 rounding — B and C only scale the W/W^2 terms of V).
    Callers that DIVIDE by B (se3_log's V^-1) must pass
    ``small_thresh=1e-3``: in float32 cos(theta) rounds to exactly 1.0 for
    theta < ~3.4e-4, making the generic B identically ZERO over
    theta in (1e-4, 3.4e-4) — a division there is inf/NaN — and the
    generic forms keep losing relative accuracy as eps_f32/theta^2 while
    the 2-term Taylor's truncation error (~theta^4) stays negligible up to
    theta ~ 0.18."""
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < small_thresh
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    return a, b, c


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) -> (..., 3, 3).

    Same closed form as `exponentialMap` (/root/reference/src/SolveDVO.cpp:1165).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_coeffs(theta2)
    W = hat(w)
    WW = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * WW


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map of SO(3): (..., 3, 3) -> (..., 3). Safe near theta=0 and pi.

    Differentiable at the identity: the branch masks derive from cos(theta),
    the arccos input is diverted to a safe value where the Taylor branch is
    selected (arccos' derivative is -inf at 1, which would poison even the
    selected branch's tangent through `theta`), and the Taylor branch itself
    is expressed via 2(1 - cos theta) = theta^2 + O(theta^4) instead of
    theta. jax.jacfwd through se3_log at a zero residual (pose-graph
    optimization at convergence) depends on this.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # thresholds must be representable in float32 (1 - 1e-10 rounds to 1.0!)
    small = cos_theta > 1.0 - 1e-6  # theta < ~1.4e-3 (Taylor err O(theta^4))
    near_pi = cos_theta < -(1.0 - 5e-7)  # theta > ~pi - 1e-3
    cos_inner = jnp.where(small, 0.0, cos_theta)  # safe arccos input
    theta = jnp.arccos(cos_inner)
    # generic branch: w = theta/(2 sin theta) * vee(R - R^T)
    sin_theta = jnp.sin(theta)
    w_asym = vee(R - jnp.swapaxes(R, -1, -2))
    generic = 0.5 * theta[..., None] / jnp.where(
        jnp.abs(sin_theta) < _EPS, 1.0, sin_theta
    )[..., None] * w_asym
    tt = 2.0 * (1.0 - cos_theta)  # = theta^2 + O(theta^4), smooth in R
    taylor = 0.5 * (1.0 + tt[..., None] / 6.0) * w_asym
    # near pi: w = theta * axis, axis from diagonal of (R + I)/2
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum((diag + 1.0) * 0.5 - cos_theta[..., None] * 0.5, 0.0) / jnp.maximum(
        1.0 - cos_theta[..., None] * 0.5 - 0.5, _EPS
    )
    # robust axis via largest diagonal of  B = (R + R^T)/2 - cos(theta) I
    B = 0.5 * (R + jnp.swapaxes(R, -1, -2)) - cos_theta[..., None, None] * jnp.broadcast_to(
        jnp.eye(3, dtype=R.dtype), R.shape
    )
    denom = jnp.maximum(1.0 - cos_theta, _EPS)[..., None]
    axis2 = jnp.maximum(
        jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1) / denom, 0.0
    )
    axis = jnp.sqrt(axis2)
    del axis_sq
    # fix signs from the off-diagonals of the symmetric part
    s01 = B[..., 0, 1]
    s02 = B[..., 0, 2]
    s12 = B[..., 1, 2]
    # choose sign of largest component positive, propagate to the others
    i_max = jnp.argmax(axis2, axis=-1)
    sign_for = jnp.stack(
        [
            jnp.where(i_max == 0, 1.0, jnp.where(i_max == 1, jnp.sign(s01), jnp.sign(s02))),
            jnp.where(i_max == 1, 1.0, jnp.where(i_max == 0, jnp.sign(s01), jnp.sign(s12))),
            jnp.where(i_max == 2, 1.0, jnp.where(i_max == 0, jnp.sign(s02), jnp.sign(s12))),
        ],
        axis=-1,
    )
    sign_for = jnp.where(sign_for == 0.0, 1.0, sign_for)
    pi_branch = theta[..., None] * axis * sign_for
    out = jnp.where(small[..., None], taylor, generic)
    return jnp.where(near_pi[..., None], pi_branch, out)


def se3_exp(psi: jnp.ndarray):
    """Twist [v, omega] (..., 6) -> (R (...,3,3), t (...,3)).

    Equals Sophus::SE3d::exp as used at /root/reference/src/SolveDVO.cpp:905-907:
    R = exp(hat(w)); t = V w-Jacobian applied to v (:1172-1177).
    """
    v = psi[..., :3]
    w = psi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, c = _sinc_coeffs(theta2)
    W = hat(w)
    WW = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=psi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * WW
    V = eye + b[..., None, None] * W + c[..., None, None] * WW
    t = jnp.einsum("...ij,...j->...i", V, v, precision=_PREC)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> twist [v, omega]; inverse of `se3_exp`.

    Used for the L2 regularizer on the normalized log-pose
    (/root/reference/src/SolveDVO.cpp:734-743).
    """
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    # f32-safe threshold: this path DIVIDES by B (see _sinc_coeffs)
    a, b, _ = _sinc_coeffs(theta2, small_thresh=1e-3)
    W = hat(w)
    WW = _mm(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    theta2_safe = jnp.maximum(theta2, _EPS * _EPS)
    # float32 threshold (see _sinc_coeffs): the generic form's 1 - A/(2B)
    # is a catastrophic cancellation below theta ~ 0.03, and B itself hits
    # exact zero for theta in (1e-4, 3.4e-4)
    coef = jnp.where(
        theta2 < 1e-3,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - a / (2.0 * b)) / theta2_safe,
    )
    Vinv = eye - 0.5 * W + coef[..., None, None] * WW
    v = jnp.einsum("...ij,...j->...i", Vinv, t, precision=_PREC)
    return jnp.concatenate([v, w], axis=-1)


def compose(R1, t1, R2, t2):
    """(R1,t1) ∘ (R2,t2): the pose-graph composition
    global = lastKey ∘ rel (/root/reference/src/GOP.cpp:138-186)."""
    return _mm(R1, R2), t1 + jnp.einsum("...ij,...j->...i", R1, t2, precision=_PREC)


def inverse(R, t):
    """(R,t)^-1 = (R^T, -R^T t)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision=_PREC)


def rotationize_svd(R: jnp.ndarray) -> jnp.ndarray:
    """Exact projection onto O(3) via SVD with sign-corrected singular values.

    Mirrors `rotationize` (/root/reference/src/SolveDVO.cpp:1269-1282): S_ii is
    replaced by sign(S_ii); for the near-rotations produced by the optimizer all
    singular values are positive so this is the polar factor U V^T.
    """
    U, S, Vt = jnp.linalg.svd(R)
    signs = jnp.where(S > 0, 1.0, -1.0).astype(R.dtype)
    return _mm(U * signs[..., None, :], Vt)


def rotationize_newton(R: jnp.ndarray, iters: int = 3) -> jnp.ndarray:
    """Newton-Schulz polar iteration: MXU-friendly orthonormalization.

    For R within ~0.3 of orthogonal (always true here: R drifts only by
    float32 rounding per compose), 2-3 iterations reach <1e-7 orthogonality —
    equivalent to the reference's SVD projection but without the sequential
    SVD on TPU.
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    X = R
    for _ in range(iters):
        X = _mm(X, 1.5 * eye - 0.5 * _mm(jnp.swapaxes(X, -1, -2), X))
    return X


def rotationize(R: jnp.ndarray, method: str = "newton") -> jnp.ndarray:
    if method == "svd":
        return rotationize_svd(R)
    return rotationize_newton(R)


def quat_from_rotmat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> quaternion (x, y, z, w), Eigen/TUM component order.

    Used by the TUM-format trajectory writer (reference writes x y z qx qy qz qw,
    /root/reference/src/SolveDVO.cpp:1341-1354).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = m00 + m11 + m22

    def _case_w():
        s = jnp.sqrt(jnp.maximum(trace + 1.0, _EPS)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], -1)

    def _case_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], -1)

    def _case_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], -1)

    def _case_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], -1)

    qw, qx, qy, qz = _case_w(), _case_x(), _case_y(), _case_z()
    use_w = trace > 0.0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)
    out = jnp.where(
        use_w[..., None], qw, jnp.where(use_x[..., None], qx, jnp.where(use_y[..., None], qy, qz))
    )
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def rotmat_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
        ],
        axis=-2,
    )


def identity_pose(dtype=jnp.float32, batch_shape: tuple = ()):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    t = jnp.zeros(batch_shape + (3,), dtype=dtype)
    return R, t
