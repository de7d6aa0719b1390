"""IMU dead-reckoning propagation — the pose initializer path.

Rebuilds `ImuDeadReckon` (/root/reference/src/ImuDeadReckon.cpp): nominal-
state propagation at a fixed IMU rate with constant accelerometer/gyro biases
and a hardcoded gravity vector (0, 9.7874, 0) (:21-23):

    p += v dt + 0.5 (R a_corr + g) dt^2        (:76)
    v += (R a_corr + g) dt                     (:77)
    q  = q * exp_quat((w - w_bias) dt)         (:80-81, :85-95)

TPU-native shape: a `lax.scan` over a whole IMU packet batch — thousands of
samples propagate in one fused program (the reference handles one 100 Hz
callback at a time), and the result seeds the edge-DVO solver's initial pose
(BASELINE.json config 5: "ImuDeadReckon init + edge DVO").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rgbd_odometry_tpu.core import geometry as geo

_PREC = jax.lax.Precision.HIGHEST

DEFAULT_GRAVITY = (0.0, 9.7874, 0.0)  # reference's hardcoded value (:21-23)


class ImuState(NamedTuple):
    """Nominal state (nsv_p, nsv_v, nsv_q of the reference, :15-19)."""

    p: jnp.ndarray  # (3,)
    v: jnp.ndarray  # (3,)
    q: jnp.ndarray  # (4,) quaternion (x, y, z, w)

    @staticmethod
    def identity(dtype=jnp.float32) -> "ImuState":
        return ImuState(
            p=jnp.zeros(3, dtype),
            v=jnp.zeros(3, dtype),
            q=jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype),
        )


class ImuIntrinsics(NamedTuple):
    """Bias/noise parameters (`ImuSetIntrinsics`, :30-42). Noise variances
    are the per-sample white-noise variances driving `preintegrate`'s
    error-state covariance propagation."""

    accel_bias: jnp.ndarray  # (3,)
    gyro_bias: jnp.ndarray  # (3,)
    accel_var: jnp.ndarray  # ()
    gyro_var: jnp.ndarray  # ()

    @staticmethod
    def from_scalars(accel_var=0.0, accel_bias=0.0, gyro_var=0.0, gyro_bias=0.0, dtype=jnp.float32):
        """Scalar biases replicate to all axes exactly as the reference does
        (aBias = a_b * Ones, :38-39)."""
        return ImuIntrinsics(
            accel_bias=jnp.full((3,), accel_bias, dtype),
            gyro_bias=jnp.full((3,), gyro_bias, dtype),
            accel_var=jnp.asarray(accel_var, dtype),
            gyro_var=jnp.asarray(gyro_var, dtype),
        )


def _quat_from_rotvec(w: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> quaternion (x,y,z,w) (`makeQuaternionFromVector`, :85-95),
    Taylor-safe at phi -> 0 (the reference divides by zero there)."""
    phi2 = jnp.sum(w * w, axis=-1, keepdims=True)
    phi = jnp.sqrt(phi2 + 1e-24)
    half = 0.5 * phi
    sinc_half = jnp.where(phi < 1e-6, 0.5 - phi2 / 48.0, jnp.sin(half) / phi)
    return jnp.concatenate([w * sinc_half, jnp.cos(half)], axis=-1)


def _quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, (x,y,z,w) component order."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def propagate_step(
    state: ImuState,
    accel: jnp.ndarray,
    gyro: jnp.ndarray,
    intr: ImuIntrinsics,
    dt: float = 1.0 / 100.0,
    gravity=DEFAULT_GRAVITY,
) -> ImuState:
    """One nominal-state update (`updateNominalStateWithCurrentMeasurements`,
    /root/reference/src/ImuDeadReckon.cpp:67-83)."""
    g = jnp.asarray(gravity, state.p.dtype)
    R = geo.rotmat_from_quat(state.q)
    a_corr = accel - intr.accel_bias
    w_dt = (gyro - intr.gyro_bias) * dt
    acc_world = jnp.einsum("ij,j->i", R, a_corr, precision=_PREC) + g
    p = state.p + state.v * dt + 0.5 * acc_world * dt * dt
    v = state.v + acc_world * dt
    q = _quat_mul(state.q, _quat_from_rotvec(w_dt))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return ImuState(p=p, v=v, q=q)


def propagate_batch(
    state: ImuState,
    accels: jnp.ndarray,  # (T, 3)
    gyros: jnp.ndarray,  # (T, 3)
    intr: ImuIntrinsics,
    dt: float = 1.0 / 100.0,
    gravity=DEFAULT_GRAVITY,
):
    """Propagate a whole IMU sample window in one `lax.scan`; returns the
    final state and the full (T,) trajectory of states."""

    def body(s, xs):
        a, w = xs
        s2 = propagate_step(s, a, w, intr, dt, gravity)
        return s2, s2

    return jax.lax.scan(body, state, (accels, gyros))


def pose_of(state: ImuState):
    """(R, t) of the current dead-reckoned pose — used to seed the edge-DVO
    relative solve (BASELINE config 5)."""
    return geo.rotmat_from_quat(state.q), state.p

# ---------------------------------------------------------------------------
# IMU preintegration (beyond the reference)
#
# The reference stops at dead-reckoning: ImuDeadReckon.cpp integrates the
# nominal state forward and the drift is the answer. Preintegration (Forster
# et al., "IMU Preintegration on Manifold") re-expresses a window of IMU
# samples as a single gravity-free, start-state-independent relative motion
# (dR, dv, dp) plus a propagated 9x9 covariance of its error — exactly the
# form a pose-graph edge needs. This completes the IMU path's integration
# into the beyond-parity graph stack: dead-reckon seeds the solver
# (BASELINE config 5), preintegrated windows become information-weighted
# edges in `solvers/pose_graph.py`.
#
# The discretization below matches `propagate_step` EXACTLY (pre-update
# rotation for the specific force, pre-update velocity for the position),
# so composing a preintegrated window onto a start state reproduces the
# dead-reckoner bit-for-bit in exact arithmetic — pinned against the
# upstream-crossval'd propagate_batch in tests/test_imu_preintegration.py.
# ---------------------------------------------------------------------------


class Preintegrated(NamedTuple):
    """A window of IMU samples compressed to one relative-motion measurement.

    All quantities are expressed in the body frame at the window start (i):
      dR: (3,3) body-i -> body-j rotation,
      dv: (3,)  gravity-free velocity change,  v_j = v_i + g*T + R_i dv
      dp: (3,)  gravity-free position change,  p_j = p_i + v_i*T + g*T^2/2 + R_i dp
      dt_total: () window duration T
      cov: (9,9) covariance of the error state (dtheta, dv, dp), with dtheta
           a RIGHT perturbation of dR (dR_true = dR_hat @ Exp(dtheta)).
    """

    dR: jnp.ndarray
    dv: jnp.ndarray
    dp: jnp.ndarray
    dt_total: jnp.ndarray
    cov: jnp.ndarray


def _so3_right_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian of SO(3): Exp(phi + d) ~= Exp(phi) Exp(Jr(phi) d).
    Taylor-safe at phi -> 0."""
    th2 = jnp.sum(phi * phi)
    th = jnp.sqrt(th2 + 1e-24)
    K = geo.hat(phi)
    small = th < 1e-5
    c1 = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-24))
    c2 = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                   (th - jnp.sin(th)) / jnp.maximum(th2 * th, 1e-24))
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - c1 * K + c2 * jnp.matmul(K, K, precision=_PREC)


def preintegrate(
    accels: jnp.ndarray,  # (T, 3) raw accelerometer samples
    gyros: jnp.ndarray,  # (T, 3) raw gyro samples
    intr: ImuIntrinsics,
    dt: float = 1.0 / 100.0,
) -> Preintegrated:
    """Preintegrate a window of IMU samples into a `Preintegrated` pytree.

    Bias correction uses `intr` (constant biases, like the reference's
    nominal-state propagation); `intr.accel_var` / `intr.gyro_var` are the
    per-sample (discrete) white-noise variances driving the covariance
    propagation the ImuIntrinsics docstring reserved. One `lax.scan`; vmap
    for batches of windows."""
    dtype = accels.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    def body(carry, xs):
        dR, dv, dp, cov = carry
        a_raw, w_raw = xs
        a = a_raw - intr.accel_bias
        phi = (w_raw - intr.gyro_bias) * dt
        E = geo.so3_exp(phi)
        # HIGHEST precision throughout: the default TPU bf16 matmul drifts
        # the dR product chain by ~1e-3 over tens of samples (measured on
        # chip), breaking the pinned dead-reckoner equivalence.
        Ra = jnp.matmul(dR, a, precision=_PREC)
        hatRa = jnp.matmul(dR, geo.hat(a), precision=_PREC)
        # error-state transition (dtheta, dv, dp) — right perturbation on dR
        A = jnp.zeros((9, 9), dtype)
        A = A.at[0:3, 0:3].set(E.T)
        A = A.at[3:6, 0:3].set(-hatRa * dt)
        A = A.at[3:6, 3:6].set(eye3)
        A = A.at[6:9, 0:3].set(-0.5 * hatRa * dt * dt)
        A = A.at[6:9, 3:6].set(eye3 * dt)
        A = A.at[6:9, 6:9].set(eye3)
        # noise input: gyro white noise -> dtheta via Jr*dt, accel -> dv, dp
        B = jnp.zeros((9, 6), dtype)
        B = B.at[0:3, 0:3].set(_so3_right_jacobian(phi) * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt * dt)
        Q = jnp.concatenate([jnp.full((3,), intr.gyro_var, dtype),
                             jnp.full((3,), intr.accel_var, dtype)])
        cov = jnp.matmul(jnp.matmul(A, cov, precision=_PREC), A.T, precision=_PREC) \
            + jnp.matmul(B * Q[None, :], B.T, precision=_PREC)
        # nominal update — the exact propagate_step discretization with the
        # start state factored out (pre-update dR and dv on the right)
        dp = dp + dv * dt + 0.5 * Ra * dt * dt
        dv = dv + Ra * dt
        dR = jnp.matmul(dR, E, precision=_PREC)
        return (dR, dv, dp, cov), None

    init = (eye3, jnp.zeros(3, dtype), jnp.zeros(3, dtype), jnp.zeros((9, 9), dtype))
    (dR, dv, dp, cov), _ = jax.lax.scan(body, init, (accels, gyros))
    T = jnp.asarray(accels.shape[0] * dt, dtype)
    return Preintegrated(dR=dR, dv=dv, dp=dp, dt_total=T, cov=cov)


def compose_preintegrated(
    state: ImuState, pre: Preintegrated, gravity=DEFAULT_GRAVITY
) -> ImuState:
    """Apply a preintegrated window to a start state; equals running
    `propagate_batch` over the window's raw samples (pinned in tests)."""
    g = jnp.asarray(gravity, state.p.dtype)
    R0 = geo.rotmat_from_quat(state.q)
    T = pre.dt_total
    p = state.p + state.v * T + 0.5 * g * T * T + jnp.matmul(R0, pre.dp, precision=_PREC)
    v = state.v + g * T + jnp.matmul(R0, pre.dv, precision=_PREC)
    dq = geo.quat_from_rotmat(pre.dR)
    q = _quat_mul(state.q, dq)
    q = q / jnp.linalg.norm(q)
    return ImuState(p=p, v=v, q=q)


def preintegrated_pose_information(pre: Preintegrated, ridge: float = 1e-12) -> jnp.ndarray:
    """(6,6) information matrix of the window's relative POSE in the pose
    graph's (translation, rotation) twist layout — the (dp, dtheta) marginal
    of the 9x9 covariance, inverted. Velocity is marginalized by dropping
    its rows/cols (exact for a covariance marginal). Feed a batch of these
    through `pose_graph.normalized_information_sqrt` to whiten IMU edges on
    the same scale as solver-produced DVO edges."""
    idx = jnp.asarray([6, 7, 8, 0, 1, 2])  # (dp, dtheta)
    P = pre.cov[idx][:, idx]
    eye = jnp.eye(6, dtype=P.dtype)
    return jnp.linalg.inv(P + ridge * eye)


def imu_relative_pose_edges(
    i: jnp.ndarray,  # (E,) int32 source keyframe node ids
    j: jnp.ndarray,  # (E,) int32 target keyframe node ids
    R_i: jnp.ndarray,  # (E, 3, 3) world orientation of node i (linearization)
    v_i: jnp.ndarray,  # (E, 3) world velocity at node i (linearization)
    pres: Preintegrated,  # vmapped/stacked windows, leading dim E
    gravity=DEFAULT_GRAVITY,
    weight: float = 1.0,
):
    """Convert preintegrated windows into `PoseGraphEdges` pseudo-measurements.

    A full IMU factor also estimates velocity and gravity direction; a
    pose-graph-only back end fixes those at the current estimates (R_i, v_i)
    and forms the induced relative-pose measurement — the standard
    graph-compression trick. The measurement is:
        R_rel = dR
        t_rel = R_i^T (v_i*T + g*T^2/2) + dp
    with information from `preintegrated_pose_information` (caller whitens
    via `normalized_information_sqrt` to mix with DVO edges)."""
    from rgbd_odometry_tpu.solvers import pose_graph as pg

    g = jnp.asarray(gravity, v_i.dtype)
    T = pres.dt_total  # (E,)
    drift = v_i * T[:, None] + 0.5 * g[None, :] * (T * T)[:, None]
    t_rel = jnp.einsum("eij,ei->ej", R_i, drift, precision=_PREC) + pres.dp
    w = jnp.full(i.shape, weight, v_i.dtype)
    return pg.PoseGraphEdges(
        i=jnp.asarray(i, jnp.int32), j=jnp.asarray(j, jnp.int32),
        R_rel=pres.dR, t_rel=t_rel, weight=w, sqrt_info=None,
    )


def velocities_from_trajectory(t: jnp.ndarray, stamps: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) world-frame keyframe velocities by central finite differences —
    the practical source of `imu_relative_pose_edges`'s v_i when no GT or
    full-state estimator exists: the DVO trajectory itself. Endpoints use
    one-sided differences. ``stamps``: (N,) seconds."""
    t = jnp.asarray(t)
    stamps = jnp.asarray(stamps, t.dtype)
    dt_fwd = (stamps[2:] - stamps[:-2])[:, None]
    v_mid = (t[2:] - t[:-2]) / jnp.maximum(dt_fwd, 1e-9)
    v0 = (t[1] - t[0]) / jnp.maximum(stamps[1] - stamps[0], 1e-9)
    vN = (t[-1] - t[-2]) / jnp.maximum(stamps[-1] - stamps[-2], 1e-9)
    return jnp.concatenate([v0[None], v_mid, vN[None]], axis=0)
