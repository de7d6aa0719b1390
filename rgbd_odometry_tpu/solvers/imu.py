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
    """Bias/noise parameters (`ImuSetIntrinsics`, :30-42). Noise variances are
    carried for (future) error-state covariance propagation."""

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
