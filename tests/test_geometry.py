"""Golden tests for SO(3)/SE(3) against closed-form references.

Mirrors the reference's scratch micro-tests (Sophus exp check,
/root/reference/src/imuTest.cpp:92-103; SVD orthonormalization,
/root/reference/src/tf.cpp:71-96) as a real test suite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_odometry_tpu.core import geometry as geo


def _random_twists(rng, n=64, scale=1.0):
    return (rng.standard_normal((n, 6)) * scale).astype(np.float32)


def test_hat_vee_roundtrip(rng):
    w = rng.standard_normal((32, 3)).astype(np.float32)
    W = geo.hat(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(geo.vee(W)), w, rtol=1e-6)
    # antisymmetry
    np.testing.assert_allclose(np.asarray(W + jnp.swapaxes(W, -1, -2)), 0.0, atol=1e-7)


def test_so3_exp_matches_rodrigues(rng):
    import cv2

    w = rng.standard_normal((16, 3)).astype(np.float64) * 1.5
    R = np.asarray(geo.so3_exp(jnp.asarray(w, jnp.float32)))
    for i in range(len(w)):
        R_cv, _ = cv2.Rodrigues(w[i])
        np.testing.assert_allclose(R[i], R_cv, atol=2e-6)


def test_so3_exp_log_roundtrip(rng):
    w = rng.standard_normal((64, 3)).astype(np.float32)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(1e-4, 3.0, (64, 1))
    R = geo.so3_exp(jnp.asarray(w))
    w2 = np.asarray(geo.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=3e-5)


def test_so3_log_near_pi(rng):
    axis = rng.standard_normal((8, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = (axis * (np.pi - 1e-4)).astype(np.float32)
    R = geo.so3_exp(jnp.asarray(w))
    w2 = np.asarray(geo.so3_log(R))
    # log returns +-w near pi; compare rotations, not twists
    R2 = np.asarray(geo.so3_exp(jnp.asarray(w2)))
    # theta-from-trace is sqrt(eps)-conditioned at pi: ~1e-3 is float32-optimal
    np.testing.assert_allclose(R2, np.asarray(R), atol=2e-3)


def test_se3_exp_log_roundtrip(rng):
    psi = _random_twists(rng, scale=0.5)
    R, t = geo.se3_exp(jnp.asarray(psi))
    psi2 = np.asarray(geo.se3_log(R, t))
    np.testing.assert_allclose(psi2, psi, atol=1e-4)


def test_se3_exp_small_angle_is_translation(rng):
    psi = np.zeros((4, 6), np.float32)
    psi[:, :3] = rng.standard_normal((4, 3))
    R, t = geo.se3_exp(jnp.asarray(psi))
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), psi[:, :3], atol=1e-6)


def test_compose_inverse(rng):
    psi = _random_twists(rng, n=8, scale=0.5)
    R, t = geo.se3_exp(jnp.asarray(psi))
    Ri, ti = geo.inverse(R, t)
    Rc, tc = geo.compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-6)


@pytest.mark.parametrize("method", ["svd", "newton"])
def test_rotationize(rng, method):
    psi = _random_twists(rng, n=16, scale=1.0)
    R, _ = geo.se3_exp(jnp.asarray(psi))
    noisy = np.asarray(R) + rng.standard_normal(R.shape).astype(np.float32) * 1e-3
    fixed = np.asarray(geo.rotationize(jnp.asarray(noisy), method=method))
    eye = np.broadcast_to(np.eye(3), fixed.shape)
    np.testing.assert_allclose(fixed @ fixed.transpose(0, 2, 1), eye, atol=1e-5)
    # close to the original rotation
    assert np.abs(fixed - np.asarray(R)).max() < 5e-3


def test_quat_roundtrip(rng):
    psi = _random_twists(rng, n=64, scale=2.0)
    R, _ = geo.se3_exp(jnp.asarray(psi))
    q = geo.quat_from_rotmat(R)
    R2 = np.asarray(geo.rotmat_from_quat(q))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-5)


def test_quat_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    w = rng.standard_normal((16, 3)).astype(np.float32)
    R = np.asarray(geo.so3_exp(jnp.asarray(w)))
    q = np.asarray(geo.quat_from_rotmat(jnp.asarray(R)))
    q_ref = Rotation.from_matrix(R.astype(np.float64)).as_quat()  # (x,y,z,w)
    # quaternions are double covers; align signs
    sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q_ref, atol=1e-5)
