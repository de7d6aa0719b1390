"""Pallas EDT kernel correctness (interpret mode on the CPU test mesh)."""

import numpy as np
import jax.numpy as jnp

from rgbd_odometry_tpu.ops.distance_transform import edt_l2_squared
from rgbd_odometry_tpu.pallas.edt import edt_l2_squared_pallas


def test_pallas_edt_matches_xla(rng):
    mask = np.zeros((48, 128), bool)
    pts = rng.integers(0, [48, 128], size=(40, 2))
    mask[pts[:, 0], pts[:, 1]] = True
    a = np.asarray(edt_l2_squared(jnp.asarray(mask)))
    b = np.asarray(edt_l2_squared_pallas(jnp.asarray(mask), interpret=True))
    np.testing.assert_allclose(b, a, atol=1e-3)


def test_pallas_edt_batched(rng):
    mask = rng.random((2, 16, 128)) < 0.02
    a = np.asarray(edt_l2_squared(jnp.asarray(mask)))
    b = np.asarray(edt_l2_squared_pallas(jnp.asarray(mask), interpret=True))
    np.testing.assert_allclose(b, a, atol=1e-3)
