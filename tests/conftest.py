"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests use `jax.sharding.Mesh` over these host devices —
no TPU pod required; the real-TPU path is exercised by bench.py and the
driver's dryrun_multichip. Note the environment pins JAX_PLATFORMS=axon via
sitecustomize, so we must override through jax.config, not the env var.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
