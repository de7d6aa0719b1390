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

# Persistent XLA compilation cache: this host has ONE CPU core, so jit
# compiles dominate the suite's wall time (~12 min cold). Keyed on the
# computation hash, so code changes naturally miss; repeat runs of unchanged
# tests skip compilation entirely. (XLA:CPU may warn about machine-feature
# mismatches when artifacts cross process generations — harmless here.)
jax.config.update("jax_compilation_cache_dir", "/tmp/rgbd_odometry_tpu_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_collection_modifyitems(config, items):
    """Apply the measured slow-test manifest (tests/slow_manifest.txt).

    The fast tier (`pytest -m "not slow"`) must stay green in <5 minutes
    cold on this single-core host, where jit compiles dominate wall time.
    Rather than hand-marking dozens of tests, the tier is defined by a
    committed manifest of measured-slow nodeids; new tests default to the
    fast tier until a `tools/run_suite.py --retier` run measures them.
    """
    manifest = os.path.join(os.path.dirname(__file__), "slow_manifest.txt")
    try:
        with open(manifest) as f:
            slow_ids = {
                line.strip() for line in f if line.strip() and not line.startswith("#")
            }
    except OSError:
        return
    slow_marker = pytest.mark.slow
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if nodeid in slow_ids or nodeid.split("[")[0] in slow_ids:
            item.add_marker(slow_marker)
