"""Executed cross-validation of the SECONDARY solvers against the actual
upstream implementations (ImuDeadReckon + SolvePnP::PnP), compiled unmodified
from /root/reference via validation/refbuild/build_secondary.sh.

The full three-way comparison (including the behavioral photometric-GN race,
whose RGBDOdometry build is the slow one) lives in
validation/refbuild/secondary_crossval.py -> SECONDARY_CROSSVAL_r3.log; this
regression test keeps the two EXACT comparisons in every suite run:

  * IMU dead-reckoning: step-exact float32 trajectory match over 400 samples
    (/root/reference/src/ImuDeadReckon.cpp:67-95 vs solvers/imu.py),
  * Gauss-Newton PnP: iteration-exact float64 match of all stored GN iterates
    on 5 problems (/root/reference/src/SolvePnP.cpp:148-203 vs
    solvers/pnp.gn_pnp_step).

Runs in a subprocess because the comparison enables jax x64, which must not
leak into this process.
"""

import os
import shutil
import subprocess
import sys

import pytest

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
REFBUILD = os.path.join(os.path.dirname(HERE), "validation", "refbuild")

pytestmark = [
    pytest.mark.slow,  # compiles three upstream C++ solvers: minutes
    pytest.mark.skipif(
        not (os.path.isdir(REF) and shutil.which("g++")),
        reason="reference sources or toolchain unavailable",
    ),
]


def test_upstream_imu_and_pnp_match_exactly(tmp_path):
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REFBUILD, "secondary_crossval.py"),
            str(tmp_path),
            "--only",
            "imu,pnp",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert res.returncode == 0, (res.stdout[-3000:], res.stderr[-2000:])
    assert "[imu]" in res.stdout and "MISMATCH" not in res.stdout
    assert res.stdout.count("-> MATCH") == 6  # 1 imu + 5 pnp problems
