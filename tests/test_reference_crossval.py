"""EXECUTED cross-validation against the actual upstream reference binary.

Rounds 1-3 carried the honest caveat that the accuracy bridge (byte-compatible
XML dumps + the estPoses.txt protocol) had never carried real reference
output, because the reference is a ROS node. validation/refbuild closes that:
the upstream SolveDVO.cpp compiles unmodified from /root/reference against a
from-scratch mini-ROS stub tree and runs offline in its own
__DATA_FROM_XML_FILES__ mode (/root/reference/src/SolveDVO.cpp:1920-1941).

This test builds that binary, runs it on a synthetic sequence dumped by
`cli dump`, runs this framework's reference-parity mode on the SAME frames,
and asserts the two independent implementations (Eigen/OpenCV C++ vs JAX)
agree within the schedule's own single-pair noise floor.
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
REFBUILD = os.path.join(os.path.dirname(HERE), "validation", "refbuild")
N_FRAMES = 10

pytestmark = [
    pytest.mark.slow,  # compiles the upstream C++ tree: minutes, not seconds
    pytest.mark.skipif(
        not (os.path.isdir(REF) and shutil.which("g++")),
        reason="reference sources or toolchain unavailable",
    ),
]


def _binary(xml_dir: str, workdir: str) -> str:
    """Build the reference binary for the given frame dir (cached per dir)."""
    out = os.path.join(workdir, "ref_dvo")
    res = subprocess.run(
        [
            os.path.join(REFBUILD, "build.sh"),
            xml_dir,
            "0",
            str(N_FRAMES - 1),
            "1",
            workdir,
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert os.path.exists(out)
    return out


def test_reference_binary_and_parity_mode_agree(tmp_path):
    from rgbd_odometry_tpu.cli import main

    xml = str(tmp_path / "xml")
    os.makedirs(xml)
    main(["calib", "--write-freiburg", xml])
    main(["dump", "--frames", str(N_FRAMES), "--out-dir", xml])

    # the upstream binary, offline on those frames
    rundir = tmp_path / "run"
    (rundir / "poses").mkdir(parents=True)
    binary = _binary(xml, str(tmp_path))
    res = subprocess.run(
        [binary, os.path.join(xml, "Freiburg_ROS_default_320x240.xml")],
        cwd=str(rundir),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    est_ref = rundir / "poses" / "estPoses.txt"
    assert est_ref.exists()
    assert np.loadtxt(str(est_ref)).shape == (N_FRAMES - 1, 7)

    # this framework, reference-parity mode, SAME frames
    mine = str(tmp_path / "mine.txt")
    main(
        [
            "dvo", "--source", f"xml:{xml}", "--method", "subgradient",
            "--iterations", "50,50,50,50", "--out", mine,
        ]
    )

    sys.path.insert(0, REFBUILD)
    try:
        from compare_crossval import main as compare
    finally:
        sys.path.remove(REFBUILD)
    stats = compare(str(est_ref), mine)
    print(json.dumps(stats))

    assert stats["frames_compared"] == N_FRAMES - 1
    # Two independent implementations of the same 50x4 subgradient schedule:
    # each lands within the schedule's own single-pair noise envelope
    # (tools/accuracy_sweep.py: 5-13 mm mean t_err per pair at this
    # resolution), so trajectory cross-agreement is asserted at that scale —
    # measured 4.6 mm ATE / 0.08 deg mean step rotation over 40 frames.
    assert stats["ate_mine_vs_ref_mm"] < 15.0, stats
    assert stats["rel_step_dt_mm"]["mean"] < 8.0, stats
    assert stats["rel_step_dR_deg"]["max"] < 0.6, stats
