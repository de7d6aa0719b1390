"""CLI smoke tests (the reference's 12-executable surface)."""

import json

import numpy as np
import pytest

from rgbd_odometry_tpu.cli import main


def test_cli_pnp(capsys):
    main(["pnp"])
    out = json.loads(capsys.readouterr().out)
    assert out["t_err"] < 1e-4
    assert out["residual_norms"][-1] < out["residual_norms"][0]


def test_cli_imu(capsys):
    main(["imu", "--steps", "50"])
    out = json.loads(capsys.readouterr().out)
    assert out["steps"] == 50
    assert np.isfinite(out["final_p"]).all()


def test_cli_calib_roundtrip(tmp_path, capsys):
    main(["calib", "--write-freiburg", str(tmp_path)])
    out = json.loads(capsys.readouterr().out)
    assert len(out["written"]) == 2
    main(["calib", "--file", str(tmp_path / "Freiburg_ROS_default_320x240.xml")])
    cam = json.loads(capsys.readouterr().out)
    assert cam["fx"] == pytest.approx(262.5)
    assert cam["width"] == 320


def test_cli_probe(capsys):
    """casualTestFunction parity: the two-frame energy-curve probe."""
    main(["probe", "--level", "1", "--iterations", "20"])
    out = json.loads(capsys.readouterr().out)
    assert out["level"] == 1
    assert len(out["energy"]) == 20
    e = [x for x in out["energy"] if x > 0]
    assert e and e[-1] <= e[0]  # the schedule reduces energy on this scene
    assert 0.0 < out["visible_ratio"] <= 1.0


def test_cli_photometric(tmp_path, capsys):
    est = str(tmp_path / "photo.txt")
    main(["photometric", "--frames", "4", "--out", est])
    err = capsys.readouterr().err
    assert err.count("frame") >= 3  # per-frame |eps| lines
    assert np.loadtxt(est, comments="#").shape[0] == 4


def test_cli_feature_vo(tmp_path, capsys):
    est = str(tmp_path / "fv.txt")
    main(["feature-vo", "--frames", "4", "--min-matches", "8", "--out", est])
    err = capsys.readouterr().err
    assert "good matches" in err
    assert np.loadtxt(est, comments="#").shape[0] == 4


def test_cli_dvo_dry(capsys):
    main(["dvo", "--frames", "4", "--dry"])
    err = capsys.readouterr().err
    assert "ingested 4 frames" in err


def test_cli_fused(tmp_path, capsys):
    """BASELINE.json config 5 through the CLI: IMU prior + edge DVO +
    PnP-fallback wiring runs end-to-end and stays accurate."""
    est = str(tmp_path / "fused.txt")
    main(["fused", "--frames", "6", "--iterations", "10,5,3,2", "--out", est,
          "--imu-refine"])
    out = capsys.readouterr()
    summary = json.loads(out.out.strip().splitlines()[-1])
    assert summary["frames"] == 6
    assert summary["ate_rmse"] < 0.02
    # the refined trajectory must not be worse than the visual estimate
    # (exact synthetic IMU windows); equality happens if the solve is a no-op
    assert summary["ate_rmse"] <= summary["ate_rmse_unrefined"] + 1e-4
    assert np.loadtxt(est, comments="#").shape[0] == 6


def test_cli_dvo_and_eval(tmp_path, capsys):
    est = str(tmp_path / "est.txt")
    ply = str(tmp_path / "map.ply")
    main(["dvo", "--frames", "5", "--iterations", "12,5,3,2", "--out", est,
          "--map-out", ply])
    out = capsys.readouterr()
    stats = json.loads(out.out.strip().splitlines()[-1])
    assert stats["ate_rmse"] < 0.02
    with open(ply) as f:
        header = [next(f) for _ in range(3)]
    assert header[0].strip() == "ply"
    n_pts = int(header[2].split()[-1])
    assert n_pts > 100  # at least the first keyframe's edge cloud
    main(["eval", est, est])
    ev = json.loads(capsys.readouterr().out)
    assert ev["ate_rmse_raw"] == 0.0
    assert ev["frames"] == 5
