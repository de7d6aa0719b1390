"""Executed cross-validation of the SECONDARY upstream solvers.

Round-3 extended the binary-level cross-validation from the flagship SolveDVO
to the rest of the solver inventory. Each comparison drives the UNMODIFIED
upstream implementation (compiled from /root/reference via build_secondary.sh
+ the mini-ROS stubs) on inputs generated here, against this framework's
TPU-native rebuild of the same component:

  1. ImuDeadReckon (/root/reference/src/ImuDeadReckon.cpp:67-95)
     vs  rgbd_odometry_tpu.solvers.imu.propagate_batch
     — STEP-EXACT: identical float32 nominal-state trajectories over hundreds
     of samples (the only semantic difference, our per-step quaternion
     normalization, stays inside float32 noise).

  2. SolvePnP::PnP Gauss-Newton (/root/reference/src/SolvePnP.cpp:148-203)
     vs  rgbd_odometry_tpu.solvers.pnp.gn_pnp
     — ITERATION-EXACT in float64: the upstream stores every GN iterate
     (stored_R/stored_T); each must match ours to ~1e-9.

  3. RGBDOdometry dense photometric GN (/root/reference/src/RGBDOdometry.cpp)
     vs  rgbd_odometry_tpu.solvers.photometric.solve_pyramid
     — BEHAVIORAL: the upstream's Jacobian table has a typo (tJ(0)=fx*fx/Z,
     missing the gx factor, RGBDOdometry.cpp:485) and swaps image rows/cols
     in back-projection (:471-473), which our rebuild deliberately fixes
     (solvers/photometric.py docstring). On identical frames (square camera,
     fx=fy, cx=cy, so the row/col swap is an exact transpose conjugation and
     can be interpreted away) we measure both against exact GT.

Usage:  python validation/refbuild/secondary_crossval.py [bindir] [--only imu,pnp]
Writes: validation/refbuild/SECONDARY_CROSSVAL_r3.log (full runs only)
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys
import tempfile

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
REPO = HERE.parent.parent
sys.path.insert(0, str(REPO))

import jax

# tiny problems: run on CPU, skip the device tunnel (the env's sitecustomize
# pins JAX_PLATFORMS, so the config flag is the only reliable override)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

LOG_LINES: list[str] = []


def log(msg: str = "") -> None:
    print(msg)
    LOG_LINES.append(msg)


def build(bindir: pathlib.Path, targets: str) -> None:
    subprocess.run(
        [str(HERE / "build_secondary.sh"), str(bindir), targets],
        check=True,
        capture_output=True,
    )


# ----------------------------------------------------------------------
# 1. IMU dead reckoning — step-exact
# ----------------------------------------------------------------------


def imu_sequence(n: int = 400):
    """Deterministic, smooth, bias-contaminated IMU stream (no RNG: the same
    bytes feed both implementations)."""
    t = np.arange(n, dtype=np.float64) / 100.0
    accel = np.stack(
        [
            0.35 * np.sin(1.3 * t),
            9.81 + 0.22 * np.cos(0.9 * t),
            0.15 * np.sin(2.1 * t + 0.4),
        ],
        -1,
    )
    gyro = np.stack(
        [
            0.40 * np.sin(0.7 * t) + 0.05,
            0.25 * np.cos(1.1 * t) + 0.03,
            0.30 * np.sin(0.5 * t + 1.0) + 0.02,
        ],
        -1,
    )
    return accel, gyro


def run_imu(bindir: pathlib.Path) -> bool:
    from rgbd_odometry_tpu.solvers import imu

    a_bias, g_bias = 0.02, 0.005
    accel, gyro = imu_sequence()

    lines = [
        " ".join(f"{x:.9e}" for x in np.concatenate([a, w]))
        for a, w in zip(accel, gyro)
    ]
    out = subprocess.run(
        [str(bindir / "ref_imu"), "0", str(a_bias), "0", str(g_bias)],
        input="\n".join(lines) + "\n",
        capture_output=True,
        text=True,
        check=True,
    )
    ref = np.array(
        [[float(x) for x in ln.split()] for ln in out.stdout.strip().splitlines()]
    )
    assert ref.shape == (len(accel), 10), ref.shape

    intr = imu.ImuIntrinsics.from_scalars(
        accel_bias=a_bias, gyro_bias=g_bias, dtype=jnp.float32
    )
    _, traj = imu.propagate_batch(
        imu.ImuState.identity(jnp.float32),
        jnp.asarray(accel, jnp.float32),
        jnp.asarray(gyro, jnp.float32),
        intr,
    )
    ours = np.concatenate(
        [np.asarray(traj.p), np.asarray(traj.v), np.asarray(traj.q)], axis=-1
    ).astype(np.float64)

    scale = np.maximum(1.0, np.abs(ref))
    rel = np.abs(ours - ref) / scale
    dp, dv, dq = rel[:, :3].max(), rel[:, 3:6].max(), rel[:, 6:].max()
    ok = dp < 5e-5 and dv < 5e-5 and dq < 5e-5
    log(
        f"[imu] {len(accel)} samples, biases a={a_bias} g={g_bias}: "
        f"max rel diff p={dp:.2e} v={dv:.2e} q={dq:.2e} "
        f"(float32 both sides; ours normalizes q per step, upstream does not) "
        f"-> {'MATCH' if ok else 'MISMATCH'}"
    )
    return ok


# ----------------------------------------------------------------------
# 2. SolvePnP Gauss-Newton — iteration-exact (float64)
# ----------------------------------------------------------------------


def pnp_problem(seed: int, init: str):
    from rgbd_odometry_tpu.core import geometry as geo

    rng = np.random.default_rng(seed)
    n = 40
    pts = np.stack(
        [rng.uniform(-1.2, 1.2, n), rng.uniform(-0.9, 0.9, n), rng.uniform(2.0, 5.0, n)],
        -1,
    )
    psi = rng.normal(0, 1, 6) * np.array([0.25, 0.25, 0.25, 0.08, 0.08, 0.08])
    R_gt, t_gt = (np.asarray(x, np.float64) for x in geo.se3_exp(jnp.asarray(psi)))
    fx = fy = 525.0
    cx, cy = 319.5, 239.5
    pb = (pts - t_gt) @ R_gt  # R^T (P - T)
    u = fx * pb[:, 0] / pb[:, 2] + cx
    v = fy * pb[:, 1] / pb[:, 2] + cy
    uv = np.stack([u, v], -1) + rng.normal(0, 0.3, (n, 2))  # pixel noise
    if init == "identity":
        R0, t0 = np.eye(3), np.zeros(3)
    else:  # perturbed ground truth — the reference's warm-start regime
        dpsi = rng.normal(0, 1, 6) * 0.04
        dR, dt = (np.asarray(x, np.float64) for x in geo.se3_exp(jnp.asarray(dpsi)))
        R0, t0 = R_gt @ dR, t_gt + R_gt @ dt
    return pts, uv, (fx, fy, cx, cy), (R0, t0), (R_gt, t_gt)


def run_pnp(bindir: pathlib.Path) -> bool:
    from rgbd_odometry_tpu.solvers import pnp as pnp_mod

    all_ok = True
    for seed, init in [(0, "warm"), (1, "warm"), (2, "warm"), (3, "identity"), (4, "identity")]:
        pts, uv, (fx, fy, cx, cy), (R0, t0), (R_gt, t_gt) = pnp_problem(seed, init)
        feed = [f"{fx} {fy} {cx} {cy}", str(len(pts))]
        feed += [
            " ".join(f"{x:.17e}" for x in np.concatenate([p, q]))
            for p, q in zip(pts, uv)
        ]
        feed.append(" ".join(f"{x:.17e}" for x in R0.reshape(-1)))
        feed.append(" ".join(f"{x:.17e}" for x in t0))
        out = subprocess.run(
            [str(bindir / "ref_pnp")],
            input="\n".join(feed) + "\n",
            capture_output=True,
            text=True,
            check=True,
        )
        rows = [
            [float(x) for x in ln.split()[1:]]
            for ln in out.stdout.strip().splitlines()
        ]
        ref_iters = [(np.array(r[:9]).reshape(3, 3), np.array(r[9:])) for r in rows]
        assert len(ref_iters) == 6  # init + 5 GN iterates

        im_norm = np.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)
        R, t = jnp.asarray(R0), jnp.asarray(t0)
        valid = jnp.ones(len(pts), bool)
        ours = [(np.asarray(R), np.asarray(t))]
        for _ in range(5):
            R, t, _ = pnp_mod.gn_pnp_step(
                jnp.asarray(pts), jnp.asarray(im_norm), R, t, valid
            )
            ours.append((np.asarray(R), np.asarray(t)))

        worst = max(
            max(np.abs(ra - rb).max(), np.abs(ta - tb).max())
            for (ra, ta), (rb, tb) in zip(ref_iters, ours)
        )
        t_err_ref = np.linalg.norm(ref_iters[-1][1] - t_gt)
        t_err_ours = np.linalg.norm(ours[-1][1] - t_gt)
        ok = worst < 1e-6
        all_ok &= ok
        log(
            f"[pnp] seed={seed} init={init}: worst per-iteration |diff| over "
            f"6 stored iterates = {worst:.2e} "
            f"(final |t-gt|: upstream {t_err_ref:.2e}, ours {t_err_ours:.2e}) "
            f"-> {'MATCH' if ok else 'MISMATCH'}"
        )
    return all_ok


# ----------------------------------------------------------------------
# 3. RGBDOdometry photometric GN — behavioral (upstream typo quantified)
# ----------------------------------------------------------------------

_SWAP = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])


def run_photometric(bindir: pathlib.Path, workdir: pathlib.Path) -> bool:
    import cv2

    from rgbd_odometry_tpu.config import CameraConfig, PhotometricConfig
    from rgbd_odometry_tpu.core.camera import Intrinsics
    from rgbd_odometry_tpu.core.pyramid import build_pyramid
    from rgbd_odometry_tpu.io.synthetic import Degradations, render_pair
    from rgbd_odometry_tpu.solvers import photometric

    # square camera, fx=fy, cx=cy: the upstream's row/col swap becomes an
    # exact transpose conjugation, interpretable without ambiguity
    cam = CameraConfig(width=240, height=240, fx=262.5, fy=262.5, cx=119.5, cy=119.5)
    psi = np.array([0.010, -0.006, 0.004, 0.004, -0.005, 0.003], np.float32)
    deg = Degradations(texture_amp=22.0)  # world-anchored texture: dense gradients
    (rg, rd), (ng, nd), (R_gt, t_gt) = render_pair(cam, psi, degrade=deg)

    calib = workdir / "calib_240.xml"
    fs = cv2.FileStorage(str(calib), cv2.FILE_STORAGE_WRITE)
    fs.write(
        "cameraMatrix",
        np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float64),
    )
    fs.write("distCoeffs", np.zeros((5, 1), np.float64))
    fs.release()

    def dump(name, gray, depth):
        g8 = np.clip(gray, 0, 255).astype(np.uint8)
        bgr = np.repeat(g8[..., None], 3, axis=-1)
        d16 = np.clip(depth, 0, 65535).astype(np.uint16)
        d16[d16 == 0] = 1  # upstream callback's zero-depth fix (:76-78 analog)
        cv2.imwrite(str(workdir / f"{name}_rgb.png"), bgr)
        cv2.imwrite(str(workdir / f"{name}_d16.png"), d16)

    dump("ref", rg, rd)
    dump("now", ng, nd)

    out = subprocess.run(
        [
            str(bindir / "ref_photometric"),
            str(calib),
            str(workdir / "ref_rgb.png"),
            str(workdir / "ref_d16.png"),
            str(workdir / "now_rgb.png"),
            str(workdir / "now_d16.png"),
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    M = np.array([float(x) for x in out.stdout.split()]).reshape(4, 4)
    # upstream depth unit is raw uint16 mm, and its axes are transposed:
    # interpret via S-conjugation + mm -> m
    R_up = _SWAP @ M[:3, :3] @ _SWAP
    t_up = _SWAP @ M[:3, 3] / 1000.0

    intr = Intrinsics.from_config(cam)
    ref_pyr = build_pyramid(jnp.asarray(rg, jnp.float32), jnp.asarray(rd, jnp.float32), 4)
    now_pyr = build_pyramid(jnp.asarray(ng, jnp.float32), jnp.asarray(nd, jnp.float32), 4)

    # mirror config: the upstream schedule (levels 3,2 / 3 iterations / exit
    # at ||eps||<200, unweighted)
    cfg_m = PhotometricConfig(levels=(3, 2), iterations_per_level=3, eps_norm_exit=200.0, use_huber=False)
    refs = photometric.extract_photo_ref(ref_pyr.gray, ref_pyr.depth, intr, cfg_m, cfg_m.max_points)
    R_m, t_m, _ = photometric.solve_pyramid(refs, now_pyr.gray, intr, cfg_m)

    # production config: our defaults (more iterations + Huber)
    cfg_p = PhotometricConfig(levels=(3, 2), iterations_per_level=15, eps_norm_exit=0.0, use_huber=True)
    refs_p = photometric.extract_photo_ref(ref_pyr.gray, ref_pyr.depth, intr, cfg_p, cfg_p.max_points)
    R_p, t_p, _ = photometric.solve_pyramid(refs_p, now_pyr.gray, intr, cfg_p)

    # Metric: reprojection discrepancy vs the GT pose at the finest solved
    # level (pixels). Pose-space distance is NOT the solver's objective and is
    # dominated by the scene's trans/rot-ambiguous directions (see
    # tests/test_secondary_solvers.py::test_photometric_recovers_small_motion,
    # where the same metric choice is derived); reprojection discrepancy
    # measures exactly the image alignment the photometric cost optimizes.
    f = refs[1] if refs[1].count > 0 else refs[2]
    lvl = 1 if refs[1].count > 0 else 2
    K = intr.at_level(lvl)
    pts3d = np.asarray(f.pts3d, np.float64)
    pv = np.asarray(f.valid)

    def proj(Rm, tm):
        xp = (pts3d - np.asarray(tm, np.float64)) @ np.asarray(Rm, np.float64)
        z = np.where(np.abs(xp[:, 2]) < 1e-9, 1e-9, xp[:, 2])
        return np.stack(
            [float(K.fx) * xp[:, 0] / z + float(K.cx),
             float(K.fy) * xp[:, 1] / z + float(K.cy)], -1
        )

    gt_px = proj(R_gt, t_gt)

    def reproj_err(Rm, tm):
        return float(np.linalg.norm(proj(Rm, tm) - gt_px, axis=-1)[pv].mean())

    d0 = reproj_err(np.eye(3), np.zeros(3))
    d_up = reproj_err(R_up, t_up)
    d_m = reproj_err(R_m, t_m)
    d_p = reproj_err(R_p, t_p)
    log(
        f"[photometric] 240x240 square cam, GT |t|={1000*np.linalg.norm(t_gt):.1f} mm: "
        f"mean reprojection discrepancy vs GT pose (px, level {lvl})"
    )
    log(f"[photometric]   identity (no solve):                     {d0:.3f} px")
    log(f"[photometric]   upstream binary (transpose-interpreted): {d_up:.3f} px")
    log(f"[photometric]   ours, upstream-mirror schedule:          {d_m:.3f} px")
    log(f"[photometric]   ours, production schedule:               {d_p:.3f} px")
    # behavioral gate: our mirror schedule must improve on identity and be
    # no worse than the (typo-carrying) upstream on the same frames
    ok = d_m < d0 and d_m <= d_up * 1.05 and np.isfinite(d_up)
    log(f"[photometric] -> {'OK' if ok else 'REGRESSION'}")
    return ok


def main() -> int:
    args = [a for a in sys.argv[1:]]
    only = "imu,pnp,photometric"
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1]
        del args[i : i + 2]
    bindir = pathlib.Path(args[0]) if args else pathlib.Path(
        tempfile.mkdtemp(prefix="refbuild_sec_")
    )
    missing = [
        t for t in only.split(",") if not (bindir / f"ref_{t}").exists()
    ]
    if missing:
        log(f"building {','.join(missing)} into {bindir} ...")
        build(bindir, ",".join(missing))

    with tempfile.TemporaryDirectory(prefix="photo_xval_") as wd:
        ok = True
        if "imu" in only:
            ok &= run_imu(bindir)
        if "pnp" in only:
            ok &= run_pnp(bindir)
        if "photometric" in only:
            ok &= run_photometric(bindir, pathlib.Path(wd))

    log()
    log(f"SECONDARY CROSSVAL: {'ALL OK' if ok else 'FAILURES PRESENT'}")
    if only == "imu,pnp,photometric":
        (HERE / "SECONDARY_CROSSVAL_r3.log").write_text("\n".join(LOG_LINES) + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
