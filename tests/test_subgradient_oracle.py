"""Full-loop parity of the sub-gradient mode against a float64 numpy oracle.

The reference's `runIterations` (/root/reference/src/SolveDVO.cpp:619-1017)
interleaves momentum, L2 regularization, preconditioning, the square-summable
step schedule, the trust-region projection, best-iterate bookkeeping and the
early-termination freeze — single-iteration oracles cannot catch an error in
the *interplay* (e.g. momentum fed from a frozen state, or the step index
off by one). Here the complete 50-iteration loop of `edge_dvo.run_level` is
checked iteration by iteration — pose trajectory AND energy curve — against
the independent scalar reimplementation in tests/oracle_subgradient.py, on
three distinct synthetic scenes at two pyramid levels each.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from rgbd_odometry_tpu.config import CameraConfig, SolverConfig
from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.core.pyramid import build_pyramid
from rgbd_odometry_tpu.io.synthetic import render_pair
from rgbd_odometry_tpu.solvers import edge_dvo

from oracle_subgradient import run_level_oracle

N_ITERS = 50
MAX_PTS = (512, 256)

SCENES = [
    # (seed, twist psi) — distinct geometry and motion per scene
    (0, np.array([0.010, -0.008, 0.005, 0.004, -0.006, 0.003], np.float32)),
    (3, np.array([-0.012, 0.006, -0.004, -0.005, 0.003, 0.006], np.float32)),
    (7, np.array([0.004, 0.010, 0.008, 0.006, 0.002, -0.005], np.float32)),
]


def _level_inputs(seed, psi, level):
    cam = CameraConfig(width=160, height=120, fx=176.0, fy=176.0, cx=79.5, cy=59.5)
    (rg, rd), (ng, nd), _ = render_pair(cam, psi, seed=seed)
    ref_pyr = build_pyramid(jnp.asarray(rg), jnp.asarray(rd), 2)
    now_pyr = build_pyramid(jnp.asarray(ng), jnp.asarray(nd), 2)
    cfg = SolverConfig(method="subgradient")
    intr = Intrinsics.from_config(cam).at_level(level)
    ref = edge_dvo.extract_ref_level(
        ref_pyr.gray[level], ref_pyr.depth[level], intr, MAX_PTS[level], cfg
    )
    now = edge_dvo.prepare_now_level(now_pyr.gray[level], cfg)
    return ref, now, intr, cfg


def _generic_start(scene):
    """A small non-identity warm start. At exact identity every reprojected
    point lands precisely ON a pixel boundary (u == ref pixel column), where
    float32 device arithmetic and the float64 oracle can floor to different
    pixels — a measurement artifact, not an optimizer-parity signal. A generic
    start keeps all coordinates far from integer boundaries."""
    from rgbd_odometry_tpu.core import geometry as geo

    start_twist = jnp.asarray(
        [0.003, -0.002, 0.001, 0.002, 0.001, -0.002], jnp.float32
    ) * (1.0 + 0.3 * scene)
    return geo.se3_exp(start_twist)


@pytest.mark.parametrize("level", [0, 1])
@pytest.mark.parametrize("scene", range(len(SCENES)))
def test_run_level_matches_numpy_oracle(scene, level):
    seed, psi = SCENES[scene]
    ref, now, intr, cfg = _level_inputs(seed, psi, level)

    R0, t0 = _generic_start(scene)
    best_R, best_t, diag, (Rs, ts) = edge_dvo.run_level(
        ref, now, intr, R0, t0, cfg, N_ITERS, collect_trajectory=True
    )

    oracle = run_level_oracle(
        np.asarray(now.dt, np.float64),
        np.asarray(now.dgx, np.float64),
        np.asarray(now.dgy, np.float64),
        np.asarray(ref.pts3d, np.float64),
        np.asarray(ref.valid),
        float(intr.fx),
        float(intr.fy),
        float(intr.cx),
        float(intr.cy),
        np.asarray(R0, np.float64),
        np.asarray(t0, np.float64),
        N_ITERS,
    )

    # sanity: the loop actually does something on this scene
    assert oracle["energies"][0] > 0.0
    assert np.sum(np.asarray(ref.valid)) > 50

    # energy curve, iteration by iteration (normalized-DT units, magnitude
    # O(1e2-1e3); float32 gather+reduce vs float64 -> relative agreement)
    np.testing.assert_allclose(
        np.asarray(diag.energy, np.float64),
        oracle["energies"],
        rtol=1e-5,
        atol=1e-2,
        err_msg=f"energy curve diverged (scene {scene}, level {level})",
    )

    # pose trajectory, iteration by iteration
    np.testing.assert_allclose(
        np.asarray(Rs, np.float64), oracle["Rs"], atol=3e-5,
        err_msg=f"rotation trajectory diverged (scene {scene}, level {level})",
    )
    np.testing.assert_allclose(
        np.asarray(ts, np.float64), oracle["ts"], atol=3e-5,
        err_msg=f"translation trajectory diverged (scene {scene}, level {level})",
    )

    # best-iterate bookkeeping
    assert int(diag.best_iter) == oracle["best_iter"]
    np.testing.assert_allclose(
        float(diag.best_energy), oracle["best_energy"], rtol=1e-5, atol=1e-2
    )
    np.testing.assert_allclose(np.asarray(best_R, np.float64), oracle["best_R"], atol=3e-5)
    np.testing.assert_allclose(np.asarray(best_t, np.float64), oracle["best_t"], atol=3e-5)


def test_oracle_detects_schedule_perturbations():
    """The oracle has teeth: a wrong momentum/step/trust constant must show.

    Starts from the generic non-identity pose: at exact identity the L2
    regularizer's normalized log-pose is zero, so an l2_lambda perturbation
    would be structurally invisible there."""
    seed, psi = SCENES[0]
    ref, now, intr, cfg = _level_inputs(seed, psi, 1)
    R0, t0 = _generic_start(0)
    R0, t0 = np.asarray(R0, np.float64), np.asarray(t0, np.float64)
    base = run_level_oracle(
        np.asarray(now.dt, np.float64),
        np.asarray(now.dgx, np.float64),
        np.asarray(now.dgy, np.float64),
        np.asarray(ref.pts3d, np.float64),
        np.asarray(ref.valid),
        float(intr.fx), float(intr.fy), float(intr.cx), float(intr.cy),
        R0, t0, N_ITERS,
    )
    # notes on what is NOT probed:
    #  * a scaled step_length — while the trust region clamps |psi| to the
    #    radius (the usual regime far from the optimum), psi's direction is
    #    independent of step_length, so scaling it is invisible by
    #    construction;
    #  * l2_lambda 0.05 -> 0 — the reference adds lambda * UNIT log-pose to
    #    the RAW gradient J^T W eps of magnitude 1e3-1e5
    #    (/root/reference/src/SolveDVO.cpp:742,795: cPsi normalized, g not),
    #    so the regularizer shifts the descent direction by ~5e-6
    #    relative — a faithful near-no-op (measured deviation ~1.6e-6 here).
    #    l2_lambda=100 below verifies the term is wired at all.
    for kwargs in ({"momentum": 0.4}, {"precondition_rot": 0.7},
                   {"trust_region_radius": 0.004}, {"l2_lambda": 100.0}):
        pert = run_level_oracle(
            np.asarray(now.dt, np.float64),
            np.asarray(now.dgx, np.float64),
            np.asarray(now.dgy, np.float64),
            np.asarray(ref.pts3d, np.float64),
            np.asarray(ref.valid),
            float(intr.fx), float(intr.fy), float(intr.cx), float(intr.cy),
            R0, t0, N_ITERS,
            **kwargs,
        )
        dev = np.max(np.abs(pert["ts"] - base["ts"]))
        assert dev > 1e-4, f"perturbation {kwargs} invisible to the oracle"
