"""Float64 numpy oracle of the reference's `runIterations` sub-gradient loop.

An independent, scalar-clarity reimplementation of the full per-level
optimizer schedule of /root/reference/src/SolveDVO.cpp:619-1017:

  * residual gather: floor lookup into the (normalized) distance transform
    (:446) with the inclusive-far-edge visibility test (:435-441),
  * robust weights w(r) = 6/(6 + r^2/0.25) (`getWeightOf`, :1047-1053),
  * the dehomogenized-coordinate Jacobian quirk of
    `computeJacobianOfNowFrame` (:306-414),
  * g = J^T W eps (:714-777), L2 regularization lambda=0.05 on the
    *normalized* log-pose (:734-743, :795-797),
  * momentum d = (1-beta) g + beta d, beta = 0.5 (:653, :799),
  * diagonal preconditioner diag(1,1,1,.5,.5,.5) (:723-730),
  * square-summable step 9e-2/(itr-4) for itr>5 (:772-773),
  * trust-region projection ||psi|| <= 0.003 (:830-839),
  * SE(3) exp, right-multiplied compose cT += cR xt; cR *= xR (:905-917),
  * Newton-Schulz re-orthonormalization standing in for `rotationize`
    (:918-919, :1269-1282; for near-orthogonal R the two agree to <1e-12),
  * best-iterate bookkeeping with <= tie-breaking (:696-705),
  * early-termination freeze at ||psi|| < 1e-7 with zeroed trailing energy
    entries (:872-878).

It is used by tests/test_subgradient_oracle.py to check
`edge_dvo.run_level` *iteration by iteration* (pose + energy) — nothing here
imports the package under test beyond plain array inputs.

One deliberate measurement-alignment choice: reprojected pixel coordinates
are rounded to float32 before the floor lookup, so the oracle makes the same
integer-pixel decision as the float32 device code when a point lands within
one float32 ulp of a pixel boundary. All other arithmetic is float64.
"""

from __future__ import annotations

import numpy as np


def _hat(w):
    return np.array(
        [
            [0.0, -w[2], w[1]],
            [w[2], 0.0, -w[0]],
            [-w[1], w[0], 0.0],
        ]
    )


def _sinc_coeffs(theta2):
    theta = np.sqrt(theta2)
    if theta2 < 1e-8:
        a = 1.0 - theta2 / 6.0
        b = 0.5 - theta2 / 24.0
        c = 1.0 / 6.0 - theta2 / 120.0
    else:
        a = np.sin(theta) / theta
        b = (1.0 - np.cos(theta)) / theta2
        c = (theta - np.sin(theta)) / (theta2 * theta)
    return a, b, c


def se3_exp(psi):
    v, w = psi[:3], psi[3:]
    theta2 = float(w @ w)
    a, b, c = _sinc_coeffs(theta2)
    W = _hat(w)
    WW = W @ W
    R = np.eye(3) + a * W + b * WW
    V = np.eye(3) + b * W + c * WW
    return R, V @ v


def so3_log(R):
    cos_theta = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = np.arccos(cos_theta)
    w_asym = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    if theta < 1e-5:
        return 0.5 * (1.0 + theta**2 / 6.0) * w_asym
    return 0.5 * theta / np.sin(theta) * w_asym


def se3_log(R, t):
    w = so3_log(R)
    theta2 = float(w @ w)
    a, b, _ = _sinc_coeffs(theta2)
    W = _hat(w)
    WW = W @ W
    if theta2 < 1e-3:  # mirrors core.geometry.se3_log's float32 threshold
        coef = 1.0 / 12.0 + theta2 / 720.0
    else:
        coef = (1.0 - a / (2.0 * b)) / theta2
    Vinv = np.eye(3) - 0.5 * W + coef * WW
    return np.concatenate([Vinv @ t, w])


def rotationize_newton(R, iters=3):
    X = R.copy()
    for _ in range(iters):
        X = X @ (1.5 * np.eye(3) - 0.5 * (X.T @ X))
    return X


def run_level_oracle(
    dt,
    dgx,
    dgy,
    pts3d,
    valid,
    fx,
    fy,
    cx,
    cy,
    R0,
    t0,
    n_iters,
    *,
    step_length=9.0e-2,
    momentum=0.5,
    precondition_rot=0.5,
    l2_lambda=0.05,
    trust_region_radius=0.003,
    psi_norm_termination=1.0e-7,
    weight_sigma2=0.25,
):
    """Run the full sub-gradient level solve; returns the per-iteration record.

    Inputs are plain float64 numpy arrays (`dt`/`dgx`/`dgy`: (H, W) DT and its
    central-difference gradients; `pts3d`: (K, 3) ref edge points in metres;
    `valid`: (K,) mask). Returns a dict with `energies` (n,), `Rs` (n,3,3) /
    `ts` (n,3) post-update poses, and the best-iterate pose/energy/index.
    """
    h, w_img = dt.shape
    R = np.asarray(R0, np.float64).copy()
    t = np.asarray(t0, np.float64).copy()
    pts3d = np.asarray(pts3d, np.float64)
    valid = np.asarray(valid, bool)
    descent = np.zeros(6)
    precond = np.array([1.0, 1.0, 1.0] + [precondition_rot] * 3)
    done = False
    best = {"energy": 1.0e10, "R": np.eye(3), "t": np.zeros(3), "iter": -1}
    energies = np.zeros(n_iters)
    Rs = np.zeros((n_iters, 3, 3))
    ts = np.zeros((n_iters, 3))

    for itr in range(n_iters):
        # ---- project ref edge points into the now frame -------------------
        xp = (pts3d - t) @ R  # R^T (X - t), row-vector form
        z = xp[:, 2]
        zsafe = np.where(np.abs(z) < 1e-12, 1e-12, z)
        xn = xp[:, 0] / zsafe
        yn = xp[:, 1] / zsafe
        u = fx * xn + cx
        v = fy * yn + cy
        visible = (u >= 0) & (u <= w_img) & (v >= 0) & (v <= h) & valid

        # ---- floor gather of DT + gradients (float32 pixel decision) ------
        u32 = np.float64(np.float32(u))
        v32 = np.float64(np.float32(v))
        ui = np.clip(np.floor(np.clip(u32, 0, w_img - 1)).astype(int), 0, w_img - 1)
        vi = np.clip(np.floor(np.clip(v32, 0, h - 1)).astype(int), 0, h - 1)
        eps = np.where(visible, dt[vi, ui], 0.0)
        g0 = np.where(visible, dgx[vi, ui], 0.0)
        g1 = np.where(visible, dgy[vi, ui], 0.0)
        wgt = np.where(visible, 6.0 / (6.0 + eps * eps / weight_sigma2), 0.0)
        energy = np.sqrt(np.sum(eps * eps))

        # ---- best-iterate bookkeeping (<=: later ties win) -----------------
        if energy <= best["energy"] and not done:
            best = {"energy": energy, "R": R.copy(), "t": t.copy(), "iter": itr}

        # ---- per-point Jacobian, dehomogenized reference quirk -------------
        ga = np.stack(
            [g0 * fx, g1 * fy, -(g0 * fx * xn + g1 * fy * yn)], axis=-1
        )  # (K, 3) = G @ A1 with (X, Y, Z) -> (xn, yn, 1)
        j_trans = -(ga @ R.T)  # -R ga per point (A2 translation block ^T)
        hvec = np.stack([xn, yn, np.ones_like(xn)], axis=-1)
        m = hvec @ R  # R^T h
        j_rot = np.cross(ga, m)
        J = np.concatenate([j_trans, j_rot], axis=-1)
        J = np.where(visible[:, None], J, 0.0)

        # ---- sub-gradient step ---------------------------------------------
        g = J.T @ (wgt * eps)
        cpsi = se3_log(R, t)
        norm = np.linalg.norm(cpsi)
        if norm > 0:
            cpsi = cpsi / max(norm, 1e-30)
        g = g + l2_lambda * cpsi
        descent_new = (1.0 - momentum) * g + momentum * descent
        step = step_length / ((itr - 4.0) if itr > 5 else 1.0)
        psi = -step * precond * descent_new
        pnorm = np.linalg.norm(psi)
        if pnorm > trust_region_radius:
            psi = psi * (trust_region_radius / max(pnorm, 1e-30))
        psi_norm = np.linalg.norm(psi)

        # ---- compose + freeze logic ----------------------------------------
        xR, xt = se3_exp(psi)
        new_t = t + R @ xt
        new_R = rotationize_newton(R @ xR)
        newly_done = psi_norm < psi_norm_termination
        if not done:
            energies[itr] = energy
            if not newly_done:
                R, t = new_R, new_t
            descent = descent_new
        done = done or newly_done
        Rs[itr] = R
        ts[itr] = t

    best["R"] = rotationize_newton(best["R"])
    return {
        "energies": energies,
        "Rs": Rs,
        "ts": ts,
        "best_energy": best["energy"],
        "best_R": best["R"],
        "best_t": best["t"],
        "best_iter": best["iter"],
    }
