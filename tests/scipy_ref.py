"""Independent scipy Gauss-Newton reference solver (SURVEY.md §4.3).

Deliberately written from the math with *different* algorithms than
pyslam_tpu: matrix exp/log via scipy.linalg.expm/logm, Jacobians via central
finite differences, linear solve via scipy.sparse spsolve.  Shares no code or
derivation with the framework, so agreement on converged chi2 validates both
the residual conventions and the optimizer — the reference-parity harness the
(empty) reference mount cannot provide.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg
import scipy.sparse
import scipy.sparse.linalg


def _logvee(T, dof=None):
    """SE(n)/Sim(3) matrix log -> tangent via scipy.linalg.logm
    ([rho, phi] for SE; [rho, phi, sigma] for Sim(3) with dof=7)."""
    X = np.real(scipy.linalg.logm(T))
    if T.shape[0] == 3:  # SE(2)
        return np.array([X[0, 2], X[1, 2], X[1, 0]])
    if dof == 7:  # Sim(3): upper-left block is sigma*I + phi^
        sig = np.trace(X[:3, :3]) / 3.0
        return np.array(
            [X[0, 3], X[1, 3], X[2, 3], X[2, 1] , X[0, 2], X[1, 0], sig]
        )
    return np.array([X[0, 3], X[1, 3], X[2, 3], X[2, 1], X[0, 2], X[1, 0]])


def _expwedge(xi):
    n = 3 if len(xi) == 3 else 4
    X = np.zeros((n, n))
    if n == 3:
        X[0, 2], X[1, 2] = xi[0], xi[1]
        X[1, 0], X[0, 1] = xi[2], -xi[2]
    else:
        X[:3, 3] = xi[:3]
        X[2, 1], X[1, 2] = xi[3], -xi[3]
        X[0, 2], X[2, 0] = xi[4], -xi[4]
        X[1, 0], X[0, 1] = xi[5], -xi[5]
        if len(xi) == 7:  # Sim(3) log-scale on the rotation block diagonal
            X[0, 0] = X[1, 1] = X[2, 2] = xi[6]
    return scipy.linalg.expm(X)


def _residual(Ti, Tj, T_meas, sqrt_info):
    dof = sqrt_info.shape[0]
    return sqrt_info @ _logvee(Tj @ np.linalg.inv(Ti) @ np.linalg.inv(T_meas), dof)


def solve_landmark_slam_2d(data, max_iters=50, tol=1e-9):
    """Independent GN on a synth.LandmarkSLAM2DData problem, pose 0 held
    constant: numerical (central-difference) Jacobians for every factor,
    full sparse system (poses + landmarks, no Schur trick) via spsolve —
    deliberately a different algorithm than the framework's dof-generic
    Schur elimination.  Returns (T_opt, lm_opt, chi2, n_iters)."""
    T = data.T_gt[0:1].copy()
    T = np.concatenate([T, data.T_init[1:].copy()])
    lm = data.lm_init.copy().astype(float)
    n, L = T.shape[0], lm.shape[0]
    E, M = len(data.edges_i), len(data.obs_pose)
    eps = 1e-6
    bearing = data.obs_type == "bearing_range"

    def obs_residual(Tk, l, m):
        p = Tk[:2, :2] @ l + Tk[:2, 2]
        if bearing:
            db = np.arctan2(p[1], p[0]) - data.obs[m, 0]
            db = (db + np.pi) % (2 * np.pi) - np.pi
            raw = np.array([db, np.hypot(p[0], p[1]) - data.obs[m, 1]])
        else:
            raw = p - data.obs[m]
        return data.obs_sqrt_info[m] @ raw

    def all_residuals(T, lm):
        rs = [
            _residual(T[i], T[j], data.T_meas[k], data.sqrt_info[k])
            for k, (i, j) in enumerate(zip(data.edges_i, data.edges_j))
        ]
        rs += [
            obs_residual(T[data.obs_pose[m]], lm[data.obs_lm[m]], m) for m in range(M)
        ]
        return np.concatenate(rs) if rs else np.zeros(0)

    n_rows = E * 3 + M * 2
    n_cols = (n - 1) * 3 + L * 2
    lm_col0 = (n - 1) * 3
    chi2_prev = np.inf
    for it in range(max_iters):
        rows, cols, vals = [], [], []
        r_all = np.zeros(n_rows)
        for k, (i, j) in enumerate(zip(data.edges_i, data.edges_j)):
            r_all[k * 3 : (k + 1) * 3] = _residual(
                T[i], T[j], data.T_meas[k], data.sqrt_info[k]
            )
            for which, p in (("i", i), ("j", j)):
                if p == 0:
                    continue
                for d in range(3):
                    step = np.zeros(3)
                    step[d] = eps
                    Tp, Tm = _expwedge(step) @ T[p], _expwedge(-step) @ T[p]
                    a = (Tp, T[j]) if which == "i" else (T[i], Tp)
                    b = (Tm, T[j]) if which == "i" else (T[i], Tm)
                    col = (rp := _residual(*a, data.T_meas[k], data.sqrt_info[k])) - (
                        _residual(*b, data.T_meas[k], data.sqrt_info[k])
                    )
                    for a_ in range(3):
                        rows.append(k * 3 + a_)
                        cols.append((p - 1) * 3 + d)
                        vals.append(col[a_] / (2 * eps))
        for m in range(M):
            k, li = int(data.obs_pose[m]), int(data.obs_lm[m])
            r_all[E * 3 + m * 2 : E * 3 + m * 2 + 2] = obs_residual(T[k], lm[li], m)
            if k != 0:
                for d in range(3):
                    step = np.zeros(3)
                    step[d] = eps
                    col = (
                        obs_residual(_expwedge(step) @ T[k], lm[li], m)
                        - obs_residual(_expwedge(-step) @ T[k], lm[li], m)
                    ) / (2 * eps)
                    for a_ in range(2):
                        rows.append(E * 3 + m * 2 + a_)
                        cols.append((k - 1) * 3 + d)
                        vals.append(col[a_])
            for d in range(2):
                dl = np.zeros(2)
                dl[d] = eps
                col = (
                    obs_residual(T[k], lm[li] + dl, m)
                    - obs_residual(T[k], lm[li] - dl, m)
                ) / (2 * eps)
                for a_ in range(2):
                    rows.append(E * 3 + m * 2 + a_)
                    cols.append(lm_col0 + li * 2 + d)
                    vals.append(col[a_])
        Jsp = scipy.sparse.coo_matrix(
            (vals, (rows, cols)), shape=(n_rows, n_cols)
        ).tocsr()
        H = (Jsp.T @ Jsp).tocsc()
        g = -Jsp.T @ r_all
        dx = scipy.sparse.linalg.spsolve(H, g)
        for p in range(1, n):
            T[p] = _expwedge(dx[(p - 1) * 3 : p * 3]) @ T[p]
        lm += dx[lm_col0:].reshape(L, 2)
        chi2 = 0.5 * np.sum(r_all**2)
        if abs(chi2_prev - chi2) < tol * max(chi2, 1.0):
            break
        chi2_prev = chi2
    r_all = all_residuals(T, lm)
    return T, lm, 0.5 * np.sum(r_all**2), it + 1


def solve_pose_graph(data, max_iters=50, tol=1e-9, weight_fn=None):
    """GN on a PoseGraphData problem, pose 0 held constant.

    weight_fn(residual_vector) -> elementwise IRLS weights (None = L2).
    Returns (T_opt, chi2, n_iters).  chi2 = sum of 0.5 * r^2 elementwise
    (L2) — robust costs are compared through the caller's loss.
    """
    T = data.T_gt[0:1].copy()  # anchor
    T = np.concatenate([T, data.T_init[1:].copy()])
    n = T.shape[0]
    dof = 3 if data.dim == 2 else data.sqrt_info.shape[-1]
    E = len(data.edges_i)
    eps = 1e-6

    def all_residuals(T):
        return np.concatenate(
            [
                _residual(T[i], T[j], data.T_meas[k], data.sqrt_info[k])
                for k, (i, j) in enumerate(zip(data.edges_i, data.edges_j))
            ]
        )

    chi2_prev = np.inf
    for it in range(max_iters):
        rows, cols, vals = [], [], []
        r_all = np.zeros(E * dof)
        for k, (i, j) in enumerate(zip(data.edges_i, data.edges_j)):
            r = _residual(T[i], T[j], data.T_meas[k], data.sqrt_info[k])
            r_all[k * dof : (k + 1) * dof] = r
            for which, p in (("i", i), ("j", j)):
                if p == 0:
                    continue  # anchored
                J = np.zeros((dof, dof))
                for d in range(dof):
                    step = np.zeros(dof)
                    step[d] = eps
                    Tp = _expwedge(step) @ T[p]
                    Tm = _expwedge(-step) @ T[p]
                    if which == "i":
                        rp = _residual(Tp, T[j], data.T_meas[k], data.sqrt_info[k])
                        rm = _residual(Tm, T[j], data.T_meas[k], data.sqrt_info[k])
                    else:
                        rp = _residual(T[i], Tp, data.T_meas[k], data.sqrt_info[k])
                        rm = _residual(T[i], Tm, data.T_meas[k], data.sqrt_info[k])
                    J[:, d] = (rp - rm) / (2 * eps)
                for a in range(dof):
                    for b in range(dof):
                        rows.append(k * dof + a)
                        cols.append((p - 1) * dof + b)
                        vals.append(J[a, b])
        Jsp = scipy.sparse.coo_matrix(
            (vals, (rows, cols)), shape=(E * dof, (n - 1) * dof)
        ).tocsr()
        w = weight_fn(r_all) if weight_fn is not None else np.ones_like(r_all)
        W = scipy.sparse.diags(w)
        H = (Jsp.T @ W @ Jsp).tocsc()
        g = -Jsp.T @ (w * r_all)
        dx = scipy.sparse.linalg.spsolve(H, g)
        for p in range(1, n):
            T[p] = _expwedge(dx[(p - 1) * dof : p * dof]) @ T[p]
        chi2 = 0.5 * np.sum(r_all**2)
        if abs(chi2_prev - chi2) < tol * max(chi2, 1.0):
            break
        chi2_prev = chi2
    r_all = all_residuals(T)
    return T, 0.5 * np.sum(r_all**2), it + 1
