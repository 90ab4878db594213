"""pySLAM-CPU architectural stand-in baseline.

The reference repo mount is empty and its canonical datasets are
unobtainable offline (SURVEY.md §0), so wall-clock baselines are measured
against this stand-in, which deliberately reproduces the reference's
*architecture* (SURVEY.md §3.1 call stack) rather than an optimized CPU
solver:

  * per-residual-block Python loop with per-block numpy evaluate()   (hot loop 1)
  * global sparse Jacobian assembled with scipy.sparse.bmat          (hot loop 2)
  * normal equations solved with scipy.sparse.linalg.spsolve (SuperLU) (hot loop 3)
  * Gauss-Newton / simple LM with left-multiplicative manifold updates

Pure numpy/scipy, float64 — the same compute substrate as the reference.
Clearly labeled a stand-in wherever its numbers are reported (BASELINE.md
measurement plan).
"""

from __future__ import annotations

import time

import numpy as np
import scipy.sparse
import scipy.sparse.linalg

# ----------------------------------------------------------------- SE(3)/SE(2)


def _hat3(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0.0]])


def _se3_exp(xi):
    rho, phi = xi[:3], xi[3:]
    th = np.linalg.norm(phi)
    W = _hat3(phi)
    if th < 1e-9:
        R = np.eye(3) + W
        V = np.eye(3) + 0.5 * W
    else:
        a, b, c = np.sin(th) / th, (1 - np.cos(th)) / th**2, (th - np.sin(th)) / th**3
        R = np.eye(3) + a * W + b * (W @ W)
        V = np.eye(3) + b * W + c * (W @ W)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ rho
    return T


def _so3_log(R):
    c = np.clip((np.trace(R) - 1) / 2, -1, 1)
    th = np.arccos(c)
    if th < 1e-9:
        return np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / 2
    return th / (2 * np.sin(th)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )


def _se3_log(T):
    phi = _so3_log(T[:3, :3])
    th = np.linalg.norm(phi)
    W = _hat3(phi)
    if th < 1e-9:
        Vinv = np.eye(3) - 0.5 * W
    else:
        half = th / 2
        Vinv = (
            np.eye(3)
            - 0.5 * W
            + (1 / th**2 - np.cos(half) / (2 * th * np.sin(half))) * (W @ W)
        )
    return np.concatenate([Vinv @ T[:3, 3], phi])


def _se3_adjoint(T):
    R, t = T[:3, :3], T[:3, 3]
    A = np.zeros((6, 6))
    A[:3, :3] = R
    A[:3, 3:] = _hat3(t) @ R
    A[3:, 3:] = R
    return A


def _se3_inv_left_jacobian(xi):
    # first-order approximation (adequate at convergence where xi -> 0);
    # the reference uses the exact series — for *timing* purposes the
    # per-block Python overhead dominates either way.
    from numpy import eye

    rho, phi = xi[:3], xi[3:]
    J = eye(6)
    J[:3, :3] -= 0.5 * _hat3(phi)
    J[3:, 3:] -= 0.5 * _hat3(phi)
    J[:3, 3:] -= 0.5 * _hat3(rho)
    return J


def _se2_exp(xi):
    x, y, th = xi
    T = np.eye(3)
    c, s = np.cos(th), np.sin(th)
    T[:2, :2] = [[c, -s], [s, c]]
    if abs(th) < 1e-9:
        V = np.eye(2)
    else:
        V = np.array([[s / th, -(1 - c) / th], [(1 - c) / th, s / th]])
    T[:2, 2] = V @ np.array([x, y])
    return T


def _se2_log(T):
    th = np.arctan2(T[1, 0], T[0, 0])
    if abs(th) < 1e-9:
        Vinv = np.eye(2)
    else:
        a, b = np.sin(th) / th, (1 - np.cos(th)) / th
        Vinv = np.array([[a, b], [-b, a]]) / (a * a + b * b)
    rho = Vinv @ T[:2, 2]
    return np.array([rho[0], rho[1], th])


def _se2_adjoint(T):
    A = np.eye(3)
    A[:2, :2] = T[:2, :2]
    A[0, 2] = T[1, 2]
    A[1, 2] = -T[0, 2]
    return A


# ----------------------------------------------------- per-block residual


class BetweenBlock:
    """One odometry/loop-closure residual block (reference-style object)."""

    def __init__(self, dim, i, j, T_obs, sqrt_info):
        self.dim = dim
        self.i, self.j = i, j
        self.T_obs_inv = np.linalg.inv(T_obs)
        self.sqrt_info = sqrt_info

    def evaluate(self, Ti, Tj):
        log = _se2_log if self.dim == 2 else _se3_log
        adj = _se2_adjoint if self.dim == 2 else _se3_adjoint
        T_est = Tj @ np.linalg.inv(Ti)
        r_local = log(T_est @ self.T_obs_inv)
        r = self.sqrt_info @ r_local
        if self.dim == 2:
            Jl_inv = np.eye(3)  # small-angle; adequate near convergence
        else:
            Jl_inv = _se3_inv_left_jacobian(r_local)
        Jj = self.sqrt_info @ Jl_inv
        Ji = -Jj @ adj(T_est)
        return r, Ji, Jj


def solve_pose_graph_standin(data, max_iters=50, tol=1e-6, verbose=False):
    """GN with per-block Python loop + bmat + spsolve (reference architecture).
    Returns (T_opt, chi2, iters, wall_seconds, per_iter_seconds)."""
    dim = data.dim
    dof = 3 if dim == 2 else 6
    exp = _se2_exp if dim == 2 else _se3_exp
    T = data.T_init.astype(np.float64).copy()
    n = T.shape[0]
    blocks = [
        BetweenBlock(dim, int(i), int(j), data.T_meas[k], data.sqrt_info[k])
        for k, (i, j) in enumerate(zip(data.edges_i, data.edges_j))
    ]
    t_start = time.perf_counter()
    iter_times = []
    chi2_prev = np.inf
    it = 0
    for it in range(1, max_iters + 1):
        t0 = time.perf_counter()
        # hot loop 1: per-block evaluation
        jac_rows = []
        residuals = []
        for blk in blocks:
            r, Ji, Jj = blk.evaluate(T[blk.i], T[blk.j])
            residuals.append(r)
            row = [None] * n
            if blk.i != 0:
                row[blk.i] = Ji
            if blk.j != 0:
                row[blk.j] = Jj
            jac_rows.append(row[1:])  # pose 0 anchored
        # hot loop 2: sparse assembly via bmat
        J = scipy.sparse.bmat(
            [[scipy.sparse.coo_matrix(b) if b is not None else None for b in row] for row in jac_rows],
            format="csr",
        )
        r_all = np.concatenate(residuals)
        H = (J.T @ J).tocsc()
        g = -J.T @ r_all
        # hot loop 3: SuperLU
        dx = scipy.sparse.linalg.spsolve(H, g)
        for p in range(1, n):
            T[p] = exp(dx[(p - 1) * dof : p * dof]) @ T[p]
        chi2 = 0.5 * float(r_all @ r_all)
        iter_times.append(time.perf_counter() - t0)
        if verbose:
            print(f"  standin iter {it}: chi2={chi2:.2f}  ({iter_times[-1]:.2f}s)")
        if abs(chi2_prev - chi2) < tol * max(chi2, 1.0):
            break
        chi2_prev = chi2
    # final cost
    r_all = np.concatenate(
        [blk.evaluate(T[blk.i], T[blk.j])[0] for blk in blocks]
    )
    wall = time.perf_counter() - t_start
    return T, 0.5 * float(r_all @ r_all), it, wall, float(np.mean(iter_times))


# ------------------------------------------------------------ bundle adjustment


def _stereo_project(cam, p):
    x, y, z = p
    return np.array(
        [cam["fu"] * x / z + cam["cu"], cam["fv"] * y / z + cam["cv"], cam["fu"] * cam["b"] / z]
    )


def _stereo_project_jac(cam, p):
    x, y, z = p
    oz = 1.0 / z
    oz2 = oz * oz
    return np.array(
        [
            [cam["fu"] * oz, 0.0, -cam["fu"] * x * oz2],
            [0.0, cam["fv"] * oz, -cam["fv"] * y * oz2],
            [0.0, 0.0, -cam["fu"] * cam["b"] * oz2],
        ]
    )


def _odot3(p):
    out = np.zeros((3, 6))
    out[:, :3] = np.eye(3)
    out[:, 3:] = -_hat3(p)
    return out


def solve_ba_standin(data, max_iters=25, tol=1e-6, verbose=False):
    """Stereo BA with the reference architecture: per-observation Python
    residual loop, scipy sparse assembly, one monolithic spsolve over
    [camera | landmark] unknowns (the reference has no Schur complement).
    Camera 0 anchored.  Returns (chi2, iters, wall_seconds, per_iter_s)."""
    cam = data.camera
    T = data.T_init.astype(np.float64).copy()
    pts = data.pts_init.astype(np.float64).copy()
    nc, npt = len(T), len(pts)
    M = len(data.cam_idx)
    D = 6 * (nc - 1) + 3 * npt
    t_start = time.perf_counter()
    iter_times = []
    chi2_prev = np.inf
    it = 0
    for it in range(1, max_iters + 1):
        t0 = time.perf_counter()
        rows, cols, vals = [], [], []
        r_all = np.empty(3 * M)
        # hot loop 1: per-observation evaluation (pure Python, like the
        # reference's residual-block loop)
        for k in range(M):
            c = int(data.cam_idx[k])
            p = int(data.pt_idx[k])
            pc = T[c, :3, :3] @ pts[p] + T[c, :3, 3]
            r_all[3 * k : 3 * k + 3] = _stereo_project(cam, pc) - data.obs[k]
            Jproj = _stereo_project_jac(cam, pc)
            Jp = Jproj @ T[c, :3, :3]
            base = 3 * k
            for a in range(3):
                for b in range(3):
                    rows.append(base + a)
                    cols.append(6 * (nc - 1) + 3 * p + b)
                    vals.append(Jp[a, b])
            if c != 0:
                Jc = Jproj @ _odot3(pc)
                for a in range(3):
                    for b in range(6):
                        rows.append(base + a)
                        cols.append(6 * (c - 1) + b)
                        vals.append(Jc[a, b])
        # hot loop 2: sparse assembly
        J = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(3 * M, D)).tocsr()
        H = (J.T @ J).tocsc()
        H = H + 1e-8 * scipy.sparse.eye(D, format="csc")
        g = -J.T @ r_all
        # hot loop 3: SuperLU on the FULL (cameras + landmarks) system
        dx = scipy.sparse.linalg.spsolve(H, g)
        for c in range(1, nc):
            T[c] = _se3_exp(dx[6 * (c - 1) : 6 * c]) @ T[c]
        pts += dx[6 * (nc - 1) :].reshape(npt, 3)
        chi2 = 0.5 * float(r_all @ r_all)
        iter_times.append(time.perf_counter() - t0)
        if verbose:
            print(f"  ba standin iter {it}: chi2={chi2:.2f} ({iter_times[-1]:.2f}s)")
        if abs(chi2_prev - chi2) < tol * max(chi2, 1.0):
            break
        chi2_prev = chi2
    r2 = 0.0
    for k in range(M):
        c = int(data.cam_idx[k])
        p = int(data.pt_idx[k])
        pc = T[c, :3, :3] @ pts[p] + T[c, :3, 3]
        rr = _stereo_project(cam, pc) - data.obs[k]
        r2 += float(rr @ rr)
    wall = time.perf_counter() - t_start
    return 0.5 * r2, it, wall, float(np.mean(iter_times))
