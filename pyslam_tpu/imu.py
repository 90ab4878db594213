"""IMU preintegration and the preintegrated inertial factor (VIO).

Beyond-reference capability (the reference has no inertial support;
SURVEY.md §7 notes PAPERS.md arXiv 1512.02363 — Forster et al.,
"On-Manifold Preintegration" — as the design source if IMU factors are
added).  This module makes the framework a visual-inertial smoother:

* ``preintegrate``: integrates a window of gyro/accel samples between two
  keyframes into a single relative motion constraint (dR, dv, dp), its
  first-order bias Jacobians, and its 9x9 noise covariance — ONE
  ``lax.scan`` over the sample axis, so the whole window is a single
  device dispatch regardless of IMU rate (dispatch count, not flops —
  CLAUDE.md VO lessons).
* ``imu_preintegrated`` factor kernel: the Forster residual over
  (T_i, T_j, v_i, v_j, b_i) with ANALYTIC Jacobians in this codebase's
  left-perturbation convention, verified against jax autodiff in
  tests/test_imu.py.
* ``between_euclidean`` kernel: the bias random-walk factor b_j - b_i.

Conventions (matching the rest of the framework):
  poses are T_b_w (world -> body, the pose_graph convention): the stored
  rotation block A = R_bw maps world vectors INTO the body frame, and the
  body position in the world is p = -A^T t.  Velocities v (world frame)
  and biases b = [b_gyro (3), b_accel (3)] are euclidean blocks.

Residual (9,) = [r_dR, r_dv, r_dp], with db = b_i - b_lin:
  r_dR = Log( (dR Exp(J_Rg db_g))^T A_i A_j^T )
  r_dv = A_i (v_j - v_i - g dt)                      - (dv + J_vg db_g + J_va db_a)
  r_dp = A_i (p_j - p_i - v_i dt - 0.5 g dt^2)       - (dp + J_pg db_g + J_pa db_a)
premultiplied by the preintegration sqrt information.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .graph.core import register_factor
from .lie import so3

GRAVITY = np.array([0.0, 0.0, -9.81])


@dataclasses.dataclass(frozen=True)
class ImuParams:
    """Continuous-time IMU noise densities (units: rad/s/sqrt(Hz) etc.)."""

    sigma_gyro: float = 1.7e-4
    sigma_accel: float = 2.0e-3
    sigma_gyro_walk: float = 2.0e-5
    sigma_accel_walk: float = 3.0e-3
    gravity: tuple = (0.0, 0.0, -9.81)


class PreintegratedImu(NamedTuple):
    """One keyframe-to-keyframe preintegrated constraint (all device
    arrays; batchable on a leading axis for struct-of-arrays factors)."""

    dR: jnp.ndarray  # (3, 3)
    dv: jnp.ndarray  # (3,)
    dp: jnp.ndarray  # (3,)
    J_Rg: jnp.ndarray  # (3, 3)  d dR / d b_gyro
    J_vg: jnp.ndarray  # (3, 3)
    J_va: jnp.ndarray  # (3, 3)
    J_pg: jnp.ndarray  # (3, 3)
    J_pa: jnp.ndarray  # (3, 3)
    cov: jnp.ndarray  # (9, 9)  order [dR, dv, dp]
    dt: jnp.ndarray  # ()
    b_lin: jnp.ndarray  # (6,)  bias linearization point [b_g, b_a]


@jax.jit
def preintegrate(omega, accel, dts, b_gyro, b_accel, sigma_gyro=1.7e-4, sigma_accel=2.0e-3):
    """Integrate K IMU samples into a PreintegratedImu.

    omega, accel: (K, 3) body-frame angular rate / specific force
    dts:          (K,) sample intervals
    b_gyro/b_accel: (3,) bias linearization points

    The discrete propagation (Forster eq. 35-36) and the bias-Jacobian /
    covariance recursions ride one lax.scan; per-step discrete noise is
    sigma^2 / dt (continuous density -> discrete).
    """
    omega = jnp.asarray(omega)
    dtype = omega.dtype
    accel = jnp.asarray(accel, dtype)
    dts = jnp.asarray(dts, dtype)
    b_g = jnp.asarray(b_gyro, dtype)
    b_a = jnp.asarray(b_accel, dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    def step(carry, inp):
        dR, dv, dp, J_Rg, J_vg, J_va, J_pg, J_pa, cov = carry
        w, a, dt = inp
        wdt = (w - b_g) * dt
        ah = a - b_a
        E = so3.exp(wdt)
        Jr = so3.left_jacobian(-wdt)  # right Jacobian J_r(wdt) = J_l(-wdt)
        Ra = dR @ ah
        ax = so3.wedge(ah)

        dp_n = dp + dv * dt + 0.5 * dR @ ah * dt * dt
        dv_n = dv + Ra * dt
        dR_n = dR @ E

        # bias Jacobians (Forster appendix C)
        J_pg_n = J_pg + J_vg * dt - 0.5 * dR @ ax @ J_Rg * dt * dt
        J_pa_n = J_pa + J_va * dt - 0.5 * dR * dt * dt
        J_vg_n = J_vg - dR @ ax @ J_Rg * dt
        J_va_n = J_va - dR * dt
        J_Rg_n = E.T @ J_Rg - Jr * dt

        # covariance propagation, state order [dR, dv, dp]
        Z = jnp.zeros((3, 3), dtype)
        A = jnp.block(
            [
                [E.T, Z, Z],
                [-dR @ ax * dt, eye3, Z],
                [-0.5 * dR @ ax * dt * dt, eye3 * dt, eye3],
            ]
        )
        B = jnp.block(
            [
                [Jr * dt, Z],
                [Z, dR * dt],
                [Z, 0.5 * dR * dt * dt],
            ]
        )
        # continuous-density -> discrete variance: sigma^2 / dt
        qd = jnp.concatenate(
            [
                jnp.full((3,), sigma_gyro**2, dtype) / jnp.maximum(dt, 1e-12),
                jnp.full((3,), sigma_accel**2, dtype) / jnp.maximum(dt, 1e-12),
            ]
        )
        cov_n = A @ cov @ A.T + (B * qd[None, :]) @ B.T
        return (dR_n, dv_n, dp_n, J_Rg_n, J_vg_n, J_va_n, J_pg_n, J_pa_n, cov_n), None

    Z3 = jnp.zeros((3, 3), dtype)
    init = (
        eye3,
        jnp.zeros(3, dtype),
        jnp.zeros(3, dtype),
        Z3,
        Z3,
        Z3,
        Z3,
        Z3,
        jnp.zeros((9, 9), dtype),
    )
    (dR, dv, dp, J_Rg, J_vg, J_va, J_pg, J_pa, cov), _ = jax.lax.scan(
        step, init, (omega, accel, dts)
    )
    return PreintegratedImu(
        dR, dv, dp, J_Rg, J_vg, J_va, J_pg, J_pa, cov, jnp.sum(dts),
        jnp.concatenate([b_g, b_a]),
    )


def sqrt_info_of(pim: PreintegratedImu, jitter: float = 1e-12):
    """(9, 9) LOWER-triangular sqrt information from the preintegrated
    covariance: L^-1 with cov = L L^T, so (L^-1)^T (L^-1) = cov^-1 — via
    host f64 (a one-time per-factor setup)."""
    cov = np.asarray(pim.cov, np.float64)
    # jitter RELATIVE to the covariance scale (preintegration covariances
    # are ~1e-8 in SI units; an absolute floor would dominate them)
    eps = jitter * max(float(np.max(np.diag(cov))), 1e-300)
    cov = 0.5 * (cov + cov.T) + eps * np.eye(9)
    L = np.linalg.cholesky(cov)
    return np.linalg.inv(L).astype(np.asarray(pim.dR).dtype)  # L^-1: A^T A = cov^-1


def _bmm(A, B):
    return jnp.einsum("...ij,...jk->...ik", A, B)


def _bmv(A, v):
    return jnp.einsum("...ij,...j->...i", A, v)


@register_factor("imu_preintegrated")
def imu_preintegrated(data, T_i, T_j, v_i, v_j, b_i, compute_jacobians=True):
    """Preintegrated inertial factor over (pose_i, pose_j, vel_i, vel_j,
    bias_i).  data keys: dR dv dp J_Rg J_vg J_va J_pg J_pa (F,3,3)/(F,3),
    b_lin (F,6), dt (F,), sqrt_info (F,9,9), gravity (F,3)."""
    F = T_i.shape[0]
    A_i = T_i[..., :3, :3]  # R_bw of keyframe i
    A_j = T_j[..., :3, :3]
    t_i = T_i[..., :3, 3]
    t_j = T_j[..., :3, 3]
    p_i = -_bmv(jnp.swapaxes(A_i, -1, -2), t_i)  # body position in world
    p_j = -_bmv(jnp.swapaxes(A_j, -1, -2), t_j)
    dt = data["dt"][..., None]
    grav = data["gravity"]
    db = b_i - data["b_lin"]
    db_g, db_a = db[..., :3], db[..., 3:]

    dR_t = _bmm(data["dR"], so3.exp(_bmv(data["J_Rg"], db_g)))
    dv_t = data["dv"] + _bmv(data["J_vg"], db_g) + _bmv(data["J_va"], db_a)
    dp_t = data["dp"] + _bmv(data["J_pg"], db_g) + _bmv(data["J_pa"], db_a)

    M = _bmm(jnp.swapaxes(dR_t, -1, -2), _bmm(A_i, jnp.swapaxes(A_j, -1, -2)))
    r_R = so3.log(M)
    w_v = v_j - v_i - grav * dt
    r_v = _bmv(A_i, w_v) - dv_t
    u_p = p_j - p_i - v_i * dt - 0.5 * grav * dt * dt
    r_p = _bmv(A_i, u_p) - dp_t

    r_local = jnp.concatenate([r_R, r_v, r_p], axis=-1)
    r = _bmv(data["sqrt_info"], r_local)
    if not compute_jacobians:
        return r, None

    Z = jnp.zeros((F, 3, 3), T_i.dtype)
    Jl_inv = so3.inv_left_jacobian(r_R)
    Jr_inv_neg = so3.inv_left_jacobian(-r_R)  # J_r^-1(r) = J_l^-1(-r)

    # ---- pose i (left perturbation of T_i = T_b_w): d p_i = -A_i^T rho
    dR_rot_i = _bmm(Jl_inv, jnp.swapaxes(dR_t, -1, -2))
    dv_rot_i = -so3.wedge(_bmv(A_i, w_v))
    dp_rot_i = -so3.wedge(_bmv(A_i, u_p))
    J_Ti = jnp.concatenate(
        [
            jnp.concatenate([Z, dR_rot_i], axis=-1),
            jnp.concatenate([Z, dv_rot_i], axis=-1),
            jnp.concatenate([jnp.broadcast_to(jnp.eye(3, dtype=T_i.dtype), (F, 3, 3)), dp_rot_i], axis=-1),
        ],
        axis=-2,
    )  # (F, 9, 6) over [rho, phi]

    # ---- pose j
    J_Tj = jnp.concatenate(
        [
            jnp.concatenate([Z, -Jr_inv_neg], axis=-1),
            jnp.concatenate([Z, Z], axis=-1),
            jnp.concatenate([-_bmm(A_i, jnp.swapaxes(A_j, -1, -2)), Z], axis=-1),
        ],
        axis=-2,
    )

    # ---- velocities
    J_vi = jnp.concatenate([Z, -A_i, -A_i * dt[..., None]], axis=-2)
    J_vj = jnp.concatenate([Z, A_i, Z], axis=-2)

    # ---- bias i: W = J_r(J_Rg db_g) J_Rg for the rotation row
    xi_b = _bmv(data["J_Rg"], db_g)
    W = _bmm(so3.left_jacobian(-xi_b), data["J_Rg"])
    J_bg = jnp.concatenate([-_bmm(Jl_inv, W), -data["J_vg"], -data["J_pg"]], axis=-2)
    J_ba = jnp.concatenate([Z, -data["J_va"], -data["J_pa"]], axis=-2)
    J_bi = jnp.concatenate([J_bg, J_ba], axis=-1)  # (F, 9, 6)

    S = data["sqrt_info"]
    return r, tuple(_bmm(S, J) for J in (J_Ti, J_Tj, J_vi, J_vj, J_bi))


@register_factor("between_euclidean")
def between_euclidean(data, x_i, x_j, compute_jacobians=True):
    """Euclidean between factor r = sqrt_info (x_j - x_i - delta) — the
    bias random walk (delta = 0) and any linear relative constraint."""
    d = x_i.reshape(x_i.shape[0], -1)
    r = _bmv(data["sqrt_info"], x_j.reshape(d.shape) - d - data["delta"])
    if not compute_jacobians:
        return r, None
    S = data["sqrt_info"]
    return r, (-S, S)


def vio_graph(
    data,
    T_prior,
    pose_prior_sqrt_info,
    params: ImuParams = ImuParams(),
    bias_walk_sigma: float = 1e-3,
    bias_prior_sigma: float = 0.5,
    prior_indices=None,
    T_init=None,
    v_init=None,
    b_init=None,
    dtype=jnp.float64,
):
    """Build a visual-inertial smoothing FactorGraph from synth.ImuData.

    Structure (the classic VIO fixed-window graph): per-keyframe states
    (pose T_b_w, world velocity, 6-dof bias), one preintegrated IMU factor
    per interval (integrated at zero bias; online bias correction rides the
    factor's first-order bias Jacobians), a bias random walk chain, unary
    pose priors standing in for the visual solution (``T_prior`` +
    ``pose_prior_sqrt_info``), and a weak prior pinning the first bias.
    """
    from .graph.core import FactorBatch, FactorGraph, VariableBlock

    N = data.T_gt.shape[0]
    z3 = np.zeros(3)
    pims = [
        preintegrate(
            data.omega[i], data.accel[i], data.dts[i], z3, z3,
            params.sigma_gyro, params.sigma_accel,
        )
        for i in range(N - 1)
    ]
    S = np.stack([sqrt_info_of(p) for p in pims])
    imu_data = {
        k: jnp.asarray(np.stack([np.asarray(getattr(p, k)) for p in pims]), dtype)
        for k in ["dR", "dv", "dp", "J_Rg", "J_vg", "J_va", "J_pg", "J_pa", "b_lin", "dt"]
    }
    imu_data["sqrt_info"] = jnp.asarray(S, dtype)
    imu_data["gravity"] = jnp.asarray(
        np.broadcast_to(np.asarray(params.gravity), (N - 1, 3)), dtype
    )

    blocks = {
        "poses": VariableBlock.create(
            "se3", jnp.asarray(data.T_gt if T_init is None else T_init, dtype)
        ),
        "vels": VariableBlock.create(
            "euclidean", jnp.asarray(data.v_gt if v_init is None else v_init, dtype)
        ),
        "biases": VariableBlock.create(
            "euclidean",
            jnp.asarray(np.zeros((N, 6)) if b_init is None else b_init, dtype),
        ),
    }
    ii = np.arange(N - 1, dtype=np.int32)
    jj = ii + 1
    batches = [
        FactorBatch.create(
            "imu_preintegrated",
            slots=("poses", "poses", "vels", "vels", "biases"),
            indices=(ii, jj, ii, jj, ii),
            data=imu_data,
            loss=_L2(),
        ),
        FactorBatch.create(
            "between_euclidean",
            slots=("biases", "biases"),
            indices=(ii, jj),
            data={
                "delta": jnp.zeros((N - 1, 6), dtype),
                "sqrt_info": jnp.asarray(
                    np.broadcast_to(
                        np.eye(6) / (bias_walk_sigma * np.sqrt(np.sum(data.dts, 1)))[:, None, None]
                        * np.ones((N - 1, 1, 1)),
                        (N - 1, 6, 6),
                    ),
                    dtype,
                ),
            },
            loss=_L2(),
        ),
        FactorBatch.create(
            "prior_se3",
            slots=("poses",),
            indices=(
                np.arange(N, dtype=np.int32)
                if prior_indices is None
                else np.asarray(prior_indices, np.int32),
            ),
            data={
                "T_obs": jnp.asarray(T_prior, dtype),
                "sqrt_info": jnp.asarray(
                    np.broadcast_to(
                        pose_prior_sqrt_info, (np.asarray(T_prior).shape[0], 6, 6)
                    ),
                    dtype,
                ),
            },
            loss=_L2(),
        ),
        FactorBatch.create(
            "prior_euclidean",
            slots=("biases",),
            indices=(np.zeros(1, np.int32),),
            data={
                "obs": jnp.zeros((1, 6), dtype),
                "sqrt_info": jnp.asarray(np.eye(6)[None] / bias_prior_sigma, dtype),
            },
            loss=_L2(),
        ),
    ]
    return FactorGraph(blocks, batches)


def _L2():
    from .losses import L2Loss

    return L2Loss()
