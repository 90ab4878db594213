"""Batched residual + analytic-Jacobian kernels, one per factor kind.

Capability parity with the reference's residual library
(pyslam/residuals.py per SURVEY.md §2.1): pose prior, pose-to-pose
(odometry / loop closure), stereo/RGB-D reprojection, quadratic demo — each
evaluated for a whole factor batch at once (vmap-free broadcasting over the
leading F axis) with analytic Lie-group Jacobians.

Conventions (matching the reference, SURVEY.md §3.2):
  * residuals are pre-multiplied by ``sqrt_info`` (the 'stiffness'
    inverse-sqrt-covariance weight, pyslam/utils.py ``invsqrt``),
  * Jacobians are w.r.t. *left* perturbations exp(eps) * T,
  * pose-to-pose measurement is T_2_1 (frame 1 expressed in frame 2), with
    estimate T_2_1_est = T_2_0 * T_1_0^-1.

Every kernel returns ``(r, jacs)`` with r (F, m) and jacs a tuple of
(F, m, dof_slot) arrays (or ``(r, None)`` when Jacobians are skipped).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lie import se2, se3, sim3
from .core import register_factor


def _bmm(A, B):
    return jnp.einsum("...ij,...jk->...ik", A, B)


def _bmv(A, v):
    return jnp.einsum("...ij,...j->...i", A, v)


# --------------------------------------------------------------------------
# Pose priors: r = sqrt_info * log(T_est * T_obs^-1)
# --------------------------------------------------------------------------


def _prior(ops, data, T, compute_jacobians):
    r_local = ops.log(T @ ops.inv(data["T_obs"]))
    r = _bmv(data["sqrt_info"], r_local)
    if not compute_jacobians:
        return r, None
    J = _bmm(data["sqrt_info"], ops.inv_left_jacobian(r_local))
    return r, (J,)


@register_factor("prior_se3")
def prior_se3(data, T, compute_jacobians=True):
    """Unary SE(3) prior (reference PoseResidual)."""
    return _prior(se3, data, T, compute_jacobians)


@register_factor("prior_se2")
def prior_se2(data, T, compute_jacobians=True):
    """Unary SE(2) prior (reference PoseResidual)."""
    return _prior(se2, data, T, compute_jacobians)


@register_factor("prior_sim3")
def prior_sim3(data, S, compute_jacobians=True):
    """Unary Sim(3) prior — beyond-reference (monocular scale-drift graphs,
    lie/sim3.py); same residual shape as PoseResidual with 7-dof tangent."""
    return _prior(sim3, data, S, compute_jacobians)


# --------------------------------------------------------------------------
# Pose-to-pose (odometry / loop closure):
#   r = sqrt_info * log(T_2_0 * T_1_0^-1 * T_obs^-1)
# --------------------------------------------------------------------------


def _between(ops, data, T1, T2, compute_jacobians):
    T_est = T2 @ ops.inv(T1)
    r_local = ops.log(T_est @ ops.inv(data["T_obs"]))
    r = _bmv(data["sqrt_info"], r_local)
    if not compute_jacobians:
        return r, None
    Jl_inv = ops.inv_left_jacobian(r_local)
    J2 = _bmm(data["sqrt_info"], Jl_inv)
    # exp(-Ad(T_est) eps) appears for a left perturbation of T1 (see chain
    # rule in SURVEY.md §3.2); hence the -Adjoint factor.
    J1 = -_bmm(J2, ops.adjoint(T_est))
    return r, (J1, J2)


@register_factor("between_se3")
def between_se3(data, T1, T2, compute_jacobians=True):
    """SE(3) relative-pose factor (reference PoseToPoseResidual)."""
    return _between(se3, data, T1, T2, compute_jacobians)


@register_factor("between_se2")
def between_se2(data, T1, T2, compute_jacobians=True):
    """SE(2) relative-pose factor (reference PoseToPoseResidual)."""
    return _between(se2, data, T1, T2, compute_jacobians)


# --------------------------------------------------------------------------
# Switchable constraints (Suenderhauf & Protzel ICRA 2012, "Vertigo"):
#   r = [ s * sqrt_info * log(T_est * T_obs^-1) ;  xi * (1 - s) ]
# Each loop closure carries a scalar switch s (init 1); an outlier edge is
# cheaper to switch OFF (paying the xi prior) than to satisfy, so wrong
# loop closures disable themselves DURING optimization.  The complementary
# robust path is solver/gnc.py (graduated non-convexity); switchable
# constraints keep a per-edge posterior "is this loop real" variable, which
# GNC's weights do not expose to downstream modules.  Beyond-reference.
# --------------------------------------------------------------------------


def _between_switch(ops, data, T1, T2, s, compute_jacobians):
    r_b, jac = _between(ops, data, T1, T2, compute_jacobians)
    sv = s[:, 0:1]  # (F, 1) switch value; linear Psi(s) = s (unconstrained:
    # the xi prior pulls toward 1, outliers settle near 0 — measured in
    # tests; no clamp so the residual stays smooth everywhere)
    xi = data["xi"]
    xi = xi[:, None] if xi.ndim == 1 else xi  # (F, 1)
    r = jnp.concatenate([sv * r_b, xi * (1.0 - sv)], axis=1)
    if not compute_jacobians:
        return r, None
    J1, J2 = jac
    F, m = r_b.shape
    zrow = jnp.zeros((F, 1, J1.shape[2]), J1.dtype)
    J1s = jnp.concatenate([sv[:, :, None] * J1, zrow], axis=1)
    J2s = jnp.concatenate([sv[:, :, None] * J2, zrow], axis=1)
    Js = jnp.concatenate([r_b[:, :, None], -xi[:, :, None]], axis=1)  # (F, m+1, 1)
    return r, (J1s, J2s, Js)


@register_factor("between_se2_switch")
def between_se2_switch(data, T1, T2, s, compute_jacobians=True):
    """Switchable SE(2) loop-closure factor (slots: pose_i, pose_j, switch)."""
    return _between_switch(se2, data, T1, T2, s, compute_jacobians)


@register_factor("between_se3_switch")
def between_se3_switch(data, T1, T2, s, compute_jacobians=True):
    """Switchable SE(3) loop-closure factor (slots: pose_i, pose_j, switch)."""
    return _between_switch(se3, data, T1, T2, s, compute_jacobians)


@register_factor("between_sim3")
def between_sim3(data, S1, S2, compute_jacobians=True):
    """Sim(3) relative-similarity factor — the scale-drift-aware loop
    closure of monocular SLAM (Strasdat RSS 2010; beyond-reference).  The
    7th residual component is the log scale ratio, so a loop closure with a
    known metric scale pulls accumulated drift out of the whole chain."""
    return _between(sim3, data, S1, S2, compute_jacobians)


# --------------------------------------------------------------------------
# Reprojection: r = sqrt_info * (camera.project(T_cam_w * pt_w) - obs)
# --------------------------------------------------------------------------


@register_factor("reprojection")
def reprojection(data, T, pt, compute_jacobians=True):
    """Stereo/RGB-D reprojection factor (reference ReprojectionResidual,
    call stack SURVEY.md §3.2).  ``data['camera']`` is a sensors.* pytree;
    observations are (F, 3)."""
    cam = data["camera"]
    pt_cam = se3.act(T, pt)
    if not compute_jacobians:
        pred = cam.project(pt_cam)
        return _bmv(data["sqrt_info"], pred - data["obs"]), None
    pred, cam_jac = cam.project(pt_cam, compute_jacobians=True)
    r = _bmv(data["sqrt_info"], pred - data["obs"])
    S_cam = _bmm(data["sqrt_info"], cam_jac)
    J_T = _bmm(S_cam, se3.odot(pt_cam))
    J_pt = _bmm(S_cam, T[..., :3, :3])
    return r, (J_T, J_pt)


@register_factor("reprojection_motion_only")
def reprojection_motion_only(data, T, compute_jacobians=True):
    """Motion-only batched reprojection: landmarks fixed in ``data['pt_w']``
    (reference ReprojectionMotionOnlyBatchResidual)."""
    cam = data["camera"]
    pt_cam = se3.act(T, data["pt_w"])
    if not compute_jacobians:
        pred = cam.project(pt_cam)
        return _bmv(data["sqrt_info"], pred - data["obs"]), None
    pred, cam_jac = cam.project(pt_cam, compute_jacobians=True)
    r = _bmv(data["sqrt_info"], pred - data["obs"])
    J_T = _bmm(_bmm(data["sqrt_info"], cam_jac), se3.odot(pt_cam))
    return r, (J_T,)


# --------------------------------------------------------------------------
# BAL monocular reprojection (Snavely camera model):
#   p_cam = T * X;  pn = -p_cam[:2] / p_cam[2]           (BAL looks down -z)
#   pred  = f * (1 + k1 |pn|^2 + k2 |pn|^4) * pn
#   r     = sqrt_info * (pred - obs)
# Intrinsics (f, k1, k2) ride in data as fixed per-observation scalars —
# the benchmark configs (BASELINE.json:10-11) optimize poses + landmarks.
# --------------------------------------------------------------------------


def _snavely(data, T, pt, f, k1, k2, compute_jacobians):
    """Shared Snavely projection core for the fixed-intrinsics and 9-dof
    BAL kernels: returns (r, S, p, pn, r2, d) with S = sqrt_info @
    d pred/d p_cam (None when Jacobians are skipped) — one place for the
    projection math, so the two kernels cannot drift apart."""
    p = se3.act(T, pt)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    inv_z = 1.0 / z
    pn = -p[..., :2] * inv_z[..., None]
    r2 = jnp.sum(pn * pn, axis=-1)
    d = 1.0 + r2 * (k1 + k2 * r2)
    pred = (f * d)[..., None] * pn
    r = _bmv(data["sqrt_info"], pred - data["obs"])
    if not compute_jacobians:
        return r, None, p, pn, r2, d
    # d pn / d p_cam  (F, 2, 3)
    zeros = jnp.zeros_like(x)
    J_pn = jnp.stack(
        [
            jnp.stack([-inv_z, zeros, x * inv_z * inv_z], axis=-1),
            jnp.stack([zeros, -inv_z, y * inv_z * inv_z], axis=-1),
        ],
        axis=-2,
    )
    # d pred / d pn = f * (d * I + pn (dd/dpn)^T),  dd/dpn = 2(k1 + 2 k2 r2) pn
    dd = (2.0 * (k1 + 2.0 * k2 * r2))[..., None] * pn
    eye2 = jnp.eye(2, dtype=pred.dtype)
    J_pred = f[..., None, None] * (
        d[..., None, None] * eye2 + pn[..., :, None] * dd[..., None, :]
    )
    S = _bmm(_bmm(data["sqrt_info"], J_pred), J_pn)  # (F, 2, 3)
    return r, S, p, pn, r2, d


@register_factor("reprojection_bal")
def reprojection_bal(data, T, pt, compute_jacobians=True):
    """Monocular BAL reprojection factor with radial distortion."""
    r, S, p, _, _, _ = _snavely(
        data, T, pt, data["f"], data["k1"], data["k2"], compute_jacobians
    )
    if not compute_jacobians:
        return r, None
    J_T = _bmm(S, se3.odot(p))
    J_pt = _bmm(S, T[..., :3, :3])
    return r, (J_T, J_pt)


@register_factor("reprojection_bal9")
def reprojection_bal9(data, cam, pt, compute_jacobians=True):
    """Full BAL camera: monocular radial-distortion reprojection with the
    intrinsics [f, k1, k2] OPTIMIZED jointly with the pose — the real BAL
    problem's 9-dof camera (the fixed-intrinsics variant is
    ``reprojection_bal``; both share ``_snavely``).  ``cam`` is the (F, 19)
    bal_cam9 product-manifold storage [vec(T), f, k1, k2] (graph/core.py
    _retract_bal_cam9)."""
    T = cam[..., :16].reshape(cam.shape[:-1] + (4, 4))
    f, k1, k2 = cam[..., 16], cam[..., 17], cam[..., 18]
    r, S, p, pn, r2, d = _snavely(data, T, pt, f, k1, k2, compute_jacobians)
    if not compute_jacobians:
        return r, None
    J_T = _bmm(S, se3.odot(p))
    J_pt = _bmm(S, T[..., :3, :3])
    # intrinsics columns: d pred/df = d*pn; /dk1 = f r^2 pn; /dk2 = f r^4 pn
    J_intr = jnp.stack(
        [
            d[..., None] * pn,
            (f * r2)[..., None] * pn,
            (f * r2 * r2)[..., None] * pn,
        ],
        axis=-1,
    )  # (F, 2, 3)
    J_cam = jnp.concatenate([J_T, _bmm(data["sqrt_info"], J_intr)], axis=-1)
    return r, (J_cam, J_pt)

@register_factor("prior_balcam_pose")
def prior_balcam_pose(data, cam, compute_jacobians=True):
    """Unary SE(3) prior on the POSE part of a bal_cam9 camera (the gauge
    anchor for optimize_intrinsics graphs: freezing the whole 9-dof block
    would pin the anchor camera's intrinsics at their initial values)."""
    T = cam[..., :16].reshape(cam.shape[:-1] + (4, 4))
    r_local = se3.log(T @ se3.inv(data["T_obs"]))
    r = _bmv(data["sqrt_info"], r_local)
    if not compute_jacobians:
        return r, None
    J_pose = _bmm(data["sqrt_info"], se3.inv_left_jacobian(r_local))
    J = jnp.concatenate(
        [J_pose, jnp.zeros(J_pose.shape[:-1] + (3,), J_pose.dtype)], axis=-1
    )
    return r, (J,)


# --------------------------------------------------------------------------
# 2D landmark SLAM (Victoria-Park model family; g2o VERTEX_XY/EDGE_SE2_XY):
# SE(2) poses observing point landmarks, either as relative position
# (landmark expressed in the observing pose's frame) or as bearing + range.
# Beyond-reference; the Schur paths apply unchanged because
# solver/schur.py is dof-generic (landmark blocks are 2-dof here).
# Pose convention matches the rest of the kernel library: T is
# world-to-body, so the body-frame landmark is p = se2.act(T, l).
# --------------------------------------------------------------------------


def _wrap_angle(a):
    """Wrap to [-pi, pi].  Gradient is 1 almost everywhere (the round() is
    piecewise constant), so analytic-vs-autodiff parity holds away from the
    branch boundary."""
    two_pi = 2.0 * jnp.pi
    return a - two_pi * jnp.round(a / two_pi)


@register_factor("landmark_xy_se2")
def landmark_xy_se2(data, T, l, compute_jacobians=True):
    """Relative-position landmark factor (g2o EDGE_SE2_XY):
    r = sqrt_info * (act(T, l) - obs), obs the landmark seen in the pose
    frame.  Slots: (se2 pose, 2-dof euclidean landmark)."""
    p = se2.act(T, l)
    r = _bmv(data["sqrt_info"], p - data["obs"])
    if not compute_jacobians:
        return r, None
    # left perturbation: d(exp(eps) T l)/d eps = odot(p); d p/d l = R
    J_T = _bmm(data["sqrt_info"], se2.odot(p))
    J_l = _bmm(data["sqrt_info"], T[..., :2, :2])
    return r, (J_T, J_l)


@register_factor("landmark_xyz_se3")
def landmark_xyz_se3(data, T, l, compute_jacobians=True):
    """3D relative-position landmark factor: r = sqrt_info * (act(T, l) -
    obs), the landmark observed as a body-frame position (AprilTag /
    motion-capture-marker / lidar-feature observations — no camera model).
    Slots: (se3 pose, 3-dof euclidean landmark).  The 3D analogue of
    landmark_xy_se2."""
    p = se3.act(T, l)
    r = _bmv(data["sqrt_info"], p - data["obs"])
    if not compute_jacobians:
        return r, None
    J_T = _bmm(data["sqrt_info"], se3.odot(p))
    J_l = _bmm(data["sqrt_info"], T[..., :3, :3])
    return r, (J_T, J_l)


@register_factor("bearing_range_se2")
def bearing_range_se2(data, T, l, compute_jacobians=True):
    """Bearing-range landmark factor: with p = act(T, l) the body-frame
    landmark, r = sqrt_info * [wrap(atan2(p_y, p_x) - obs_bearing),
    |p| - obs_range].  Slots: (se2 pose, 2-dof euclidean landmark)."""
    p = se2.act(T, l)
    x, y = p[..., 0], p[..., 1]
    rho2 = x * x + y * y
    rho = jnp.sqrt(rho2)
    raw = jnp.stack(
        [
            _wrap_angle(jnp.arctan2(y, x) - data["obs"][..., 0]),
            rho - data["obs"][..., 1],
        ],
        axis=-1,
    )
    r = _bmv(data["sqrt_info"], raw)
    if not compute_jacobians:
        return r, None
    inv_rho2 = 1.0 / rho2
    inv_rho = 1.0 / rho
    # d[bearing, range]/dp  (F, 2, 2)
    J_p = jnp.stack(
        [
            jnp.stack([-y * inv_rho2, x * inv_rho2], axis=-1),
            jnp.stack([x * inv_rho, y * inv_rho], axis=-1),
        ],
        axis=-2,
    )
    S = _bmm(data["sqrt_info"], J_p)
    J_T = _bmm(S, se2.odot(p))
    J_l = _bmm(S, T[..., :2, :2])
    return r, (J_T, J_l)


# --------------------------------------------------------------------------
# Quadratic curve-fit demo: r = stiffness * (p0 x^2 + p1 x + p2 - y)
# --------------------------------------------------------------------------


@register_factor("quadratic")
def quadratic(data, p, compute_jacobians=True):
    """The reference's README demo residual (QuadraticResidual)."""
    x, y, s = data["x"], data["y"], data["stiffness"]
    pred = p[..., 0] * x * x + p[..., 1] * x + p[..., 2]
    r = (s * (pred - y))[..., None]
    if not compute_jacobians:
        return r, None
    J = (s[..., None] * jnp.stack([x * x, x, jnp.ones_like(x)], axis=-1))[..., None, :]
    return r, (J,)


# --------------------------------------------------------------------------
# Euclidean prior: r = sqrt_info * (x - obs)
# --------------------------------------------------------------------------


@register_factor("prior_euclidean")
def prior_euclidean(data, x, compute_jacobians=True):
    r = _bmv(data["sqrt_info"], x - data["obs"])
    if not compute_jacobians:
        return r, None
    return r, (data["sqrt_info"],)


# --------------------------------------------------------------------------
# Chordal-relaxation factors (pose-graph initialization, graph/initialize.py)
#
# Both are LINEAR in their euclidean variables, so one exact GN step solves
# the relaxation; they exist to route the chordal linear systems through the
# standard assembly/solver stack (dense / ELL PCG / sparse Cholesky) instead
# of a bespoke sparse solve.
# --------------------------------------------------------------------------


@register_factor("chordal_rot")
def chordal_rot(data, x1, x2, compute_jacobians=True):
    """Rotation-relaxation factor: columns of R_j should equal R_meas @
    (columns of R_i), with each rotation stored column-stacked as a d*d
    euclidean variable x = vec(R^T) (x.reshape(d, d)[c] = column c of R).

    r[c*d + a] = x2[c*d + a] - (R_meas @ x1[c*d : c*d+d])[a]
    """
    R = data["R_meas"]  # (F, d, d)
    d = R.shape[-1]
    F = x1.shape[0]
    X1 = x1.reshape(F, d, d)  # rows = columns of R_i
    X2 = x2.reshape(F, d, d)
    r = (X2 - _bmm(X1, jnp.swapaxes(R, -1, -2))).reshape(F, d * d)
    if not compute_jacobians:
        return r, None
    eye = jnp.eye(d, dtype=R.dtype)
    # J1[f, c*d+a, c'*d+b] = -delta_cc' * R[f, a, b]
    J1 = -jnp.einsum("ck,fab->fcakb", eye, R).reshape(F, d * d, d * d)
    J2 = jnp.broadcast_to(jnp.eye(d * d, dtype=R.dtype), (F, d * d, d * d))
    return r, (J1, J2)


@register_factor("chordal_trans")
def chordal_trans(data, t1, t2, compute_jacobians=True):
    """Translation-recovery factor with rotations held fixed:
    r = t_j - R_meas @ t_i - t_meas (linear in the d-dof translations)."""
    R = data["R_meas"]
    r = t2 - _bmv(R, t1) - data["t_meas"]
    if not compute_jacobians:
        return r, None
    F, d = r.shape
    J2 = jnp.broadcast_to(jnp.eye(d, dtype=R.dtype), (F, d, d))
    return r, (-R, J2)
