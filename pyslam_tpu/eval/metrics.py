"""Trajectory error metrics — capability parity with the reference's
``TrajectoryMetrics`` (pyslam/metrics.py per SURVEY.md §2.1/§3.5), computed
on-device with batched SE(3) log maps instead of a per-pose Python loop.

Error definitions (reference semantics):
  * per-pose error:      xi_i  = log(T_gt_i^-1 * T_est_i)   (Twv convention)
  * relative-pose error: xi_ij = log((T_gt_i^-1 T_gt_j)^-1 (T_est_i^-1 T_est_j))
  * segment errors:      KITTI-style per-segment-length average translation /
    rotation error over all segments of given path lengths
  * scalar summaries: endpoint, mean, RMS, cumulative norms + ATE/ARMSE
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import se2, se3


def _ops(dim: int):
    return se2 if dim == 2 else se3


class TrajectoryMetrics:
    """Ground-truth vs estimated trajectory errors.

    Parameters
    ----------
    Twv_gt, Twv_est : (N, 4, 4) or (N, 3, 3) pose arrays (or lists).
    convention : 'Twv' (world <- vehicle, default, reference convention) or
        'Tvw' (vehicle <- world; inverted on input).
    """

    def __init__(self, Twv_gt, Twv_est, convention: str = "Twv"):
        Twv_gt = jnp.asarray(np.stack([np.asarray(T) for T in Twv_gt]))
        Twv_est = jnp.asarray(np.stack([np.asarray(T) for T in Twv_est]))
        if Twv_gt.shape != Twv_est.shape:
            raise ValueError("trajectory shapes differ")
        self.dim = 2 if Twv_gt.shape[-1] == 3 else 3
        ops = _ops(self.dim)
        if convention == "Tvw":
            Twv_gt, Twv_est = ops.inv(Twv_gt), ops.inv(Twv_est)
        elif convention != "Twv":
            raise ValueError(f"unknown convention {convention!r}")
        self.convention = "Twv"
        self.Twv_gt = Twv_gt
        self.Twv_est = Twv_est
        self.num_poses = Twv_gt.shape[0]

    # ---- path geometry ----

    @property
    def positions_gt(self):
        return self.Twv_gt[:, : self.dim, -1]

    @property
    def positions_est(self):
        return self.Twv_est[:, : self.dim, -1]

    def cum_dists(self):
        """(N,) cumulative ground-truth path length."""
        steps = jnp.linalg.norm(jnp.diff(self.positions_gt, axis=0), axis=-1)
        return jnp.concatenate([jnp.zeros(1, steps.dtype), jnp.cumsum(steps)])

    # ---- error vectors ----

    def error(self):
        """(N, dof) per-pose error log(T_gt^-1 * T_est); translation
        components first (reference tangent ordering)."""
        ops = _ops(self.dim)
        return ops.log(ops.inv(self.Twv_gt) @ self.Twv_est)

    def traj_errors(self, error_type: str = "all"):
        """Per-pose (trans_err, rot_err) norms; error_type selects
        'trans' | 'rot' | 'all' (reference API)."""
        xi = self.error()
        t = self.dim
        trans = jnp.linalg.norm(xi[:, :t], axis=-1)
        rot = jnp.linalg.norm(xi[:, t:], axis=-1)
        return self._select(trans, rot, error_type)

    def rel_errors(self, error_type: str = "all", delta: int = 1):
        """Relative-pose (odometry) errors between poses i and i+delta."""
        ops = _ops(self.dim)
        Tg, Te = self.Twv_gt, self.Twv_est
        rel_gt = ops.inv(Tg[:-delta]) @ Tg[delta:]
        rel_est = ops.inv(Te[:-delta]) @ Te[delta:]
        xi = ops.log(ops.inv(rel_gt) @ rel_est)
        t = self.dim
        trans = jnp.linalg.norm(xi[:, :t], axis=-1)
        rot = jnp.linalg.norm(xi[:, t:], axis=-1)
        return self._select(trans, rot, error_type)

    @staticmethod
    def _select(trans, rot, error_type):
        if error_type == "trans":
            return trans
        if error_type == "rot":
            return rot
        return trans, rot

    # ---- scalar summaries (reference API surface) ----

    def endpoint_error(self):
        """Translational error at the final pose."""
        xi = self.error()[-1]
        return jnp.linalg.norm(xi[: self.dim])

    def mean_err(self, error_type: str = "all"):
        trans, rot = self.traj_errors("all")
        return self._select(jnp.mean(trans), jnp.mean(rot), error_type)

    def rms_err(self, error_type: str = "all"):
        trans, rot = self.traj_errors("all")
        return self._select(
            jnp.sqrt(jnp.mean(trans**2)), jnp.sqrt(jnp.mean(rot**2)), error_type
        )

    def cum_err(self, error_type: str = "all"):
        trans, rot = self.traj_errors("all")
        return self._select(jnp.sum(trans), jnp.sum(rot), error_type)

    def armse(self, error_type: str = "all"):
        """Absolute RMSE after removing nothing (no alignment) — position
        RMSE (the common ATE definition) and rotation RMSE."""
        dp = self.positions_est - self.positions_gt
        trans = jnp.sqrt(jnp.mean(jnp.sum(dp**2, axis=-1)))
        _, rot_err = self.traj_errors("all")
        rot = jnp.sqrt(jnp.mean(rot_err**2))
        return self._select(trans, rot, error_type)

    # ---- trajectory alignment (evo-style; beyond-reference) ----

    def align(self, method: str = "se3") -> "TrajectoryMetrics":
        """Return a new TrajectoryMetrics with the estimate aligned to the
        ground truth by the closed-form Umeyama transform over positions:
        'se3'/'se2' = rigid (rotation + translation), 'sim3'/'sim2' = full
        similarity (+ scale — the standard for monocular trajectories,
        whose global scale is unobservable).  The reference computes errors
        in the given frames only; alignment-before-ATE is the evo/TUM
        benchmark convention and is required for fair monocular numbers.
        """
        method = method.lower()
        if method in ("none",):
            return self
        with_scale = method in ("sim3", "sim2")
        if method not in ("se3", "se2", "sim3", "sim2"):
            raise ValueError(f"unknown alignment {method!r}")
        d = self.dim
        P = self.positions_gt  # (N, d) target
        Q = self.positions_est  # (N, d) source
        mu_p = jnp.mean(P, axis=0)
        mu_q = jnp.mean(Q, axis=0)
        Pc, Qc = P - mu_p, Q - mu_q
        Sigma = (Pc.T @ Qc) / self.num_poses  # (d, d)
        U, D, Vt = jnp.linalg.svd(Sigma)
        s = jnp.ones(d, Sigma.dtype).at[-1].set(
            jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
        )
        R = (U * s[None, :]) @ Vt
        var_q = jnp.mean(jnp.sum(Qc * Qc, axis=-1))
        c = jnp.where(
            jnp.asarray(with_scale), jnp.sum(D * s) / var_q, jnp.asarray(1.0, D.dtype)
        )
        t = mu_p - c * (R @ mu_q)
        # apply: positions p -> c R p + t, rotations -> R R_est (unscaled)
        R_est = self.Twv_est[:, :d, :d]
        p_est = self.Twv_est[:, :d, -1]
        Twv_new = jnp.zeros_like(self.Twv_est).at[:, -1, -1].set(1.0)
        Twv_new = Twv_new.at[:, :d, :d].set(R[None] @ R_est)
        Twv_new = Twv_new.at[:, :d, -1].set(
            c * jnp.einsum("ij,nj->ni", R, p_est) + t
        )
        out = TrajectoryMetrics(self.Twv_gt, Twv_new)
        out.alignment = dict(method=method, rotation=R, translation=t, scale=c)
        return out

    # ---- KITTI-style segment errors ----

    def segment_errors(self, segment_lengths, rot_unit: str = "rad"):
        """For each start pose and each segment length L, find the pose where
        cumulative gt path length exceeds L, compute the relative-pose error,
        and normalize by L.  Returns (K, 3) rows [length, trans_err/L,
        rot_err/L] stacked over all valid (start, length) pairs."""
        ops = _ops(self.dim)
        dists = np.asarray(self.cum_dists())
        Tg = np.asarray(self.Twv_gt)
        Te = np.asarray(self.Twv_est)
        starts, ends, lens = [], [], []
        for L in segment_lengths:
            end_idx = np.searchsorted(dists, dists + L)
            valid = end_idx < len(dists)
            s = np.nonzero(valid)[0]
            starts.append(s)
            ends.append(end_idx[valid])
            lens.append(np.full(len(s), float(L)))
        if not starts or sum(len(s) for s in starts) == 0:
            return np.zeros((0, 3))
        s = np.concatenate(starts)
        e = np.concatenate(ends)
        L = np.concatenate(lens)
        rel_gt = ops.inv(jnp.asarray(Tg[s])) @ jnp.asarray(Tg[e])
        rel_est = ops.inv(jnp.asarray(Te[s])) @ jnp.asarray(Te[e])
        xi = np.asarray(ops.log(ops.inv(rel_gt) @ rel_est))
        t = self.dim
        trans = np.linalg.norm(xi[:, :t], axis=-1) / L
        rot = np.linalg.norm(xi[:, t:], axis=-1) / L
        if rot_unit == "deg":
            rot = np.degrees(rot)
        return np.stack([L, trans, rot], axis=-1)

    def mean_segment_errors(self, segment_lengths, rot_unit: str = "rad"):
        """Average segment errors per length: (len(segment_lengths), 3)."""
        segs = self.segment_errors(segment_lengths, rot_unit)
        out = []
        for L in segment_lengths:
            sel = segs[segs[:, 0] == float(L)]
            if len(sel):
                out.append([float(L), sel[:, 1].mean(), sel[:, 2].mean()])
        return np.asarray(out)

    # ---- serialization (reference save/load parity) ----

    def saveas(self, path: str):
        payload = {
            "Twv_gt": np.asarray(self.Twv_gt),
            "Twv_est": np.asarray(self.Twv_est),
            "convention": self.convention,
        }
        if path.endswith(".mat"):
            from scipy.io import savemat

            savemat(path, payload)
        else:
            with open(path, "wb") as f:
                pickle.dump(payload, f)

    @classmethod
    def loadfrom(cls, path: str) -> "TrajectoryMetrics":
        if path.endswith(".mat"):
            from scipy.io import loadmat

            payload = loadmat(path)
            conv = str(np.squeeze(payload["convention"]))
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            conv = payload["convention"]
        return cls(payload["Twv_gt"], payload["Twv_est"], convention=conv)
