"""Timestamp association and SE(3) pose interpolation for trajectory
evaluation (evo's `sync` capability; beyond-reference — the reference's
TrajectoryMetrics assumes index-aligned trajectories, SURVEY.md §3.5).

Real sensor logs (TUM RGB-D, EuRoC) stamp ground truth and estimates on
different clocks and rates; comparing them needs nearest-neighbor
association (``associate``) or resampling one trajectory at the other's
stamps (``interpolate_poses`` — geodesic in SE(3): linear translation,
slerp-equivalent rotation via the matrix log/exp of the relative pose).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..lie import se3


def associate(t_ref, t_est, max_dt: float = 0.02, offset: float = 0.0):
    """Greedy nearest-timestamp matching (the TUM benchmark's protocol).

    ``offset`` is added to ``t_est`` before matching (clock skew).
    Returns (idx_ref, idx_est): index arrays of equal length, each index
    used at most once, |t_ref[i] - (t_est[j] + offset)| <= max_dt, chosen
    globally best-first (sorted by gap).
    """
    t_ref = np.asarray(t_ref, np.float64)
    t_est = np.asarray(t_est, np.float64) + offset
    # sort internally (searchsorted needs it; logs are not always ordered)
    # and map matches back to the caller's original indices
    ref_order = np.argsort(t_ref, kind="stable")
    t_ref_s = t_ref[ref_order]
    # candidate pairs: for each est stamp, EVERY ref stamp within max_dt
    # (the TUM protocol's all-pairs set; the two bracketing neighbors are
    # not enough when a greedy earlier match consumes them)
    lo = np.searchsorted(t_ref_s, t_est - max_dt, side="left")
    hi = np.searchsorted(t_ref_s, t_est + max_dt, side="right")
    cands = []
    for j in range(len(t_est)):
        for i in range(lo[j], hi[j]):
            cands.append((abs(t_ref_s[i] - t_est[j]), int(ref_order[i]), j))
    cands.sort()
    used_i, used_j = set(), set()
    out_i, out_j = [], []
    for dt, i, j in cands:
        if i in used_i or j in used_j:
            continue
        used_i.add(i)
        used_j.add(j)
        out_i.append(i)
        out_j.append(j)
    order = np.argsort(out_i) if out_i else []
    return (
        np.asarray(out_i, np.int64)[order],
        np.asarray(out_j, np.int64)[order],
    )


def interpolate_poses(T, t, t_query, extrapolate: bool = False):
    """Resample an SE(3) trajectory at new timestamps.

    ``T`` (N, 4, 4) poses at strictly increasing stamps ``t`` (N,);
    returns (M, 4, 4) poses at ``t_query`` by geodesic interpolation
    between the bracketing poses: T(u) = exp(u * log(T_b T_a^-1)) @ T_a.
    Out-of-range queries raise unless ``extrapolate`` (then they clamp to
    the end poses).
    """
    t = np.asarray(t, np.float64)
    tq = np.asarray(t_query, np.float64)
    if not extrapolate and (tq.min() < t[0] or tq.max() > t[-1]):
        raise ValueError(
            f"query stamps [{tq.min()}, {tq.max()}] outside trajectory "
            f"[{t[0]}, {t[-1]}]; pass extrapolate=True to clamp"
        )
    tq = np.clip(tq, t[0], t[-1])
    hi = np.clip(np.searchsorted(t, tq, side="right"), 1, len(t) - 1)
    lo = hi - 1
    denom = np.maximum(t[hi] - t[lo], 1e-12)
    u = (tq - t[lo]) / denom
    Td = jnp.asarray(np.asarray(T))
    Ta = Td[lo]
    Tb = Td[hi]
    xi = se3.log(Tb @ se3.inv(Ta))  # (M, 6)
    Tq = se3.exp(jnp.asarray(u)[:, None] * xi) @ Ta
    return np.asarray(Tq)


__all__ = ["associate", "interpolate_poses"]
