"""EuRoC MAV dataset format I/O (ASL format) — the standard VIO benchmark.

The canonical files are not on disk in this environment (SURVEY.md §0), so
these readers/writers exist for the same reason as io/g2o.py and io/bal.py:
the day real EuRoC sequences are obtainable, the visual-inertial stack
(pyslam_tpu/imu.py) runs on them unmodified; until then the writers produce
format-exact synthetic files and the tests round-trip through them.

Files (ASL layout, comma-separated, one header line starting with '#'):
  imu0/data.csv:     t[ns], w_x, w_y, w_z [rad/s], a_x, a_y, a_z [m/s^2]
  state_groundtruth_estimate0/data.csv:
      t[ns], p_x, p_y, p_z, q_w, q_x, q_y, q_z,
      v_x, v_y, v_z, b_w_x, b_w_y, b_w_z, b_a_x, b_a_y, b_a_z
Ground-truth poses are body-to-world (T_WB); ``read_groundtruth`` returns
them converted to this framework's world-to-body convention (T_b_w).
"""

from __future__ import annotations

import numpy as np


def _read_csv(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(v) for v in line.split(",")])
    return np.asarray(rows)


def read_imu(path):
    """imu0/data.csv -> (t (K,) seconds, omega (K, 3), accel (K, 3))."""
    M = _read_csv(path)
    return M[:, 0] * 1e-9, M[:, 1:4], M[:, 4:7]


def write_imu(path, t, omega, accel):
    """Inverse of read_imu (t in seconds)."""
    with open(path, "w") as f:
        f.write("#timestamp [ns],w_RS_S_x [rad s^-1],w_RS_S_y [rad s^-1],"
                "w_RS_S_z [rad s^-1],a_RS_S_x [m s^-2],a_RS_S_y [m s^-2],"
                "a_RS_S_z [m s^-2]\n")
        for k in range(len(t)):
            f.write(
                f"{int(round(t[k] * 1e9))},"
                + ",".join(f"{v:.9g}" for v in omega[k])
                + ","
                + ",".join(f"{v:.9g}" for v in accel[k])
                + "\n"
            )


def _quat_wxyz_to_R(q):
    w, x, y, z = q
    n = w * w + x * x + y * y + z * z
    s = 2.0 / n
    return np.array(
        [
            [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
            [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
            [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
        ]
    )


def _R_to_quat_wxyz(R):
    t = np.trace(R)
    if t > 0:
        w = 0.5 * np.sqrt(1 + t)
        f = 0.25 / w
        return np.array(
            [w, (R[2, 1] - R[1, 2]) * f, (R[0, 2] - R[2, 0]) * f, (R[1, 0] - R[0, 1]) * f]
        )
    i = int(np.argmax(np.diagonal(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    q = np.zeros(3)
    qi = 0.5 * np.sqrt(1 + R[i, i] - R[j, j] - R[k, k])
    f = 0.25 / qi
    out = np.zeros(4)
    out[0] = (R[k, j] - R[j, k]) * f
    out[1 + i] = qi
    out[1 + j] = (R[j, i] + R[i, j]) * f
    out[1 + k] = (R[k, i] + R[i, k]) * f
    return out


def read_groundtruth(path):
    """state_groundtruth_estimate0/data.csv ->
    (t (N,) s, T_b_w (N, 4, 4), v (N, 3), b_gyro (N, 3), b_accel (N, 3)).

    The file stores T_WB (body-to-world); returned poses are inverted into
    the framework's world-to-body convention."""
    M = _read_csv(path)
    t = M[:, 0] * 1e-9
    N = len(M)
    T = np.zeros((N, 4, 4))
    for i in range(N):
        R_wb = _quat_wxyz_to_R(M[i, 4:8])
        T[i] = np.eye(4)
        T[i][:3, :3] = R_wb.T
        T[i][:3, 3] = -R_wb.T @ M[i, 1:4]
    return t, T, M[:, 8:11], M[:, 11:14], M[:, 14:17]


def write_groundtruth(path, t, T_b_w, v, b_gyro=None, b_accel=None):
    """Inverse of read_groundtruth (poses in the framework convention)."""
    N = len(t)
    b_gyro = np.zeros((N, 3)) if b_gyro is None else np.broadcast_to(b_gyro, (N, 3))
    b_accel = np.zeros((N, 3)) if b_accel is None else np.broadcast_to(b_accel, (N, 3))
    with open(path, "w") as f:
        f.write("#timestamp,p_RS_R_x [m],p_RS_R_y [m],p_RS_R_z [m],"
                "q_RS_w [],q_RS_x [],q_RS_y [],q_RS_z [],"
                "v_RS_R_x [m s^-1],v_RS_R_y [m s^-1],v_RS_R_z [m s^-1],"
                "b_w_RS_S_x [rad s^-1],b_w_RS_S_y [rad s^-1],b_w_RS_S_z [rad s^-1],"
                "b_a_RS_S_x [m s^-2],b_a_RS_S_y [m s^-2],b_a_RS_S_z [m s^-2]\n")
        for k in range(N):
            A = T_b_w[k][:3, :3]
            p = -A.T @ T_b_w[k][:3, 3]
            q = _R_to_quat_wxyz(A.T)
            row = (
                [int(round(t[k] * 1e9))]
                + list(p)
                + list(q)
                + list(v[k])
                + list(b_gyro[k])
                + list(b_accel[k])
            )
            f.write(",".join(f"{x:.9g}" if i else str(x) for i, x in enumerate(row)) + "\n")


def segment_imu(t_imu, omega, accel, t_keyframes):
    """Split a continuous IMU stream into per-keyframe-interval sample
    arrays for ``imu.preintegrate``: returns a list of (omega_i, accel_i,
    dts_i) covering [t_kf[i], t_kf[i+1]).  Sample k's interval is
    t[k+1] - t[k] (last sample of a segment integrates up to the keyframe
    boundary)."""
    out = []
    for i in range(len(t_keyframes) - 1):
        lo, hi = t_keyframes[i], t_keyframes[i + 1]
        sel = np.nonzero((t_imu >= lo) & (t_imu < hi))[0]
        if len(sel) == 0:
            raise ValueError(f"no IMU samples in keyframe interval {i}")
        bounds = np.concatenate([t_imu[sel], [hi]])
        dts = np.diff(bounds)
        out.append((omega[sel], accel[sel], dts))
    return out
