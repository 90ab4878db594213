"""g2o pose-graph file I/O (benchmark config #2 'Intel/M3500 (g2o format)',
BASELINE.json:8).

Supported records:
  VERTEX_SE2 id x y theta
  EDGE_SE2 i j dx dy dtheta  <6 upper-tri info entries>
  VERTEX_SE3:QUAT id x y z qx qy qz qw
  EDGE_SE3:QUAT i j dx dy dz qx qy qz qw  <21 upper-tri info entries>
  VERTEX_SIM3:QUAT id x y z qx qy qz qw s           (ORB-SLAM convention)
  EDGE_SIM3:QUAT i j dx dy dz qx qy qz qw s  <28 upper-tri info entries>
  VERTEX_XY id x y                                  (2D point landmark)
  EDGE_SE2_XY i j mx my <3 upper-tri info entries>  (landmark seen from pose)

Files containing landmark records parse to LandmarkSLAM2DData (2D landmark
SLAM, e.g. Victoria-Park-style datasets); pure pose files parse to
PoseGraphData.

Convention bridge: g2o vertices are body-to-world and the edge measurement is
M_ij = T_i^-1 @ T_j.  This framework follows the reference's world-to-body
convention (pyslam poses are T_b_w, SURVEY.md §3.2), where P = T^-1 and
M_ij = P_i @ P_j^-1 — i.e. a between factor with slots (j, i) and
T_obs = M_ij.  The readers/writers perform that mapping, so solving a loaded
g2o graph optimizes the standard g2o objective.
"""

from __future__ import annotations

import numpy as np

from .synth import LandmarkSLAM2DData, PoseGraphData


def _quat_to_mat(q):
    """[qx, qy, qz, qw] -> 3x3 rotation matrix."""
    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    s = 2.0 / n
    return np.array(
        [
            [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
            [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
            [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
        ]
    )


def _mat_to_quat(R):
    """3x3 rotation -> [qx, qy, qz, qw] (Shepperd's method)."""
    t = np.trace(R)
    if t > 0:
        w = 0.5 * np.sqrt(1 + t)
        f = 0.25 / w
        return np.array(
            [(R[2, 1] - R[1, 2]) * f, (R[0, 2] - R[2, 0]) * f, (R[1, 0] - R[0, 1]) * f, w]
        )
    i = int(np.argmax(np.diagonal(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    q = np.zeros(4)
    q[i] = 0.5 * np.sqrt(1 + R[i, i] - R[j, j] - R[k, k])
    f = 0.25 / q[i]
    q[j] = (R[j, i] + R[i, j]) * f
    q[k] = (R[k, i] + R[i, k]) * f
    q[3] = (R[k, j] - R[j, k]) * f
    return q


def _unpack_upper(vals, d):
    info = np.zeros((d, d))
    k = 0
    for a in range(d):
        for b in range(a, d):
            info[a, b] = info[b, a] = vals[k]
            k += 1
    return info


def _sqrt_info(info):
    w, V = np.linalg.eigh(info)
    w = np.clip(w, 0.0, None)
    return V @ np.diag(np.sqrt(w)) @ V.T


def read_g2o(path) -> "PoseGraphData | LandmarkSLAM2DData":
    """Parse a g2o file into PoseGraphData — or LandmarkSLAM2DData when the
    file carries VERTEX_XY/EDGE_SE2_XY landmark records (world-to-body
    poses, between-factor slots already swapped per the convention bridge
    above)."""
    verts: dict[int, np.ndarray] = {}
    edges = []
    lm_verts: dict[int, np.ndarray] = {}
    lm_edges = []
    dim = None
    sim3 = False
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            tag = tok[0]
            # legacy TORO/g2o aliases seen in published datasets
            tag = {"VERTEX2": "VERTEX_SE2", "EDGE2": "EDGE_SE2",
                   "VERTEX3": "VERTEX_SE3:QUAT", "EDGE3": "EDGE_SE3:QUAT",
                   "VERTEX_SE3": "VERTEX_SE3:QUAT", "EDGE_SE3": "EDGE_SE3:QUAT",
                   "VERTEX_SIM3": "VERTEX_SIM3:QUAT", "EDGE_SIM3": "EDGE_SIM3:QUAT",
                   }.get(tag, tag)
            if tag == "VERTEX_SE2":
                dim = dim or 2
                i = int(tok[1])
                x, y, th = map(float, tok[2:5])
                T = np.eye(3)
                c, s = np.cos(th), np.sin(th)
                T[:2, :2] = [[c, -s], [s, c]]
                T[:2, 2] = [x, y]
                verts[i] = T
            elif tag == "VERTEX_SE3:QUAT":
                dim = dim or 3
                i = int(tok[1])
                v = list(map(float, tok[2:9]))
                T = np.eye(4)
                T[:3, :3] = _quat_to_mat(v[3:7])
                T[:3, 3] = v[0:3]
                verts[i] = T
            elif tag == "EDGE_SE2":
                i, j = int(tok[1]), int(tok[2])
                dx, dy, dth = map(float, tok[3:6])
                M = np.eye(3)
                c, s = np.cos(dth), np.sin(dth)
                M[:2, :2] = [[c, -s], [s, c]]
                M[:2, 2] = [dx, dy]
                info = _unpack_upper(list(map(float, tok[6:12])), 3)
                edges.append((i, j, M, info))
            elif tag == "EDGE_SE3:QUAT":
                i, j = int(tok[1]), int(tok[2])
                v = list(map(float, tok[3:10]))
                M = np.eye(4)
                M[:3, :3] = _quat_to_mat(v[3:7])
                M[:3, 3] = v[0:3]
                info = _unpack_upper(list(map(float, tok[10:31])), 6)
                edges.append((i, j, M, info))
            elif tag == "VERTEX_SIM3:QUAT":
                dim = dim or 3
                sim3 = True
                i = int(tok[1])
                v = list(map(float, tok[2:10]))
                T = np.eye(4)
                T[:3, :3] = v[7] * _quat_to_mat(v[3:7])
                T[:3, 3] = v[0:3]
                verts[i] = T
            elif tag == "VERTEX_XY":
                dim = dim or 2
                lm_verts[int(tok[1])] = np.array([float(tok[2]), float(tok[3])])
            elif tag == "EDGE_SE2_XY":
                i, j = int(tok[1]), int(tok[2])
                m = np.array([float(tok[3]), float(tok[4])])
                info = _unpack_upper(list(map(float, tok[5:8])), 2)
                lm_edges.append((i, j, m, info))
            elif tag == "EDGE_SIM3:QUAT":
                sim3 = True
                i, j = int(tok[1]), int(tok[2])
                v = list(map(float, tok[3:11]))
                M = np.eye(4)
                M[:3, :3] = v[7] * _quat_to_mat(v[3:7])
                M[:3, 3] = v[0:3]
                info = _unpack_upper(list(map(float, tok[11:39])), 7)
                edges.append((i, j, M, info))

    if lm_verts or lm_edges:
        return _assemble_landmark_slam(verts, edges, lm_verts, lm_edges)

    n = max(verts) + 1
    d = 3 if dim == 2 else 4
    dof = 3 if dim == 2 else (7 if sim3 else 6)
    T_bw = np.stack([np.linalg.inv(verts[i]) for i in range(n)])  # world-to-body
    E = len(edges)
    edges_i = np.zeros(E, np.int64)
    edges_j = np.zeros(E, np.int64)
    T_meas = np.zeros((E, d, d))
    sqrt_info = np.zeros((E, dof, dof))
    for k, (i, j, M, info) in enumerate(edges):
        # between factor est = P_slot2 @ inv(P_slot1); M_ij = P_i @ P_j^-1
        edges_i[k] = j
        edges_j[k] = i
        T_meas[k] = M
        sqrt_info[k] = _sqrt_info(info)
    return PoseGraphData(
        2 if dim == 2 else 3, T_bw, T_bw.copy(), edges_i, edges_j, T_meas, sqrt_info
    )


def _assemble_landmark_slam(verts, edges, lm_verts, lm_edges) -> LandmarkSLAM2DData:
    """2D landmark-SLAM file -> LandmarkSLAM2DData.  g2o pose/landmark
    vertices share one id space and need not be contiguous; both are
    remapped to dense indices by sorted id.  The EDGE_SE2_XY measurement is
    the landmark in the observing pose's frame, which under the world-to-
    body bridge is exactly act(T, l) — the landmark_xy_se2 kernel's
    prediction (graph/factor_defs.py)."""
    pose_ids = sorted(verts)
    lm_ids = sorted(lm_verts)
    pidx = {g: k for k, g in enumerate(pose_ids)}
    lidx = {g: k for k, g in enumerate(lm_ids)}
    T_bw = np.stack([np.linalg.inv(verts[g]) for g in pose_ids])
    lm = np.stack([lm_verts[g] for g in lm_ids]) if lm_ids else np.zeros((0, 2))

    E = len(edges)
    edges_i = np.zeros(E, np.int64)
    edges_j = np.zeros(E, np.int64)
    T_meas = np.zeros((E, 3, 3))
    sqrt_info = np.zeros((E, 3, 3))
    for k, (i, j, M, info) in enumerate(edges):
        edges_i[k] = pidx[j]
        edges_j[k] = pidx[i]
        T_meas[k] = M
        sqrt_info[k] = _sqrt_info(info)

    Mn = len(lm_edges)
    obs_pose = np.zeros(Mn, np.int64)
    obs_lm = np.zeros(Mn, np.int64)
    obs = np.zeros((Mn, 2))
    osi = np.zeros((Mn, 2, 2))
    for k, (i, j, m, info) in enumerate(lm_edges):
        obs_pose[k] = pidx[i]
        obs_lm[k] = lidx[j]
        obs[k] = m
        osi[k] = _sqrt_info(info)
    return LandmarkSLAM2DData(
        T_gt=T_bw,
        T_init=T_bw.copy(),
        lm_gt=lm,
        lm_init=lm.copy(),
        edges_i=edges_i,
        edges_j=edges_j,
        T_meas=T_meas,
        sqrt_info=sqrt_info,
        obs_pose=obs_pose,
        obs_lm=obs_lm,
        obs=obs,
        obs_sqrt_info=osi,
        obs_type="xy",
    )


def write_g2o_landmarks(path, data: LandmarkSLAM2DData, use_init: bool = True):
    """Write LandmarkSLAM2DData as VERTEX_SE2/VERTEX_XY/EDGE_SE2/EDGE_SE2_XY
    records (inverse of the landmark branch of read_g2o).  Landmark vertex
    ids follow the pose ids.  Only obs_type='xy' data round-trips — g2o has
    no standard bearing-range record."""
    if data.obs_type != "xy":
        raise ValueError("g2o landmark records are relative-position (obs_type='xy')")
    T = data.T_init if use_init else data.T_gt
    lm = data.lm_init if use_init else data.lm_gt
    n = len(T)
    with open(path, "w") as f:
        for i, P in enumerate(T):
            V = np.linalg.inv(P)
            th = np.arctan2(V[1, 0], V[0, 0])
            f.write(f"VERTEX_SE2 {i} {V[0, 2]:.9g} {V[1, 2]:.9g} {th:.9g}\n")
        for k, p in enumerate(lm):
            f.write(f"VERTEX_XY {n + k} {p[0]:.9g} {p[1]:.9g}\n")
        for k in range(len(data.edges_i)):
            gj, gi = int(data.edges_i[k]), int(data.edges_j[k])
            M = data.T_meas[k]
            th = np.arctan2(M[1, 0], M[0, 0])
            info = data.sqrt_info[k].T @ data.sqrt_info[k]
            up = [info[a, b] for a in range(3) for b in range(a, 3)]
            f.write(
                f"EDGE_SE2 {gi} {gj} {M[0, 2]:.9g} {M[1, 2]:.9g} {th:.9g} "
                + " ".join(f"{v:.9g}" for v in up)
                + "\n"
            )
        for k in range(len(data.obs_pose)):
            info = data.obs_sqrt_info[k].T @ data.obs_sqrt_info[k]
            up = [info[a, b] for a in range(2) for b in range(a, 2)]
            f.write(
                f"EDGE_SE2_XY {int(data.obs_pose[k])} {n + int(data.obs_lm[k])} "
                f"{data.obs[k, 0]:.9g} {data.obs[k, 1]:.9g} "
                + " ".join(f"{v:.9g}" for v in up)
                + "\n"
            )


def write_g2o(path, data: PoseGraphData, use_init: bool = True):
    """Write PoseGraphData to a g2o file (inverse of read_g2o)."""
    T = data.T_init if use_init else data.T_gt
    with open(path, "w") as f:
        if data.dim == 2:
            for i, P in enumerate(T):
                V = np.linalg.inv(P)  # world-to-body -> body-to-world
                th = np.arctan2(V[1, 0], V[0, 0])
                f.write(f"VERTEX_SE2 {i} {V[0, 2]:.9g} {V[1, 2]:.9g} {th:.9g}\n")
            for k in range(len(data.edges_i)):
                # our (slot1, slot2) = (j, i) in g2o terms
                gj, gi = int(data.edges_i[k]), int(data.edges_j[k])
                M = data.T_meas[k]
                th = np.arctan2(M[1, 0], M[0, 0])
                info = data.sqrt_info[k].T @ data.sqrt_info[k]
                up = [info[a, b] for a in range(3) for b in range(a, 3)]
                f.write(
                    f"EDGE_SE2 {gi} {gj} {M[0, 2]:.9g} {M[1, 2]:.9g} {th:.9g} "
                    + " ".join(f"{v:.9g}" for v in up)
                    + "\n"
                )
        else:
            is_sim3 = data.sqrt_info.shape[-1] == 7
            dof = 7 if is_sim3 else 6

            def _split(A):
                """(4,4) (possibly scaled) -> (t, q, s)."""
                s = float(np.cbrt(np.linalg.det(A[:3, :3]))) if is_sim3 else 1.0
                return A[:3, 3], _mat_to_quat(A[:3, :3] / s), s

            vtag = "VERTEX_SIM3:QUAT" if is_sim3 else "VERTEX_SE3:QUAT"
            etag = "EDGE_SIM3:QUAT" if is_sim3 else "EDGE_SE3:QUAT"
            for i, P in enumerate(T):
                t, q, s = _split(np.linalg.inv(P))
                row = list(t) + list(q) + ([s] if is_sim3 else [])
                f.write(f"{vtag} {i} " + " ".join(f"{v:.9g}" for v in row) + "\n")
            for k in range(len(data.edges_i)):
                gj, gi = int(data.edges_i[k]), int(data.edges_j[k])
                t, q, s = _split(data.T_meas[k])
                info = data.sqrt_info[k].T @ data.sqrt_info[k]
                up = [info[a, b] for a in range(dof) for b in range(a, dof)]
                row = list(t) + list(q) + ([s] if is_sim3 else []) + up
                f.write(f"{etag} {gi} {gj} " + " ".join(f"{v:.9g}" for v in row) + "\n")
