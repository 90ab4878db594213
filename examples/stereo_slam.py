"""End-to-end sparse stereo SLAM: RANSAC visual odometry frontend + loop
closures + pose-graph backend + trajectory metrics — every layer of the
framework in one pipeline.

  1. a synthetic world (point cloud) is observed from a circular trajectory
     of stereo frames;
  2. frame-to-frame motion comes from FrameToFrameRANSAC (batched
     hypothesize-and-test + motion-only GN polish);
  3. loop closures between revisited poses are measured the same way;
  4. odometry + loop factors form a pose graph solved by the jitted LM core;
  5. joint full SLAM: every stereo observation + the odometry factors in ONE
     mixed graph through solve_auto's Schur path (landmarks triangulated
     from their first observation);
  6. TrajectoryMetrics reports ATE at each stage.

Measured (TPU v5 lite, 40 frames): odometry 12.77 cm -> pose graph 8.80 cm
-> joint SLAM 0.38 cm ATE (3910 landmarks, 12000 observations).
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.eval import TrajectoryMetrics
from pyslam_tpu.graph.core import FactorBatch, FactorGraph, VariableBlock
from pyslam_tpu.lie import se3
from pyslam_tpu.losses import CauchyLoss
from pyslam_tpu.pipelines.ransac import FrameToFrameRANSAC
from pyslam_tpu.sensors import StereoCamera
from pyslam_tpu.solver import Options, solve

CAM = StereoCamera(cu=320.0, cv=240.0, fu=500.0, fv=500.0, b=0.3, w=640, h=480)


def make_world(rng, n_pts=4000, radius=8.0):
    """Points on a cylinder around the trajectory."""
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    r = radius + rng.uniform(1.0, 4.0, n_pts)
    z = rng.uniform(-2.0, 2.0, n_pts)
    return np.stack([r * np.cos(ang), r * np.sin(ang), z], axis=-1)


def gt_pose(k, n_frames, radius=8.0):
    """Camera on a circle, optical axis tangent to motion."""
    ang = 2 * np.pi * k / n_frames
    center = np.array([radius * np.cos(ang), radius * np.sin(ang), 0.0])
    z = np.array([-np.sin(ang), np.cos(ang), 0.0])  # direction of travel
    y = np.array([0.0, 0.0, -1.0])
    x = np.cross(y, z)
    R_wc = np.stack([x, y, z], axis=-1)
    T = np.eye(4)
    T[:3, :3] = R_wc.T
    T[:3, 3] = -R_wc.T @ center
    return T  # camera-from-world


def observe(T_c_w, world, rng, pix_noise=0.3, max_pts=300):
    """Visible stereo observations (ids + [uL, vL, d]) from a pose."""
    pc = world @ T_c_w[:3, :3].T + T_c_w[:3, 3]
    obs = np.asarray(CAM.project(jnp.asarray(pc)))
    vis = np.asarray(CAM.is_valid_measurement(jnp.asarray(obs))) & (pc[:, 2] > 0.5)
    ids = np.nonzero(vis)[0]
    if len(ids) > max_pts:
        ids = rng.choice(ids, max_pts, replace=False)
    return ids, obs[ids] + rng.normal(0, pix_noise, (len(ids), 3))


def relative_measurement(ids_a, obs_a, ids_b, obs_b, ransac):
    """T_b_a from matched stereo observations (None if too few matches)."""
    common, ia, ib = np.intersect1d(ids_a, ids_b, return_indices=True)
    if len(common) < 12:
        return None
    T, mask = ransac.compute_transform(obs_a[ia], obs_b[ib])
    if mask.sum() < 10:
        return None
    return np.asarray(T.mat)


def main(n_frames=40, seed=0):
    rng = np.random.default_rng(seed)
    world = make_world(rng)
    ransac = FrameToFrameRANSAC(CAM, num_iters=256, inlier_thresh=2.0)

    gt = [gt_pose(k, n_frames) for k in range(n_frames)]
    frames = [observe(T, world, rng) for T in gt]

    # --- frontend: RANSAC odometry chain ---
    edges = []
    est = [gt[0]]
    for k in range(1, n_frames):
        T_rel = relative_measurement(*frames[k - 1], *frames[k], ransac)
        assert T_rel is not None, f"odometry break at frame {k}"
        edges.append((k - 1, k, T_rel))
        est.append(T_rel @ est[-1])

    # --- loop closures: revisits by ground-truth proximity (stand-in for a
    # place-recognition module), measured with the SAME RANSAC frontend ---
    n_loops = 0
    for k in range(n_frames):
        for j in range(k + 5, n_frames):  # skip temporally adjacent pairs
            d = np.linalg.norm(
                np.linalg.inv(gt[k])[:3, 3] - np.linalg.inv(gt[j])[:3, 3]
            )
            if d < 2.5:
                T_rel = relative_measurement(*frames[k], *frames[j], ransac)
                if T_rel is not None:
                    edges.append((k, j, T_rel))
                    n_loops += 1

    tm_odo = TrajectoryMetrics(
        np.linalg.inv(np.stack(gt)), np.linalg.inv(np.stack(est))
    )
    print(f"{n_frames} frames, {len(edges)} edges ({n_loops} loop closures)")
    print(f"ATE odometry-only: {float(tm_odo.armse('trans')) * 100:.2f} cm")

    # --- backend: pose graph ---
    ei = np.array([e[0] for e in edges], np.int32)
    ej = np.array([e[1] for e in edges], np.int32)
    T_meas = np.stack([e[2] for e in edges])
    const = np.zeros(n_frames, bool)
    const[0] = True
    graph = FactorGraph(
        {"poses": VariableBlock.create("se3", jnp.asarray(np.stack(est), jnp.float32), const)},
        [
            FactorBatch.create(
                kind="between_se3",
                slots=("poses", "poses"),
                indices=(ei, ej),
                data={
                    "T_obs": jnp.asarray(T_meas, jnp.float32),
                    "sqrt_info": jnp.broadcast_to(
                        jnp.eye(6, dtype=jnp.float32) * 10.0, (len(edges), 6, 6)
                    ),
                },
                loss=CauchyLoss(2.0),
            )
        ],
    )
    solved, info = solve(graph, Options(method="lm", max_iters=50))
    opt = np.asarray(solved.blocks["poses"].values)
    tm_opt = TrajectoryMetrics(np.linalg.inv(np.stack(gt)), np.linalg.inv(opt))
    print(f"ATE optimized:     {float(tm_opt.armse('trans')) * 100:.2f} cm "
          f"({int(info.iterations)} LM iterations)")

    # --- stage 3: joint full SLAM — ALL stereo observations + odometry in
    # one graph (round-2 mixed-graph Schur path, dispatched by solve_auto):
    # poses from the pose-graph solution, landmarks triangulated from their
    # first observation, reprojection + between factors refined jointly ---
    from pyslam_tpu.solver import solve_auto

    obs_cam, obs_world, obs_uvd = [], [], []
    first_obs = {}
    for k, (ids, obs) in enumerate(frames):
        obs_cam.append(np.full(len(ids), k, np.int32))
        obs_world.append(ids.astype(np.int32))
        obs_uvd.append(obs)
        for row, wid in enumerate(ids):
            first_obs.setdefault(int(wid), (k, obs[row]))
    obs_cam = np.concatenate(obs_cam)
    obs_world = np.concatenate(obs_world)
    obs_uvd = np.concatenate(obs_uvd)
    used = np.unique(obs_world)
    remap = np.full(world.shape[0], -1, np.int32)
    remap[used] = np.arange(len(used), dtype=np.int32)

    lm_init = np.zeros((len(used), 3), np.float32)
    for wid in used:
        k, o = first_obs[int(wid)]
        p_cam = np.asarray(CAM.triangulate(jnp.asarray(o[None])))[0]
        T_w_c = np.linalg.inv(opt[k])
        lm_init[remap[wid]] = T_w_c[:3, :3] @ p_cam + T_w_c[:3, 3]

    slam = FactorGraph(
        {
            "poses": VariableBlock.create("se3", jnp.asarray(opt, jnp.float32), const),
            "landmarks": VariableBlock.create("euclidean", jnp.asarray(lm_init)),
        },
        [
            FactorBatch.create(
                kind="reprojection",
                slots=("poses", "landmarks"),
                indices=(obs_cam, remap[obs_world]),
                data={
                    "obs": jnp.asarray(obs_uvd, jnp.float32),
                    "sqrt_info": jnp.eye(3, dtype=jnp.float32),
                    "camera": CAM,
                },
                loss=CauchyLoss(3.0),
            ),
            graph.batches[0],  # the odometry/loop between factors
        ],
    )
    refined, info2 = solve_auto(slam, Options(method="lm", max_iters=30))
    opt2 = np.asarray(refined.blocks["poses"].values)
    tm_joint = TrajectoryMetrics(np.linalg.inv(np.stack(gt)), np.linalg.inv(opt2))
    print(f"ATE joint SLAM:    {float(tm_joint.armse('trans')) * 100:.2f} cm "
          f"({len(used)} landmarks, {len(obs_cam)} observations)")
    return (
        float(tm_odo.armse("trans")),
        float(tm_opt.armse("trans")),
        float(tm_joint.armse("trans")),
    )


if __name__ == "__main__":
    # NOTE: run under the default f32 precision.  With jax_enable_x64 the
    # synthetic RANSAC odometry comes out ~40% more accurate (7.8 vs 12.8
    # cm), and the middle pose-graph stage's marginal improvement flips to
    # a marginal worsening — the joint-SLAM stage still reaches 0.38 cm
    # either way (verified 2026-08-17).
    ate_odo, ate_opt, ate_joint = main()
    assert ate_opt < ate_odo, "optimization must improve ATE"
    assert ate_joint < ate_opt, "joint SLAM must improve on the pose graph"
