"""2D landmark SLAM (Victoria-Park model family): an SE(2) robot drives a
loop through a field of point landmarks, observing bearing + range to every
landmark within sensor radius.  Odometry drifts; loop closure emerges from
re-observing landmarks — no explicit loop-closure edges.  The graph (se2
poses + 2-dof euclidean landmarks) routes through the dof-generic Schur
path via solve_auto.  Prints trajectory/landmark errors before and after.

Run: python examples/landmark_slam_2d.py [--obs xy]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options, route_auto, solve_auto


def _positions(T):
    """World positions from world-to-body poses."""
    return np.stack([np.linalg.inv(Tk)[:2, 2] for Tk in np.asarray(T)])


def _run_incremental(data, update_every=5):
    """Stream the dataset through the online smoother; returns a compacted
    FactorGraph whose landmark block is reordered back to dataset ids."""
    from pyslam_tpu.solver import IncrementalSmoother, Options as O

    kind = "bearing_range_se2" if data.obs_type == "bearing_range" else "landmark_xy_se2"
    sm = IncrementalSmoother(
        kind="se2", obs_kind=kind, options=O(method="lm", max_iters=12)
    )
    obs_by_pose = {}
    for m in range(len(data.obs_pose)):
        obs_by_pose.setdefault(int(data.obs_pose[m]), []).append(m)
    lm_id = {}
    prev = None
    for k in range(len(data.T_init)):
        if k == 0:
            prev = sm.add_pose(data.T_init[0])
        else:
            cur = sm.add_pose(data.T_meas[k - 1] @ sm.poses()[prev])
            sm.add_between(prev, cur, data.T_meas[k - 1], data.sqrt_info[k - 1])
            prev = cur
        for m in obs_by_pose.get(k, []):
            lj = int(data.obs_lm[m])
            if lj not in lm_id:
                if data.obs_type == "bearing_range":
                    b, r = data.obs[m]
                    p_local = np.array([r * np.cos(b), r * np.sin(b)])
                else:
                    p_local = np.asarray(data.obs[m])
                Tk = sm.poses()[prev]
                lm_id[lj] = sm.add_landmark(Tk[:2, :2].T @ (p_local - Tk[:2, 2]))
            sm.add_observation(prev, lm_id[lj], data.obs[m], data.obs_sqrt_info[m])
        if k % update_every == 0 or k == len(data.T_init) - 1:
            sm.update()
    g = sm._graph(n=sm.n, m=sm.m, nl=sm.nl, mo=sm.mo)
    # reorder the landmark block back to dataset ids for the error report
    import jax.numpy as jnp
    from pyslam_tpu.graph.core import FactorGraph, VariableBlock

    perm = np.empty(sm.nl, np.int64)
    for dataset_id, smoother_id in lm_id.items():
        perm[dataset_id] = smoother_id
    lb = g.blocks["landmarks"]
    blocks = dict(g.blocks)
    blocks["landmarks"] = VariableBlock(
        lb.kind, lb.values[jnp.asarray(perm)], lb.const_mask[jnp.asarray(perm)]
    )
    # (the factor batches keep smoother ids; the reordered block is only
    # for reporting — rebuild chi2 on the original graph)
    print(f"online updates done: {sm.n} poses, {sm.nl} landmarks, {sm.compiles} compiles")
    return g, FactorGraph(blocks, []), perm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", choices=["bearing_range", "xy"], default="bearing_range")
    ap.add_argument("--poses", type=int, default=400)
    ap.add_argument("--landmarks", type=int, default=120)
    ap.add_argument(
        "--incremental", action="store_true",
        help="run ONLINE through solver.IncrementalSmoother (update every "
        "5 frames) instead of one batch solve",
    )
    args = ap.parse_args()

    data = synth.landmark_slam_2d(
        n_poses=args.poses,
        n_landmarks=args.landmarks,
        max_range=10.0,
        obs_type=args.obs,
        seed=0,
    )
    g = build.landmark_slam_2d(data)
    print(
        f"{args.poses} poses, {len(data.lm_gt)} observed landmarks, "
        f"{len(data.obs)} {args.obs} observations, route: {route_auto(g)}"
    )

    pos_gt = _positions(data.T_gt)
    ate = lambda T: float(
        np.sqrt(np.mean(np.sum((_positions(T) - pos_gt) ** 2, axis=1)))
    )
    lm_rmse = lambda lm: float(
        np.sqrt(np.mean(np.sum((np.asarray(lm) - data.lm_gt) ** 2, axis=1)))
    )

    if args.incremental:
        g_online, solved, _ = _run_incremental(data)
        print(f"online chi2 at the final update: {float(g_online.chi2()):.1f}")
    else:
        solved, info = solve_auto(g, Options(method="lm", max_iters=30))
        chi2 = float(info.chi2) if hasattr(info, "chi2") else float(info[-1])
        print(f"chi2: {float(g.chi2()):.1f} -> {chi2:.1f}")
    print(
        f"trajectory ATE: {100 * ate(data.T_init):.2f} cm (odometry) -> "
        f"{100 * ate(solved.blocks['poses'].values):.2f} cm (SLAM)"
    )
    # aligned ATE (evo/TUM convention): removes the near-gauge global
    # rotation about the anchored pose, which the landmark observations of
    # pose 0 alone pin only weakly
    from pyslam_tpu.eval.metrics import TrajectoryMetrics

    inv = np.linalg.inv
    m = TrajectoryMetrics(
        np.stack([inv(Tk) for Tk in data.T_gt]),
        np.stack([inv(Tk) for Tk in np.asarray(solved.blocks["poses"].values)]),
    ).align("se2")
    print(f"aligned ATE: {100 * m.armse('trans'):.2f} cm")
    print(
        f"landmark RMSE: {100 * lm_rmse(data.lm_init):.2f} cm (first-obs init) -> "
        f"{100 * lm_rmse(solved.blocks['landmarks'].values):.2f} cm"
    )


if __name__ == "__main__":
    main()
