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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", choices=["bearing_range", "xy"], default="bearing_range")
    ap.add_argument("--poses", type=int, default=400)
    ap.add_argument("--landmarks", type=int, default=120)
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
