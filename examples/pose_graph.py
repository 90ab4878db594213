"""Pose-graph optimization end-to-end: synthesize a sphere2500-style SE(3)
graph (or read a .g2o file), solve with the block-sparse jitted LM core,
and report trajectory metrics."""

import argparse

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyslam_tpu.eval import TrajectoryMetrics
from pyslam_tpu.graph import build
from pyslam_tpu.io import g2o, synth
from pyslam_tpu.observability import write_iteration_log
from pyslam_tpu.solver import Options
from pyslam_tpu.solver.bcsr import solve_ell


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--g2o", help="input .g2o file (default: synthetic sphere)")
    ap.add_argument("--poses", type=int, default=500)
    ap.add_argument("--log", help="JSONL iteration log path")
    args = ap.parse_args()

    data = g2o.read_g2o(args.g2o) if args.g2o else synth.se3_sphere(args.poses, seed=0)
    graph = build.pose_graph(data)
    print(f"{data.T_init.shape[0]} poses, {len(data.edges_i)} edges")
    print(f"chi2 initial: {float(graph.chi2()):.2f}")

    solved, info = solve_ell(graph, Options(method="lm", max_iters=50))
    print(f"chi2 solved:  {float(info.chi2):.2f} in {int(info.iterations)} iterations")
    if args.log:
        write_iteration_log(info, args.log)

    if data.T_gt is not None:
        est = np.asarray(solved.blocks["poses"].values)
        tm = TrajectoryMetrics(np.linalg.inv(data.T_gt), np.linalg.inv(est))
        trans_rmse = float(tm.armse("trans"))
        print(f"position RMSE vs ground truth: {trans_rmse:.3f} m")


if __name__ == "__main__":
    main()
