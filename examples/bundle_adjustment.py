"""Bundle adjustment with Schur-complement landmark marginalization: read a
BAL file (or synthesize one), optimize, report reprojection RMSE."""

import argparse

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyslam_tpu.graph import build
from pyslam_tpu.io import bal
from pyslam_tpu.solver import Options, solve_schur


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bal", help="input BAL problem file (default: synthetic)")
    ap.add_argument("--cams", type=int, default=49)
    ap.add_argument("--points", type=int, default=7000)
    ap.add_argument("--mode", default="pcg", choices=["dense", "pcg"])
    args = ap.parse_args()

    if args.bal:
        data = bal.read_bal(args.bal)
    else:
        data = bal.perturbed(bal.synthetic_bal(n_cams=args.cams, n_pts=args.points))
    graph = build.bal_graph(data)
    m = len(data.cam_idx)
    print(f"{len(data.T)} cameras, {len(data.pts)} landmarks, {m} observations")
    chi0 = float(graph.chi2())
    print(f"reprojection RMSE initial: {np.sqrt(chi0 / m):.3f} px")

    solved, info = solve_schur(graph, Options(method="lm", max_iters=30), mode=args.mode)
    chi1 = float(info.chi2)
    print(f"reprojection RMSE solved:  {np.sqrt(chi1 / m):.3f} px "
          f"({int(info.iterations)} LM iterations)")


if __name__ == "__main__":
    main()
