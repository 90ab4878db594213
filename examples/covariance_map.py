"""Uncertainty map of a solved 2D pose graph: solve a manhattan-style
SE(2) graph, recover EXACT per-pose marginal covariances through the
multifrontal sparse factorization (no dense (D, D), no PCG tolerance), and
plot the trajectory with 3-sigma position ellipses.

Shows the round-3 pieces end to end: solve_auto routing, sparse_chol, and
marginal_covariances_direct (reference analogue: Problem.compute_covariance
+ get_covariance_block, which inverts the full matrix)."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.solver import (
    Options,
    marginal_covariances_direct,
    route_auto,
    solve_auto,
)


def main():
    data = synth.se2_manhattan(n_poses=400, seed=3)
    g = build.pose_graph(data)
    print(f"route: {route_auto(g)} ({g.total_dof} dof)")
    solved, info = solve_auto(g, Options(method="gn", max_iters=30, min_cost_decrease=0.999))
    print(f"chi2 {float(g.chi2()):.2f} -> {float(info.chi2):.2f}")

    # exact marginals for every 16th pose via the multifrontal factors
    # (pose 0 is anchored/constant: its masked unit rows would read back as
    # identity, not a real marginal — start at the first free pose)
    idx = np.arange(16, 400, 16)
    marg = np.asarray(marginal_covariances_direct(solved, "poses", idx, leaf_size=64))
    T = np.asarray(solved.blocks["poses"].values)
    xy = T[:, :2, 2]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Ellipse

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.plot(xy[:, 0], xy[:, 1], "-", lw=0.7, color="tab:blue", label="trajectory")
    for k, i in enumerate(idx):
        P = marg[k][:2, :2]  # position block
        w, V = np.linalg.eigh(P)
        ang = np.degrees(np.arctan2(V[1, 1], V[0, 1]))
        e = Ellipse(
            xy[i], 6 * np.sqrt(max(w[1], 0)), 6 * np.sqrt(max(w[0], 0)),
            angle=ang, fill=False, color="tab:red", lw=0.6, alpha=0.8,
        )
        ax.add_patch(e)
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title("SE(2) manhattan graph: exact 3-sigma marginals (multifrontal)")
    fig.savefig("covariance_map.png", dpi=120)
    print("wrote covariance_map.png")
    # loop closures keep uncertainty bounded, but the pose nearest the
    # anchor should still carry the least of it
    tr = np.einsum("kii->k", marg[:, :2, :2])
    print(f"position var near anchor {tr[0]:.2e}, median {np.median(tr):.2e}, max {tr.max():.2e}")


if __name__ == "__main__":
    main()
