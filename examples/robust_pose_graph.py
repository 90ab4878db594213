"""Robust pose-graph optimization under wrong loop closures: plain LM vs
GNC (graduated non-convexity, solver/gnc.py) vs switchable constraints
(Vertigo, build.switchable_pose_graph) on the same poisoned graph.

Both robust paths must recover the clean-graph trajectory; they differ in
what they expose — GNC yields per-factor TLS weights, switchable
constraints yield a per-edge switch posterior (near 0 = rejected) that
downstream modules (loop-closure databases, map merging) can read.

    python examples/robust_pose_graph.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)  # the demo compares in f64

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.solver import Options, solve, solve_gnc


def ate(T_est, T_ref):
    return float(
        np.sqrt(np.mean(np.sum((T_est[:, :2, 2] - T_ref[:, :2, 2]) ** 2, axis=1)))
    )


def main():
    clean = synth.se2_loop(n_poses=120, n_loops=14, seed=0)
    poisoned, outlier_mask = synth.with_outliers(clean, n_outliers=5, seed=1)
    opts = Options(method="lm", max_iters=60)

    g_ref, _ = solve(build.pose_graph(clean, dtype=jnp.float64), opts)
    T_ref = np.asarray(g_ref.blocks["poses"].values)

    # 1. plain LM on the poisoned graph: outliers drag the estimate
    g_plain, _ = solve(build.pose_graph(poisoned, dtype=jnp.float64), opts)
    print(f"plain LM    ATE vs clean solve: "
          f"{ate(np.asarray(g_plain.blocks['poses'].values), T_ref) * 100:.2f} cm")

    # 2. GNC: graduated non-convexity reweights residuals
    g_gnc, info = solve_gnc(build.pose_graph(poisoned, dtype=jnp.float64), opts)
    w = np.asarray(info.weights[0])
    print(f"GNC         ATE vs clean solve: "
          f"{ate(np.asarray(g_gnc.blocks['poses'].values), T_ref) * 100:.2f} cm; "
          f"outlier weights max {w[outlier_mask].max():.3f}")

    # 3. switchable constraints: per-edge switch posterior
    g_sw = build.switchable_pose_graph(poisoned, dtype=jnp.float64, xi=5.0)
    solved, _ = solve(g_sw, opts)
    s = np.asarray(solved.blocks["switches"].values)[:, 0]
    n_out = int(outlier_mask.sum())
    print(f"switchable  ATE vs clean solve: "
          f"{ate(np.asarray(solved.blocks['poses'].values), T_ref) * 100:.2f} cm; "
          f"outlier switches max {s[-n_out:].max():.3f}, "
          f"inlier switches min {np.sort(s)[n_out:].min():.3f}")


if __name__ == "__main__":
    main()
