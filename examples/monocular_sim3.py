"""Monocular scale-drift correction: Sim(3) pose-graph optimization.

The monocular SLAM failure mode: odometry scale drifts (here 1%/keyframe,
compounding to ~3.3x), and only Sim(3)-aware loop closures can pull it
back (Strasdat RSS 2010 — the ORB-SLAM loop correction).  One of the loop
closures is corrupted (wrong pose AND wrong scale), so the solve runs
through graduated non-convexity, which classifies it out.

Demonstrates: lie/sim3.py + between_sim3 factors + GNC robustness +
Umeyama sim3 trajectory alignment for the ATE numbers.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp
from pyslam_tpu.eval import TrajectoryMetrics
from pyslam_tpu.graph import build
from pyslam_tpu.io import synth
from pyslam_tpu.lie import sim3
from pyslam_tpu.solver import Options
from pyslam_tpu.solver.gnc import solve_gnc


def main():
    data = synth.sim3_loop(
        n_poses=80, n_loops=6, scale_drift=0.005, odo_scale_std=0.005, seed=5
    )
    # corrupt two loop closures (wrong transform, ~2.2x wrong scale ratio)
    n_odo = data.T_init.shape[0] - 1
    bad = np.array([n_odo + 1, n_odo + 3])
    rng = np.random.default_rng(7)
    for e in bad:
        xi = rng.normal(size=7)
        xi[6] = 0.8
        data.T_meas[e] = np.asarray(sim3.exp(jnp.asarray(xi)))

    scales0 = np.asarray(sim3.scale(jnp.asarray(data.T_init)))
    print(f"integrated init: scale drift up to {scales0.max():.2f}x")

    g = build.sim3_pose_graph(data, dtype=jnp.float64)
    solved, info = solve_gnc(g, Options(method="lm", max_iters=50))
    (mask,) = info.inlier_masks
    print(
        f"GNC: chi2 {float(g.chi2()):.0f} -> {info.chi2:.1f}, "
        f"edges classified outlier: "
        f"{np.nonzero(~np.asarray(mask))[0].tolist()} (planted: {bad.tolist()})"
    )
    scales = np.asarray(sim3.scale(solved.blocks["poses"].values))
    print(f"optimized scales within [{scales.min():.3f}, {scales.max():.3f}]")

    # ATE with the evo-style sim3 alignment (monocular global scale is gauge)
    tm_init = TrajectoryMetrics(data.T_gt, data.T_init).align("sim3")
    tm_opt = TrajectoryMetrics(
        data.T_gt, np.asarray(solved.blocks["poses"].values)
    ).align("sim3")
    ate0 = float(tm_init.armse("trans"))
    ate1 = float(tm_opt.armse("trans"))
    print(f"ATE (sim3-aligned): {ate0:.3f} m -> {ate1:.3f} m")

    assert not mask[bad].any()
    assert scales.max() < 1.6
    assert ate1 < ate0 / 3


if __name__ == "__main__":
    main()
