"""Full SLAM in one factor graph: odometry between-factors + landmark
reprojections, solved jointly through solve_auto's extended Schur path
(round 2 — previously these had to be solved as separate pose-graph and BA
stages).  Prints the joint chi2 trajectory and the pose/landmark errors."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from pyslam_tpu.graph import build
from pyslam_tpu.graph.core import FactorBatch, FactorGraph
from pyslam_tpu.io import synth
from pyslam_tpu.losses import HuberLoss, L2Loss
from pyslam_tpu.solver import Options, solve_auto


def main():
    data = synth.ba_synthetic(n_cams=12, n_pts=300, obs_per_pt=4, seed=0)
    g = build.ba_graph(data, loss=HuberLoss(2.0))

    # odometry chain between consecutive cameras (noisy relative poses)
    rng = np.random.default_rng(1)
    Ti = np.arange(11, dtype=np.int32)
    Tj = Ti + 1
    T_rel = []
    for i, j in zip(Ti, Tj):
        T = data.T_gt[j] @ np.linalg.inv(data.T_gt[i])
        T[:3, 3] += rng.normal(0, 0.01, 3)
        T_rel.append(T)
    between = FactorBatch.create(
        kind="between_se3",
        slots=("poses", "poses"),
        indices=(Ti, Tj),
        data={
            "T_obs": jnp.asarray(np.stack(T_rel), jnp.float32),
            "sqrt_info": jnp.broadcast_to(
                50.0 * jnp.eye(6, dtype=jnp.float32), (11, 6, 6)
            ),
        },
        loss=L2Loss(),
    )
    slam = FactorGraph(dict(g.blocks), [g.batches[0], between])

    chi0 = float(slam.chi2())
    solved, info = solve_auto(slam, Options(method="lm", max_iters=30))
    chi2 = float(info.chi2)
    print(f"joint chi2: {chi0:.1f} -> {chi2:.1f}")

    pose_err = np.linalg.norm(
        np.asarray(solved.blocks["poses"].values)[:, :3, 3]
        - data.T_gt[:, :3, 3], axis=1,
    )
    lm_err = np.linalg.norm(
        np.asarray(solved.blocks["landmarks"].values) - data.pts_gt, axis=1
    )
    print(f"pose err: median {np.median(pose_err)*1000:.2f} mm")
    print(f"landmark err: median {np.median(lm_err)*1000:.2f} mm")


if __name__ == "__main__":
    main()
