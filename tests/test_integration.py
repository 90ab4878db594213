"""End-to-end integration: RANSAC VO frontend + loop closure + pose-graph
backend + metrics, on a scaled-down version of examples/stereo_slam.py."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


class TestStereoSlamPipeline:
    def test_loop_closure_improves_ate(self):
        from stereo_slam import main

        ate_odo, ate_opt, ate_joint = main(n_frames=24, seed=1)
        assert np.isfinite(ate_odo) and np.isfinite(ate_opt)
        assert ate_opt < ate_odo, (
            f"pose-graph optimization must improve ATE ({ate_opt} vs {ate_odo})"
        )
        # stage 3: joint full SLAM (reprojections + odometry in one graph)
        assert np.isfinite(ate_joint)
        assert ate_joint < ate_opt, (
            f"joint SLAM must improve on the pose graph ({ate_joint} vs {ate_opt})"
        )
