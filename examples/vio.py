"""Visual-inertial smoothing demo: preintegrated IMU factors + pose priors.

A circular trajectory at 2 m/s with a biased, noisy 200 Hz IMU. The
smoother is given vision-grade pose priors (2 mm / 2 mrad), integrates each
keyframe interval into ONE preintegrated factor (pyslam_tpu/imu.py, Forster
on-manifold per PAPERS.md arXiv 1512.02363), and jointly recovers poses,
world-frame velocities and the IMU biases it was never told about.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp
from pyslam_tpu import imu
from pyslam_tpu.io import synth
from pyslam_tpu.lie import se3
from pyslam_tpu.solver import Options, solve


def main():
    b_gyro = np.array([0.002, -0.001, 0.003])
    b_accel = np.array([0.05, -0.03, 0.02])
    data = synth.imu_circle(
        n_keyframes=12,
        kf_dt=0.5,
        imu_rate=200,
        gyro_noise=1.7e-4 * np.sqrt(200),
        accel_noise=2e-3 * np.sqrt(200),
        b_gyro=b_gyro,
        b_accel=b_accel,
        seed=0,
    )
    n = data.T_gt.shape[0]
    rng = np.random.default_rng(1)
    T_prior = np.stack(
        [
            np.asarray(se3.exp(jnp.asarray(rng.normal(size=6) * 2e-3))) @ data.T_gt[i]
            for i in range(n)
        ]
    )
    g = imu.vio_graph(
        data,
        T_prior,
        np.diag([1 / 2e-3] * 6),
        T_init=T_prior,
        v_init=np.zeros((n, 3)),
        b_init=np.zeros((n, 6)),
    )
    print(f"chi2 init {float(g.chi2()):.3e}")
    solved, info = solve(g, Options(method="lm", max_iters=60))
    print(f"chi2 {float(info.chi2):.3f} after {int(info.iterations)} LM iterations")

    v_est = np.asarray(solved.blocks["vels"].values)
    b_est = np.asarray(solved.blocks["biases"].values).mean(0)
    print(f"velocity error   {np.abs(v_est - data.v_gt).max():.4f} m/s (|v| = 2)")
    print(f"gyro bias  est {b_est[:3]}  true {b_gyro}")
    print(f"accel bias est {b_est[3:]}  true {b_accel}")
    assert np.abs(v_est - data.v_gt).max() < 0.05
    assert np.abs(b_est[:3] - b_gyro).max() < 1.5e-3


if __name__ == "__main__":
    main()
