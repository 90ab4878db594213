"""Sliding-window VIO: preintegrated IMU factors + generic marginalization.

Composes two beyond-reference components: each incoming keyframe appends
(pose, velocity, bias) states and a preintegrated IMU factor
(pyslam_tpu/imu.py); when the window exceeds W keyframes the oldest state
triple is MARGINALIZED (graph/marginalize.py) — its information survives as
a dense FEJ prior over the remaining window, exactly the OKVIS/VIO
fixed-window estimator, assembled from the framework's public pieces rather
than a bespoke smoother.

The run asserts the windowed estimate tracks ground truth even though no
state older than W keyframes is ever kept.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp
from pyslam_tpu import imu
from pyslam_tpu.graph import FactorBatch, FactorGraph, VariableBlock, marginalize
from pyslam_tpu.io import synth
from pyslam_tpu.lie import se3
from pyslam_tpu.losses import L2Loss
from pyslam_tpu.solver import Options, solve

WINDOW = 5


def _append(block, value):
    return VariableBlock(
        block.kind,
        jnp.concatenate([block.values, jnp.asarray(value)[None]], axis=0),
        jnp.concatenate([block.const_mask, jnp.zeros(1, bool)]),
    )


def main():
    b_gyro = np.array([0.002, -0.001, 0.003])
    data = synth.imu_circle(
        n_keyframes=16,
        kf_dt=0.5,
        imu_rate=200,
        gyro_noise=1.7e-4 * np.sqrt(200),
        accel_noise=2e-3 * np.sqrt(200),
        b_gyro=b_gyro,
        seed=0,
    )
    n = data.T_gt.shape[0]
    rng = np.random.default_rng(1)
    T_meas = np.stack(
        [
            np.asarray(se3.exp(jnp.asarray(rng.normal(size=6) * 2e-3))) @ data.T_gt[i]
            for i in range(n)
        ]
    )
    Spp = jnp.asarray(np.diag([1 / 2e-3] * 6))
    dtype = jnp.float64
    z3 = np.zeros(3)

    def pose_prior(k_local, T_obs):
        return FactorBatch.create(
            "prior_se3",
            slots=("poses",),
            indices=(np.array([k_local], np.int32),),
            data={"T_obs": jnp.asarray(T_obs, dtype)[None], "sqrt_info": Spp[None]},
            loss=L2Loss(),
        )

    # ---- bootstrap with keyframe 0
    blocks = {
        "poses": VariableBlock.create("se3", jnp.asarray(T_meas[:1], dtype)),
        "vels": VariableBlock.create("euclidean", jnp.zeros((1, 3), dtype)),
        "biases": VariableBlock.create("euclidean", jnp.zeros((1, 6), dtype)),
    }
    g = FactorGraph(blocks, [pose_prior(0, T_meas[0])])
    first_in_window = 0  # absolute keyframe id of window slot 0
    errs = []

    for k in range(1, n):
        pim = imu.preintegrate(data.omega[k - 1], data.accel[k - 1], data.dts[k - 1], z3, z3)
        S = imu.sqrt_info_of(pim)
        imu_data = {
            key: jnp.asarray(np.asarray(getattr(pim, key)), dtype)[None]
            for key in ["dR", "dv", "dp", "J_Rg", "J_vg", "J_va", "J_pg", "J_pa", "b_lin", "dt"]
        }
        imu_data["sqrt_info"] = jnp.asarray(S, dtype)[None]
        imu_data["gravity"] = jnp.asarray(data.gravity, dtype)[None]

        w = g.blocks["poses"].n  # local index of the previous keyframe + 1
        blocks = dict(g.blocks)
        blocks["poses"] = _append(blocks["poses"], jnp.asarray(T_meas[k], dtype))
        blocks["vels"] = _append(blocks["vels"], blocks["vels"].values[-1])
        blocks["biases"] = _append(blocks["biases"], blocks["biases"].values[-1])
        batches = list(g.batches)
        batches.append(
            FactorBatch.create(
                "imu_preintegrated",
                slots=("poses", "poses", "vels", "vels", "biases"),
                indices=tuple(
                    np.array([i], np.int32) for i in (w - 1, w, w - 1, w, w - 1)
                ),
                data=imu_data,
                loss=L2Loss(),
            )
        )
        batches.append(
            FactorBatch.create(
                "between_euclidean",
                slots=("biases", "biases"),
                indices=(np.array([w - 1], np.int32), np.array([w], np.int32)),
                data={
                    "delta": jnp.zeros((1, 6), dtype),
                    "sqrt_info": jnp.asarray(np.eye(6) / (1e-3 * np.sqrt(0.5)), dtype)[None],
                },
                loss=L2Loss(),
            )
        )
        batches.append(pose_prior(w, T_meas[k]))
        g = FactorGraph(blocks, batches)

        g, info = solve(g, Options(method="lm", max_iters=25))

        if g.blocks["poses"].n > WINDOW:
            g = marginalize(
                g, {"poses": [0], "vels": [0], "biases": [0]}
            )
            first_in_window += 1

        # newest-pose error vs ground truth
        T_new = g.blocks["poses"].values[-1]
        err = float(
            jnp.linalg.norm(se3.log(jnp.asarray(data.T_gt[k], dtype) @ se3.inv(T_new)))
        )
        errs.append(err)
        print(
            f"kf {k:2d}: window {g.blocks['poses'].n}, chi2 {float(info.chi2):9.3f}, "
            f"newest-pose err {err:.5f}"
        )

    b_est = np.asarray(g.blocks["biases"].values).mean(0)
    print(f"gyro bias est {b_est[:3]}  true {b_gyro}")
    assert max(errs) < 1e-2, "windowed estimate drifted off ground truth"
    assert max(errs[5:]) < 5e-3, "steady-state window drifted"
    assert np.abs(b_est[:3] - b_gyro).max() < 1.5e-3


if __name__ == "__main__":
    main()
