"""IMU preintegration + preintegrated-factor tests (pyslam_tpu/imu.py):
propagation vs analytic ground truth, analytic Jacobians vs autodiff (the
load-bearing check), and visual-inertial smoothing end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu import imu as M
from pyslam_tpu.graph.core import FACTOR_KERNELS
from pyslam_tpu.io import synth
from pyslam_tpu.lie import se3
from pyslam_tpu.solver import Options, solve


def _rel_gt(d, i):
    """Analytic (dR, dv, dp) between keyframes i, i+1 of an ImuData."""
    A_i = d.T_gt[i][:3, :3]
    R_wb_i = A_i.T

    def p(k):
        return -d.T_gt[k][:3, :3].T @ d.T_gt[k][:3, 3]

    dt = float(np.sum(d.dts[i]))
    g = d.gravity
    dR = R_wb_i.T @ d.T_gt[i + 1][:3, :3].T
    dv = R_wb_i.T @ (d.v_gt[i + 1] - d.v_gt[i] - g * dt)
    dp = R_wb_i.T @ (p(i + 1) - p(i) - d.v_gt[i] * dt - 0.5 * g * dt * dt)
    return dR, dv, dp


class TestPreintegration:
    def test_matches_analytic_relative_motion(self):
        d = synth.imu_circle(n_keyframes=3, kf_dt=0.5, imu_rate=400)
        pim = M.preintegrate(
            d.omega[0], d.accel[0], d.dts[0], np.zeros(3), np.zeros(3)
        )
        dR, dv, dp = _rel_gt(d, 0)
        np.testing.assert_allclose(np.asarray(pim.dR), dR, atol=1e-12)
        # Euler discretization: O(dt) accumulation, ~2e-4 at 400 Hz / 0.5 s
        np.testing.assert_allclose(np.asarray(pim.dv), dv, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pim.dp), dp, atol=3e-4)

    def test_bias_jacobian_first_order(self):
        # preintegrating at bias b vs (preintegrate at 0) + J db must agree
        # to second order in db
        d = synth.imu_circle(n_keyframes=2, kf_dt=0.5, imu_rate=200, seed=1)
        db_g = np.array([0.01, -0.02, 0.015])
        db_a = np.array([0.05, 0.03, -0.04])
        pim0 = M.preintegrate(d.omega[0], d.accel[0], d.dts[0], np.zeros(3), np.zeros(3))
        pim1 = M.preintegrate(d.omega[0], d.accel[0], d.dts[0], db_g, db_a)
        # J == d(delta)/d(bias): delta(b=db) ~ delta(0) + J db
        dv_pred = np.asarray(pim0.dv) + np.asarray(pim0.J_vg) @ db_g + np.asarray(
            pim0.J_va
        ) @ db_a
        dp_pred = np.asarray(pim0.dp) + np.asarray(pim0.J_pg) @ db_g + np.asarray(
            pim0.J_pa
        ) @ db_a
        np.testing.assert_allclose(np.asarray(pim1.dv), dv_pred, atol=2e-4)
        np.testing.assert_allclose(np.asarray(pim1.dp), dp_pred, atol=1e-4)
        from pyslam_tpu.lie import so3

        dR_pred = np.asarray(pim0.dR) @ np.asarray(
            so3.exp(jnp.asarray(np.asarray(pim0.J_Rg) @ db_g))
        )
        np.testing.assert_allclose(np.asarray(pim1.dR), dR_pred, atol=1e-4)

    def test_covariance_psd_and_sqrt_info(self):
        d = synth.imu_circle(n_keyframes=2, kf_dt=0.5, imu_rate=200)
        pim = M.preintegrate(
            d.omega[0], d.accel[0], d.dts[0], np.zeros(3), np.zeros(3)
        )
        cov = np.asarray(pim.cov)
        assert np.linalg.eigvalsh(cov).min() > 0
        S = M.sqrt_info_of(pim)
        np.testing.assert_allclose(
            S.T @ S @ cov, np.eye(9), atol=1e-6
        )


class TestImuFactor:
    def _setup(self, rng):
        d = synth.imu_circle(n_keyframes=3, kf_dt=0.5, imu_rate=200)
        pim = M.preintegrate(
            d.omega[0], d.accel[0], d.dts[0], np.zeros(3), np.zeros(3)
        )
        data = {
            k: jnp.asarray(np.asarray(getattr(pim, k)))[None]
            for k in [
                "dR", "dv", "dp", "J_Rg", "J_vg", "J_va", "J_pg", "J_pa",
                "b_lin", "dt",
            ]
        }
        data["sqrt_info"] = jnp.asarray(M.sqrt_info_of(pim))[None]
        data["gravity"] = jnp.asarray(d.gravity)[None]
        T_i = se3.exp(jnp.asarray(rng.normal(size=6) * 0.1))[None] @ d.T_gt[0][None]
        T_j = se3.exp(jnp.asarray(rng.normal(size=6) * 0.1))[None] @ d.T_gt[1][None]
        v_i = jnp.asarray(d.v_gt[0] + rng.normal(size=3) * 0.2)[None]
        v_j = jnp.asarray(d.v_gt[1] + rng.normal(size=3) * 0.2)[None]
        b_i = jnp.asarray(rng.normal(size=(1, 6)) * 0.05)
        return d, data, [T_i, T_j, v_i, v_j, b_i]

    def test_zero_residual_at_ground_truth(self):
        d = synth.imu_circle(n_keyframes=3, kf_dt=0.5, imu_rate=400)
        pim = M.preintegrate(
            d.omega[0], d.accel[0], d.dts[0], np.zeros(3), np.zeros(3)
        )
        data = {
            k: jnp.asarray(np.asarray(getattr(pim, k)))[None]
            for k in [
                "dR", "dv", "dp", "J_Rg", "J_vg", "J_va", "J_pg", "J_pa",
                "b_lin", "dt",
            ]
        }
        data["sqrt_info"] = jnp.broadcast_to(jnp.eye(9), (1, 9, 9))
        data["gravity"] = jnp.asarray(d.gravity)[None]
        r, _ = FACTOR_KERNELS["imu_preintegrated"](
            data,
            jnp.asarray(d.T_gt[0])[None],
            jnp.asarray(d.T_gt[1])[None],
            jnp.asarray(d.v_gt[0])[None],
            jnp.asarray(d.v_gt[1])[None],
            jnp.zeros((1, 6)),
        )
        # only the preintegrator's discretization error remains (unweighted)
        assert float(jnp.abs(r).max()) < 1e-3

    def test_jacobians_vs_autodiff(self, rng):
        _, data, args = self._setup(rng)
        kern = FACTOR_KERNELS["imu_preintegrated"]
        r, jacs = kern(data, *args)

        for k, dof in [(0, 6), (1, 6), (2, 3), (3, 3), (4, 6)]:

            def f(eps):
                a = list(args)
                if k < 2:
                    a[k] = se3.exp(eps)[None] @ a[k]
                else:
                    a[k] = a[k] + eps[None]
                return kern(data, *a, False)[0]

            J_auto = jax.jacfwd(f)(jnp.zeros(dof))
            np.testing.assert_allclose(
                np.asarray(jacs[k][0]), np.asarray(J_auto[0]), atol=1e-8
            )

    def test_between_euclidean_jacobians(self, rng):
        S = jnp.asarray(np.diag(rng.uniform(0.5, 2.0, 6)))[None]
        data = {"delta": jnp.asarray(rng.normal(size=(1, 6))), "sqrt_info": S}
        x_i = jnp.asarray(rng.normal(size=(1, 6)))
        x_j = jnp.asarray(rng.normal(size=(1, 6)))
        kern = FACTOR_KERNELS["between_euclidean"]
        r, (Ji, Jj) = kern(data, x_i, x_j)

        fi = lambda e: kern(data, x_i + e[None], x_j, False)[0]
        fj = lambda e: kern(data, x_i, x_j + e[None], False)[0]
        np.testing.assert_allclose(Ji[0], jax.jacfwd(fi)(jnp.zeros(6))[0], atol=1e-10)
        np.testing.assert_allclose(Jj[0], jax.jacfwd(fj)(jnp.zeros(6))[0], atol=1e-10)


class TestVioSmoothing:
    def test_velocity_and_bias_recovery(self):
        # biased, noisy IMU + pose priors (vision stand-in): the smoother
        # must recover world velocities and the (unmodeled-at-preint-time)
        # biases through the factor's first-order bias correction
        b_g = np.array([0.002, -0.001, 0.003])
        b_a = np.array([0.05, -0.03, 0.02])
        d = synth.imu_circle(
            n_keyframes=8,
            kf_dt=0.5,
            imu_rate=200,
            gyro_noise=1.7e-4 * np.sqrt(200),
            accel_noise=2e-3 * np.sqrt(200),
            b_gyro=b_g,
            b_accel=b_a,
            seed=0,
        )
        rng = np.random.default_rng(1)
        T_prior = np.stack(
            [
                np.asarray(se3.exp(jnp.asarray(rng.normal(size=6) * 2e-3)))
                @ d.T_gt[i]
                for i in range(8)
            ]
        )
        Spp = np.diag([1 / 2e-3] * 6)
        g = M.vio_graph(
            d, T_prior, Spp, T_init=T_prior,
            v_init=np.zeros((8, 3)), b_init=np.zeros((8, 6)),
        )
        g2, info = solve(g, Options(method="lm", max_iters=60))
        assert float(info.chi2) < float(g.chi2()) * 1e-5
        v_est = np.asarray(g2.blocks["vels"].values)
        assert np.abs(v_est - d.v_gt).max() < 0.05  # |v| = 2 m/s
        b_est = np.asarray(g2.blocks["biases"].values).mean(0)
        # observability over 3.5 s bounds accuracy; measured ~20%
        np.testing.assert_allclose(b_est[:3], b_g, atol=1.5e-3)
        np.testing.assert_allclose(b_est[3:], b_a, atol=0.02)

    def test_imu_only_dead_reckoning(self):
        # no pose priors except the first: IMU-only propagation through the
        # solver must match direct preintegration chaining (weak test of
        # graph consistency rather than observability)
        d = synth.imu_circle(n_keyframes=4, kf_dt=0.25, imu_rate=400)
        Spp = np.diag([1 / 1e-6] * 6)
        T_prior = d.T_gt.copy()
        g = M.vio_graph(
            d, T_prior[:1], Spp, T_init=d.T_gt, v_init=d.v_gt,
            prior_indices=[0],
        )
        g2, info = solve(g, Options(method="lm", max_iters=40))
        err = jnp.abs(
            se3.log(g2.blocks["poses"].values @ se3.inv(jnp.asarray(d.T_gt)))
        )
        assert float(jnp.max(err)) < 5e-3


class TestImuObjectApi:
    def test_problem_api_vio(self):
        # two keyframes through the Ceres-style Problem API with the
        # ImuResidual wrapper: velocities recovered from poses + IMU
        from pyslam_tpu.problem import Options as POptions
        from pyslam_tpu.problem import Problem
        from pyslam_tpu.residuals import ImuResidual, PoseResidual
        from pyslam_tpu.lie import SE3

        d = synth.imu_circle(n_keyframes=2, kf_dt=0.5, imu_rate=200)
        pim = M.preintegrate(
            d.omega[0], d.accel[0], d.dts[0], np.zeros(3), np.zeros(3)
        )
        prob = Problem(POptions(method="lm", max_iters=40))
        prob.add_residual_block(
            ImuResidual(pim, gravity=d.gravity), ["T0", "T1", "v0", "v1", "b0"]
        )
        S = np.diag([1e4] * 6)
        prob.add_residual_block(PoseResidual(SE3(d.T_gt[0]), S), ["T0"])
        prob.add_residual_block(PoseResidual(SE3(d.T_gt[1]), S), ["T1"])
        from pyslam_tpu.residuals import _ResidualBase  # noqa: F401

        prob.initialize_params(
            {
                "T0": SE3(d.T_gt[0]),
                "T1": SE3(d.T_gt[1]),
                "v0": np.zeros(3),
                "v1": np.zeros(3),
                "b0": np.zeros(6),
            }
        )
        prob.set_parameters_constant(["b0"])
        out = prob.solve()
        np.testing.assert_allclose(np.asarray(out["v0"]), d.v_gt[0], atol=5e-3)
        np.testing.assert_allclose(np.asarray(out["v1"]), d.v_gt[1], atol=5e-3)
