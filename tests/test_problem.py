"""Problem-API tests (reference test_problem.py category, SURVEY.md §4):
end-to-end solves through the Ceres-style interface — curve fit, pose-graph
relaxation, constant parameters, covariance."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu import (
    CauchyLoss,
    L2Loss,
    Options,
    PoseResidual,
    PoseToPoseResidual,
    Problem,
    QuadraticResidual,
    ReprojectionResidual,
    SE2,
    SE3,
    StereoCamera,
)
from pyslam_tpu.lie import se2, se3


class TestQuadraticDemo:
    """The reference README example through the Problem API."""

    def test_curve_fit(self, rng):
        truth = np.array([1.5, -0.5, 2.0])
        problem = Problem(Options(method="gn", max_iters=10))
        for _ in range(60):
            x = rng.uniform(-2, 2)
            y = truth[0] * x * x + truth[1] * x + truth[2] + rng.normal(0, 0.02)
            problem.add_residual_block(QuadraticResidual(x, y, 50.0), ["params"])
        problem.initialize_params({"params": np.zeros(3)})
        sol = problem.solve()
        np.testing.assert_allclose(np.asarray(sol["params"]), truth, atol=0.05)
        assert problem.summary is not None


class TestPoseGraphRelaxation:
    def _make(self, rng, n=12, loss=None):
        # ground-truth ring of SE2 poses
        gt = [SE2.exp(jnp.asarray([1.0, 0.0, 2 * np.pi / n])) for _ in range(n)]
        Ts = [SE2.identity()]
        for k in range(1, n):
            Ts.append(SE2(gt[k].mat @ Ts[-1].mat))
        problem = Problem(Options(method="lm", max_iters=50))
        params = {}
        for k, T in enumerate(Ts):
            noise = jnp.asarray(rng.normal(0, 0.1, 3)) if k else jnp.zeros(3)
            params[f"T_{k}_0"] = SE2(se2.exp(noise) @ T.mat)
        # odometry measurements (exact) + one loop closure
        for k in range(1, n):
            T_obs = SE2(Ts[k].mat @ se2.inv(Ts[k - 1].mat))
            problem.add_residual_block(
                PoseToPoseResidual(T_obs, 10.0), [f"T_{k-1}_0", f"T_{k}_0"], loss
            )
        T_loop = SE2(Ts[0].mat @ se2.inv(Ts[n - 1].mat))
        problem.add_residual_block(
            PoseToPoseResidual(T_loop, 10.0), [f"T_{n-1}_0", "T_0_0"], loss
        )
        problem.initialize_params(params)
        problem.set_parameters_constant("T_0_0")
        return problem, Ts

    def test_relaxation_recovers_gt(self, rng):
        problem, Ts = self._make(rng)
        cost0 = problem.eval_cost()
        sol = problem.solve()
        assert problem.eval_cost() < cost0 * 1e-3
        for k, T_true in enumerate(Ts):
            err = se2.log(T_true.mat @ se2.inv(sol[f"T_{k}_0"].mat))
            np.testing.assert_allclose(err, 0.0, atol=1e-3)

    def test_constant_param_fixed(self, rng):
        problem, Ts = self._make(rng)
        T0_before = np.asarray(problem.param_dict["T_0_0"].mat)
        problem.solve()
        np.testing.assert_allclose(
            np.asarray(problem.param_dict["T_0_0"].mat), T0_before, atol=1e-12
        )

    def test_robust_loss_through_api(self, rng):
        problem, Ts = self._make(rng, loss=CauchyLoss(2.0))
        cost0 = problem.eval_cost()
        problem.solve()
        assert problem.eval_cost() < cost0 * 0.01

    def test_solve_one_iter(self, rng):
        problem, _ = self._make(rng)
        c0 = problem.eval_cost()
        norm = problem.solve_one_iter()
        assert norm > 0
        assert problem.eval_cost() < c0


class TestMixedParams:
    """SE3 poses + Euclidean landmarks in one problem (BA through the API)."""

    def test_two_view_triangulation(self, rng):
        cam = StereoCamera(cu=320.0, cv=240.0, fu=500.0, fv=500.0, b=0.25, w=640, h=480)
        T1 = SE3.identity()
        T2 = SE3.exp(jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.1, 0.0]))
        pts = np.stack(
            [rng.uniform(-2, 2, 20), rng.uniform(-1, 1, 20), rng.uniform(4, 9, 20)], -1
        )
        problem = Problem(Options(method="lm", max_iters=40))
        params = {"T_1": T1, "T_2": T2}
        for i, p in enumerate(pts):
            params[f"pt_{i}"] = jnp.asarray(p) + jnp.asarray(rng.normal(0, 0.2, 3))
            for name, T in (("T_1", T1), ("T_2", T2)):
                obs = cam.project(se3.act(T.mat, jnp.asarray(p)))
                problem.add_residual_block(
                    ReprojectionResidual(cam, obs, 1.0), [name, f"pt_{i}"]
                )
        problem.initialize_params(params)
        problem.set_parameters_constant(["T_1", "T_2"])
        sol = problem.solve()
        est = np.stack([np.asarray(sol[f"pt_{i}"]) for i in range(20)])
        np.testing.assert_allclose(est, pts, atol=1e-3)


class TestCovariance:
    def test_prior_covariance_is_inverse_information(self, rng):
        # single pose with a known-stiffness prior: cov = (S^T S)^-1 at optimum
        stiff = np.diag(rng.uniform(1.0, 3.0, 6))
        T_obs = SE3.exp(jnp.asarray(rng.normal(size=6) * 0.3))
        problem = Problem(Options(method="gn", max_iters=5))
        problem.add_residual_block(PoseResidual(T_obs, jnp.asarray(stiff)), ["T"])
        problem.initialize_params({"T": T_obs})
        problem.solve()
        cov = np.asarray(problem.get_covariance_block("T", "T"))
        np.testing.assert_allclose(cov, np.linalg.inv(stiff.T @ stiff), atol=1e-5)


class TestProblemFullSlam:
    def test_mixed_reprojection_and_odometry(self):
        """The reference Problem freely mixes residual types; a pose graph
        with both odometry and landmark reprojections must solve through
        the Problem API (round-2: routes via the extended Schur path)."""
        import numpy as np

        from pyslam_tpu import (
            Options,
            PoseToPoseResidual,
            Problem,
            ReprojectionResidual,
            SE3,
        )
        from pyslam_tpu.io import synth
        from pyslam_tpu.sensors import StereoCamera

        data = synth.ba_synthetic(n_cams=5, n_pts=30, obs_per_pt=3, seed=2)
        cam = StereoCamera(**data.camera)
        prob = Problem(Options(max_iters=25))
        pose_names = [f"T_{c}" for c in range(5)]
        pt_names = [f"p_{l}" for l in range(30)]
        for k in range(len(data.cam_idx)):
            prob.add_residual_block(
                ReprojectionResidual(cam, data.obs[k], 2.0),
                [pose_names[int(data.cam_idx[k])], pt_names[int(data.pt_idx[k])]],
            )
        for c in range(4):
            T_obs = data.T_gt[c + 1] @ np.linalg.inv(data.T_gt[c])
            prob.add_residual_block(
                PoseToPoseResidual(T_obs, 10.0),
                [pose_names[c], pose_names[c + 1]],
            )
        import jax.numpy as jnp

        prob.initialize_params(
            {n: SE3(jnp.asarray(T, jnp.float64)) for n, T in zip(pose_names, data.T_init)}
        )
        prob.initialize_params(
            {n: jnp.asarray(p, jnp.float64) for n, p in zip(pt_names, data.pts_init)}
        )
        prob.set_parameters_constant(pose_names[0])
        before = prob.eval_cost()
        prob.solve()
        after = prob.eval_cost()
        assert after < before * 0.1
