"""Residual-library tests (reference test_residuals.py category, SURVEY.md
§4): every analytic Jacobian against jax autodiff of the residual w.r.t. the
left perturbation — the load-bearing correctness check of the whole solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.lie import SE2, SE3, se2, se3
from pyslam_tpu.residuals import (
    PoseResidual,
    PoseToPoseResidual,
    QuadraticResidual,
    ReprojectionMotionOnlyBatchResidual,
    ReprojectionResidual,
)
from pyslam_tpu.sensors import StereoCamera

CAM = StereoCamera(cu=320.0, cv=240.0, fu=500.0, fv=480.0, b=0.25, w=640, h=480)
ATOL = 1e-5  # f32-grade trig on this backend (see conftest / SKILL notes)


def check_jac(analytic, numeric):
    np.testing.assert_allclose(analytic, numeric, atol=ATOL, rtol=1e-5)


class TestPoseResidual:
    @pytest.mark.parametrize("group,ops,dof", [(SE3, se3, 6), (SE2, se2, 3)])
    def test_jacobian_vs_autodiff(self, rng, group, ops, dof):
        T_obs = group.exp(jnp.asarray(rng.normal(size=dof)))
        T = group.exp(jnp.asarray(rng.normal(size=dof)))
        stiffness = jnp.asarray(np.diag(rng.uniform(0.5, 2.0, dof)))
        res = PoseResidual(T_obs, stiffness)
        r, (J,) = res.evaluate([T], compute_jacobians=[True])

        def f(eps):
            return res.evaluate([group(ops.exp(eps) @ T.mat)])

        check_jac(J, jax.jacfwd(f)(jnp.zeros(dof)))

    def test_zero_at_observation(self, rng):
        T_obs = SE3.exp(jnp.asarray(rng.normal(size=6)))
        r = PoseResidual(T_obs, 1.0).evaluate([T_obs])
        np.testing.assert_allclose(r, 0.0, atol=1e-6)


class TestPoseToPoseResidual:
    @pytest.mark.parametrize("group,ops,dof", [(SE3, se3, 6), (SE2, se2, 3)])
    def test_jacobians_vs_autodiff(self, rng, group, ops, dof):
        T1 = group.exp(jnp.asarray(rng.normal(size=dof)))
        T2 = group.exp(jnp.asarray(rng.normal(size=dof)))
        T_obs = group.exp(jnp.asarray(rng.normal(size=dof) * 0.1))
        res = PoseToPoseResidual(T_obs, jnp.asarray(np.diag(rng.uniform(0.5, 2, dof))))
        r, (J1, J2) = res.evaluate([T1, T2], compute_jacobians=[True, True])

        f1 = lambda e: res.evaluate([group(ops.exp(e) @ T1.mat), T2])
        f2 = lambda e: res.evaluate([T1, group(ops.exp(e) @ T2.mat)])
        check_jac(J1, jax.jacfwd(f1)(jnp.zeros(dof)))
        check_jac(J2, jax.jacfwd(f2)(jnp.zeros(dof)))

    def test_zero_at_consistent_poses(self, rng):
        T1 = SE3.exp(jnp.asarray(rng.normal(size=6)))
        T2 = SE3.exp(jnp.asarray(rng.normal(size=6)))
        T_obs = SE3(T2.mat @ se3.inv(T1.mat))
        r = PoseToPoseResidual(T_obs, 1.0).evaluate([T1, T2])
        np.testing.assert_allclose(r, 0.0, atol=1e-6)


class TestReprojectionResidual:
    def test_jacobians_vs_autodiff(self, rng):
        T = SE3.exp(jnp.asarray(rng.normal(size=6) * 0.3))
        pt_w = jnp.asarray([0.5, -0.3, 4.0])
        obs = CAM.project(se3.act(T.mat, pt_w)) + 0.5
        res = ReprojectionResidual(CAM, obs, 2.0)
        r, (J_T, J_p) = res.evaluate([T, pt_w], compute_jacobians=[True, True])

        fT = lambda e: res.evaluate([SE3(se3.exp(e) @ T.mat), pt_w])
        fp = lambda dp: res.evaluate([T, pt_w + dp])
        check_jac(J_T, jax.jacfwd(fT)(jnp.zeros(6)))
        check_jac(J_p, jax.jacfwd(fp)(jnp.zeros(3)))

    def test_selective_jacobians(self, rng):
        T = SE3.exp(jnp.asarray(rng.normal(size=6) * 0.3))
        pt_w = jnp.asarray([0.5, -0.3, 4.0])
        res = ReprojectionResidual(CAM, jnp.asarray([300.0, 250.0, 30.0]), 1.0)
        r, jacs = res.evaluate([T, pt_w], compute_jacobians=[False, True])
        assert jacs[0] is None and jacs[1] is not None


class TestMotionOnlyBatch:
    def test_jacobian_vs_autodiff(self, rng):
        T = SE3.exp(jnp.asarray(rng.normal(size=6) * 0.2))
        pts = jnp.asarray(
            np.stack([rng.uniform(-2, 2, 5), rng.uniform(-1, 1, 5), rng.uniform(2, 8, 5)], -1)
        )
        obs = CAM.project(se3.act(T.mat, pts)) + jnp.asarray(rng.normal(0, 0.5, (5, 3)))
        res = ReprojectionMotionOnlyBatchResidual(CAM, obs, pts, 1.5)
        r, (J,) = res.evaluate([T], compute_jacobians=[True])
        assert r.shape == (15,) and J.shape == (15, 6)

        f = lambda e: res.evaluate([SE3(se3.exp(e) @ T.mat)])
        check_jac(J, jax.jacfwd(f)(jnp.zeros(6)))


class TestQuadratic:
    def test_evaluate_and_jacobian(self):
        res = QuadraticResidual(2.0, 9.0, 3.0)
        p = jnp.asarray([1.0, 2.0, 1.0])  # 4 + 4 + 1 = 9 -> r = 0
        r, (J,) = res.evaluate([p], compute_jacobians=[True])
        np.testing.assert_allclose(r, 0.0, atol=1e-12)
        np.testing.assert_allclose(J, [[3.0 * 4.0, 3.0 * 2.0, 3.0]], atol=1e-12)
