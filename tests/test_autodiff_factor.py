"""register_autodiff_factor: the Ceres AutoDiffCostFunction ergonomic —
autodiff kernels must be interchangeable with analytic ones in every path."""

import jax.numpy as jnp
import numpy as np

from pyslam_tpu.graph import (
    FactorBatch,
    FactorGraph,
    VariableBlock,
    build,
    register_autodiff_factor,
)
from pyslam_tpu.graph.core import FACTOR_KERNELS
from pyslam_tpu.io import synth
from pyslam_tpu.lie import se3, sim3
from pyslam_tpu.losses import L2Loss
from pyslam_tpu.solver import Options, solve

F64 = jnp.float64


def _bmv(A, v):
    return jnp.einsum("...ij,...j->...i", A, v)


class TestMatchesAnalytic:
    def test_between_se3_clone(self, rng):
        # an autodiff re-registration of the between residual must produce
        # the exact analytic kernel outputs
        def residual(data, T1, T2):
            r_local = se3.log(T2 @ se3.inv(T1) @ se3.inv(data["T_obs"]))
            return _bmv(data["sqrt_info"], r_local)

        register_autodiff_factor("between_se3_ad", residual, ("se3", "se3"))
        T1 = se3.exp(jnp.asarray(rng.normal(size=(5, 6)) * 0.4))
        T2 = se3.exp(jnp.asarray(rng.normal(size=(5, 6)) * 0.4))
        data = {
            "T_obs": se3.exp(jnp.asarray(rng.normal(size=(5, 6)) * 0.2)),
            "sqrt_info": jnp.broadcast_to(jnp.eye(6), (5, 6, 6)),
        }
        r_a, jacs_a = FACTOR_KERNELS["between_se3"](data, T1, T2)
        r_d, jacs_d = FACTOR_KERNELS["between_se3_ad"](data, T1, T2)
        np.testing.assert_allclose(r_d, r_a, atol=1e-12)
        for Ja, Jd in zip(jacs_a, jacs_d):
            np.testing.assert_allclose(Jd, Ja, atol=1e-9)

    def test_sim3_prior_clone(self, rng):
        def residual(data, S):
            return _bmv(data["sqrt_info"], sim3.log(S @ sim3.inv(data["T_obs"])))

        register_autodiff_factor("prior_sim3_ad", residual, ("sim3",))
        S = sim3.exp(jnp.asarray(rng.normal(size=(4, 7)) * 0.4))
        data = {
            "T_obs": sim3.exp(jnp.asarray(rng.normal(size=(4, 7)) * 0.3)),
            "sqrt_info": jnp.broadcast_to(jnp.eye(7), (4, 7, 7)),
        }
        r_a, (Ja,) = FACTOR_KERNELS["prior_sim3"](data, S)
        r_d, (Jd,) = FACTOR_KERNELS["prior_sim3_ad"](data, S)
        np.testing.assert_allclose(r_d, r_a, atol=1e-12)
        np.testing.assert_allclose(Jd, Ja, atol=1e-9)


class TestCustomFactor:
    def test_range_factor_end_to_end(self, rng):
        # a factor type the library does not ship: range-only measurements
        # pose -> beacon, written as a plain residual, solved to the optimum
        def range_residual(data, T, beacon):
            # anchor point = the pose's translation column (distinct for
            # the sphere trajectory; -R^T t would collapse to one point
            # because the generator's z-axis is radial)
            anchor = T[..., :3, 3]
            d = jnp.linalg.norm(beacon - anchor, axis=-1, keepdims=True)
            return data["w"][:, None] * (d - data["d_obs"][:, None])

        register_autodiff_factor("range3d", range_residual, ("se3", "euclidean"))

        # 6 known poses observe 4 beacons with exact ranges: pure
        # multilateration through the autodiff kernel (poses frozen so the
        # test isolates the custom factor, chi2 must reach 0)
        data = synth.se3_sphere(n_poses=6, n_loops=3, seed=2)
        T_gt = jnp.asarray(data.T_gt, F64)
        centers = T_gt[:, :3, 3]
        beacons_gt = jnp.asarray(np.random.default_rng(3).normal(0, 5, (4, 3)))
        pi, bi = np.meshgrid(np.arange(6), np.arange(4))
        pi, bi = pi.ravel(), bi.ravel()
        d_obs = jnp.linalg.norm(beacons_gt[bi] - centers[pi], axis=-1)

        blocks = {
            "poses": VariableBlock.create("se3", T_gt, np.ones(6, bool)),
            "beacons": VariableBlock.create("euclidean", beacons_gt + 0.5),
        }
        batch = FactorBatch.create(
            "range3d",
            slots=("poses", "beacons"),
            indices=(pi.astype(np.int32), bi.astype(np.int32)),
            data={"d_obs": d_obs, "w": jnp.full(len(pi), 10.0, F64)},
            loss=L2Loss(),
        )
        g = FactorGraph(blocks, [batch])
        g2, info = solve(
            g, Options(method="lm", max_iters=200, min_cost_decrease=0.999999)
        )
        assert float(info.chi2) < 1e-12
        err = np.asarray(g2.blocks["beacons"].values) - np.asarray(beacons_gt)
        assert float(np.abs(err).max()) < 1e-6


class TestRowIndependenceCheck:
    def test_accepts_proper_factor(self, rng):
        from pyslam_tpu.graph import check_autodiff_factor

        T1 = se3.exp(jnp.asarray(rng.normal(size=(5, 6)) * 0.4))
        T2 = se3.exp(jnp.asarray(rng.normal(size=(5, 6)) * 0.4))
        data = {
            "T_obs": se3.exp(jnp.asarray(rng.normal(size=(5, 6)) * 0.2)),
            "sqrt_info": jnp.broadcast_to(jnp.eye(6), (5, 6, 6)),
        }
        check_autodiff_factor("between_se3_ad", data, T1, T2)

    def test_rejects_row_coupled_residual(self, rng):
        import pytest

        from pyslam_tpu.graph import check_autodiff_factor, register_autodiff_factor

        def coupled(data, x):
            r = x - data["obs"]
            return r / jnp.std(r)  # batch statistic couples the rows

        register_autodiff_factor("coupled_demo", coupled, ("euclidean",))
        x = jnp.asarray(rng.normal(size=(6, 3)))
        data = {"obs": jnp.asarray(rng.normal(size=(6, 3)))}
        with pytest.raises(ValueError, match="coupled"):
            check_autodiff_factor("coupled_demo", data, x)
