"""Marginalization tests (graph/marginalize.py): the dense-prior Schur
transfer must preserve the solution and the covariance of the kept
variables — the defining properties of marginalization vs dropping."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.graph import FactorBatch, FactorGraph, VariableBlock, build
from pyslam_tpu.graph.marginalize import marginalize
from pyslam_tpu.io import synth
from pyslam_tpu.lie import se2, se3
from pyslam_tpu.losses import L2Loss
from pyslam_tpu.solver import Options, solve

F64 = jnp.float64


def _solved_se2(n=30, n_loops=6, seed=1):
    data = synth.se2_loop(n_poses=n, n_loops=n_loops, seed=seed)
    g = build.pose_graph(data, dtype=F64)
    g_opt, info = solve(g, Options(method="lm", max_iters=50))
    return g_opt, info


class TestSolutionPreservation:
    def test_kept_poses_stay_at_optimum_se2(self):
        g_opt, _ = _solved_se2()
        targets = [5, 6, 12]
        g2 = marginalize(g_opt, {"poses": targets})
        assert g2.blocks["poses"].n == 27
        g3, _ = solve(g2, Options(method="lm", max_iters=30))
        keep = np.setdiff1d(np.arange(30), targets)
        full = jnp.asarray(np.asarray(g_opt.blocks["poses"].values)[keep])
        red = g3.blocks["poses"].values
        err = jnp.abs(se2.log(full @ se2.inv(red)))
        assert float(jnp.max(err)) < 1e-4

    def test_kept_poses_stay_at_optimum_se3(self):
        data = synth.se3_sphere(n_poses=25, n_loops=8, seed=3)
        g = build.pose_graph(data, dtype=F64)
        g_opt, _ = solve(g, Options(method="lm", max_iters=50))
        targets = [7, 8]
        g2 = marginalize(g_opt, {"poses": targets})
        g3, _ = solve(g2, Options(method="lm", max_iters=30))
        keep = np.setdiff1d(np.arange(25), targets)
        full = jnp.asarray(np.asarray(g_opt.blocks["poses"].values)[keep])
        err = jnp.abs(se3.log(full @ se3.inv(g3.blocks["poses"].values)))
        assert float(jnp.max(err)) < 1e-4

    def test_chi2_preserved_at_linearization(self):
        # the prior reproduces the consumed subgraph's cost at the
        # linearization point (up to the truncated model constant)
        g_opt, info = _solved_se2()
        g2 = marginalize(g_opt, {"poses": [5, 6, 12]})
        np.testing.assert_allclose(float(g2.chi2()), float(info.chi2), rtol=1e-6)

    def test_odometry_chain_composition(self):
        # marginalizing the interior of a pure odometry chain must leave
        # the endpoints exactly on their dead-reckoned estimates
        data = synth.se2_loop(n_poses=10, n_loops=0, seed=2)
        g = build.pose_graph(data, dtype=F64)  # init = integrated odometry
        g2 = marginalize(g, {"poses": list(range(1, 9))})
        assert g2.blocks["poses"].n == 2
        g3, _ = solve(g2, Options(method="lm", max_iters=20))
        np.testing.assert_allclose(
            np.asarray(g3.blocks["poses"].values[1]),
            data.T_init[9],
            atol=1e-8,
        )


class TestCovariancePreservation:
    def test_covariance_matches_full_graph(self):
        from pyslam_tpu.solver.covariance import full_covariance

        g_opt, _ = _solved_se2()
        targets = [5, 6, 12]
        g2 = marginalize(g_opt, {"poses": targets})
        g3, _ = solve(g2, Options(method="lm", max_iters=30))
        keep = np.setdiff1d(np.arange(30), targets)
        C_full = np.asarray(full_covariance(g_opt))
        C_red = np.asarray(full_covariance(g3))
        kf = np.concatenate([np.arange(3 * i, 3 * i + 3) for i in keep])
        np.testing.assert_allclose(C_full[np.ix_(kf, kf)], C_red, atol=1e-6)


class TestBundleAdjustment:
    def test_cull_landmarks(self):
        data = synth.ba_synthetic(n_cams=6, n_pts=40, seed=0)
        g = build.ba_graph(data, dtype=F64)
        g_opt, _ = solve(g, Options(method="lm", max_iters=40))
        g2 = marginalize(g_opt, {"landmarks": [3, 11, 25]})
        assert g2.blocks["landmarks"].n == 37
        # blanket prior couples the observing cameras
        prior = [fb for fb in g2.batches if fb.kind.startswith("dense_prior")]
        assert len(prior) == 1 and all(s == "poses" for s in prior[0].slots)
        g3, _ = solve(g2, Options(method="lm", max_iters=30))
        err = jnp.abs(
            se3.log(g_opt.blocks["poses"].values @ se3.inv(g3.blocks["poses"].values))
        )
        assert float(jnp.max(err)) < 1e-4


class TestValidation:
    def test_constant_target_raises(self):
        g_opt, _ = _solved_se2()
        with pytest.raises(ValueError, match="constant"):
            marginalize(g_opt, {"poses": [0]})  # the gauge anchor

    def test_unknown_block_raises(self):
        g_opt, _ = _solved_se2()
        with pytest.raises(ValueError, match="unknown block"):
            marginalize(g_opt, {"nope": [0]})

    def test_underconstrained_target_raises(self):
        # target pose whose ONLY factor has a rank-deficient sqrt_info
        # (a 1-of-3-dof measurement): H_mm is rank 1 -> must raise, not
        # emit a garbage prior over the blanket
        blocks = {
            "poses": VariableBlock.create(
                "se2", jnp.broadcast_to(jnp.eye(3, dtype=F64), (2, 3, 3))
            ),
        }
        sqrt_info = jnp.zeros((1, 3, 3), F64).at[0, 0, 0].set(1.0)
        batch = FactorBatch.create(
            "between_se2",
            slots=("poses", "poses"),
            indices=(np.array([0], np.int32), np.array([1], np.int32)),
            data={"T_obs": jnp.eye(3, dtype=F64)[None], "sqrt_info": sqrt_info},
            loss=L2Loss(),
        )
        g = FactorGraph(blocks, [batch])
        with pytest.raises(ValueError, match="constrained"):
            marginalize(g, {"poses": [0]})

    def test_isolated_variable_just_dropped(self):
        # no factors touch pose 29 after removing its edges: marginalizing
        # an unconstrained-but-isolated variable simply removes it
        data = synth.se2_loop(n_poses=5, n_loops=0, seed=4)
        g = build.pose_graph(data, dtype=F64)
        g2 = marginalize(g, {"poses": [4]})  # chain end: blanket = pose 3
        assert g2.blocks["poses"].n == 4
        g3 = marginalize(g2, {"poses": [3]})
        assert g3.blocks["poses"].n == 3


class TestRepeatedMarginalization:
    def test_sequential_equals_joint(self):
        # marginalizing {5} then {6} == marginalizing {5, 6} (FEJ at the
        # same optimum): kept solutions agree
        g_opt, _ = _solved_se2()
        g_seq = marginalize(marginalize(g_opt, {"poses": [5]}), {"poses": [5]})
        # after removing 5, old index 6 is the new index 5
        g_joint = marginalize(g_opt, {"poses": [5, 6]})
        s1, _ = solve(g_seq, Options(method="lm", max_iters=30))
        s2, _ = solve(g_joint, Options(method="lm", max_iters=30))
        err = jnp.abs(
            se2.log(
                s1.blocks["poses"].values @ se2.inv(s2.blocks["poses"].values)
            )
        )
        assert float(jnp.max(err)) < 1e-5


class TestProblemMarginalize:
    def test_marginalize_parameters_api(self):
        from pyslam_tpu.lie import SE3
        from pyslam_tpu.problem import Options as POptions
        from pyslam_tpu.problem import Problem
        from pyslam_tpu.residuals import PoseResidual, PoseToPoseResidual

        rng = np.random.default_rng(3)
        T_ab = SE3.exp(jnp.asarray(rng.normal(size=6) * 0.3))
        T_bc = SE3.exp(jnp.asarray(rng.normal(size=6) * 0.3))
        prob = Problem(POptions(method="lm", max_iters=40))
        prob.add_residual_block(PoseResidual(SE3.exp(jnp.zeros(6)), 10.0), ["a"])
        prob.add_residual_block(PoseToPoseResidual(T_ab, 5.0), ["a", "b"])
        prob.add_residual_block(PoseToPoseResidual(T_bc, 5.0), ["b", "c"])
        # a direct (noisier) a-c measurement keeps c constrained after b
        # leaves AND makes b's information genuinely matter for c
        T_ac = SE3(T_bc.mat @ T_ab.mat)
        prob.add_residual_block(PoseToPoseResidual(T_ac, 2.0), ["a", "c"])
        prob.initialize_params(
            {k: SE3.exp(jnp.asarray(rng.normal(size=6) * 0.05)) for k in "abc"}
        )
        out = prob.solve()
        a0 = np.array(out["a"].mat)
        c0 = np.array(out["c"].mat)
        prob.compute_covariance()
        cov_c0 = np.asarray(prob.get_covariance_block("c", "c"))

        prob.marginalize_parameters("b")
        assert "b" not in prob.param_dict
        out2 = prob.solve()
        # the kept solution and its covariance survive the marginalization
        np.testing.assert_allclose(np.array(out2["a"].mat), a0, atol=1e-8)
        np.testing.assert_allclose(np.array(out2["c"].mat), c0, atol=1e-8)
        prob.compute_covariance()
        cov_c1 = np.asarray(prob.get_covariance_block("c", "c"))
        np.testing.assert_allclose(cov_c1, cov_c0, atol=1e-6)

        # the Problem stays extendable after marginalization
        T_cd = SE3.exp(jnp.asarray(rng.normal(size=6) * 0.2))
        prob.add_residual_block(PoseToPoseResidual(T_cd, 5.0), ["c", "d"])
        prob.initialize_params({"d": SE3.exp(jnp.zeros(6))})
        out3 = prob.solve()
        np.testing.assert_allclose(
            np.array(out3["d"].mat), np.array(T_cd.mat @ out3["c"].mat), atol=1e-6
        )


class TestReviewRegressions:
    def test_repeated_disjoint_marginalization_no_double_count(self):
        # a-b-c-d-e chain; marginalize b, then e (disjoint): the surviving
        # (a, c) prior must appear exactly ONCE (was double-counted)
        from pyslam_tpu.lie import SE3
        from pyslam_tpu.problem import Options as POptions
        from pyslam_tpu.problem import Problem
        from pyslam_tpu.residuals import (
            DensePriorResidual,
            PoseResidual,
            PoseToPoseResidual,
        )

        rng = np.random.default_rng(11)
        names = list("abcde")
        prob = Problem(POptions(method="lm", max_iters=40))
        prob.add_residual_block(PoseResidual(SE3.exp(jnp.zeros(6)), 10.0), ["a"])
        for x, y in zip(names, names[1:]):
            prob.add_residual_block(
                PoseToPoseResidual(SE3.exp(jnp.asarray(rng.normal(size=6) * 0.2)), 5.0),
                [x, y],
            )
        # extra a-c edge so c stays constrained when b leaves
        prob.add_residual_block(
            PoseToPoseResidual(SE3.exp(jnp.asarray(rng.normal(size=6) * 0.2)), 2.0),
            ["a", "c"],
        )
        prob.initialize_params({k: SE3.exp(jnp.zeros(6)) for k in names})
        prob.solve()
        prob.compute_covariance()
        cov_c0 = np.asarray(prob.get_covariance_block("c", "c"))

        prob.marginalize_parameters("b")
        n_priors_1 = sum(
            isinstance(rb[0], DensePriorResidual) for rb in prob.residual_blocks
        )
        prob.marginalize_parameters("e")
        n_priors_2 = sum(
            isinstance(rb[0], DensePriorResidual) for rb in prob.residual_blocks
        )
        assert n_priors_1 == 1 and n_priors_2 == 2  # (a,c) prior NOT duplicated
        prob.solve()
        prob.compute_covariance()
        cov_c1 = np.asarray(prob.get_covariance_block("c", "c"))
        # double-counted information would roughly HALVE the covariance;
        # the only acceptable deviation is the tiny FEJ linearization-point
        # effect (measured ~6e-4 relative)
        np.testing.assert_allclose(cov_c1, cov_c0, rtol=5e-3)

    def test_underconstrained_with_empty_blanket_raises(self):
        # marginalize BOTH endpoints of a rank-deficient factor: consumed
        # info is non-empty, blanket empty, H_mm singular -> must raise
        # (was silently discarded)
        blocks = {
            "poses": VariableBlock.create(
                "se2", jnp.broadcast_to(jnp.eye(3, dtype=F64), (2, 3, 3))
            ),
        }
        sqrt_info = jnp.zeros((1, 3, 3), F64).at[0, 0, 0].set(1.0)
        batch = FactorBatch.create(
            "between_se2",
            slots=("poses", "poses"),
            indices=(np.array([0], np.int32), np.array([1], np.int32)),
            data={"T_obs": jnp.eye(3, dtype=F64)[None], "sqrt_info": sqrt_info},
            loss=L2Loss(),
        )
        g = FactorGraph(blocks, [batch])
        with pytest.raises(ValueError, match="constrained"):
            marginalize(g, {"poses": [0, 1]})

    def test_shared_unbatched_data_survives(self):
        # BA batches carry an UNBATCHED (3, 3) sqrt_info broadcast over all
        # factors; with exactly F=3 factors a shape heuristic would have
        # sliced it. The weight-mask split must leave it untouched.
        data = synth.ba_synthetic(n_cams=2, n_pts=3, seed=1)
        g = build.ba_graph(data, dtype=F64)
        # keep only 3 observations so the factor axis length == 3
        fb = g.batches[0]
        sel = np.arange(3)
        g = FactorGraph(
            g.blocks,
            [
                FactorBatch(
                    fb.kind,
                    fb.slots,
                    tuple(jnp.asarray(np.asarray(ix)[sel]) for ix in fb.indices),
                    {
                        k: (jnp.asarray(np.asarray(v)[sel]) if k == "obs" else v)
                        for k, v in fb.data.items()
                    },
                    fb.loss,
                    jnp.asarray(np.asarray(fb.weight)[sel]),
                )
            ],
        )
        lm_id = int(np.asarray(g.batches[0].indices[1])[0])
        g2 = marginalize(g, {"landmarks": [lm_id]})
        kept = [fb2 for fb2 in g2.batches if fb2.kind == fb.kind]
        assert kept and np.asarray(kept[0].data["sqrt_info"]).shape == (3, 3)
        np.testing.assert_allclose(
            np.asarray(kept[0].data["sqrt_info"]),
            np.asarray(fb.data["sqrt_info"]),
        )
