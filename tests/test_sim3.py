"""Sim(3) tests: group math vs autodiff, factor-kernel Jacobians, and
scale-drift-aware pose-graph optimization end-to-end (beyond-reference —
the reference's liegroups dependency stops at SE(3); lie/sim3.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.graph import build
from pyslam_tpu.graph.core import FACTOR_KERNELS
from pyslam_tpu.io import synth
from pyslam_tpu.lie import Sim3, sim3
from pyslam_tpu.residuals import PoseResidual, PoseToPoseResidual
from pyslam_tpu.solver import Options, solve


def random_xi(rng, scale=0.8, batch=()):
    """Random Sim(3) tangents with |phi| kept inside the injectivity radius."""
    xi = rng.normal(size=batch + (7,)) * scale
    phi = xi[..., 3:6]
    n = np.linalg.norm(phi, axis=-1, keepdims=True)
    xi[..., 3:6] = phi / np.maximum(n, 1e-12) * np.minimum(n, np.pi - 0.05)
    return jnp.asarray(xi)


class TestSim3Group:
    def test_exp_log_roundtrip(self, rng):
        xi = random_xi(rng, 1.5, (64,))
        np.testing.assert_allclose(sim3.log(sim3.exp(xi)), xi, atol=1e-9)

    def test_exp_log_small(self, rng):
        for scale in [1e-8, 1e-5, 1e-2]:
            xi = random_xi(rng, scale, (16,))
            np.testing.assert_allclose(sim3.log(sim3.exp(xi)), xi, atol=1e-12)

    def test_exp_log_branch_boundaries(self, rng):
        # exercise each (sigma small?) x (theta small?) region explicitly
        for sig, th in [(1e-5, 1e-5), (1e-5, 1.0), (0.8, 1e-5), (0.8, 1.0)]:
            xi = np.array(random_xi(rng, 1.0, (8,)))
            phi = xi[:, 3:6]
            n = np.linalg.norm(phi, axis=-1, keepdims=True)
            xi[:, 3:6] = phi / np.maximum(n, 1e-12) * th
            xi[:, 6] = sig
            xi = jnp.asarray(xi)
            np.testing.assert_allclose(sim3.log(sim3.exp(xi)), xi, atol=1e-10)

    def test_scale_extraction(self, rng):
        xi = random_xi(rng, 1.0, (8,))
        xi = xi.at[:, 6].set(jnp.linspace(-2.0, 2.0, 8))
        S = sim3.exp(xi)
        np.testing.assert_allclose(sim3.scale(S), jnp.exp(xi[:, 6]), atol=1e-12)
        R = sim3.rot(S)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)

    def test_inv(self, rng):
        S = sim3.exp(random_xi(rng, 1.2, (32,)))
        eye = jnp.broadcast_to(jnp.eye(4), S.shape)
        np.testing.assert_allclose(S @ sim3.inv(S), eye, atol=1e-12)

    def test_adjoint_identity(self, rng):
        # Ad(S) xi == vee(S wedge(xi) S^-1)
        S = sim3.exp(random_xi(rng, 1.0, (16,)))
        xi = random_xi(rng, 0.7, (16,))
        lhs = jnp.einsum("...ij,...j->...i", sim3.adjoint(S), xi)
        rhs = sim3.vee(S @ sim3.wedge(xi) @ sim3.inv(S))
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)

    def test_wedge_vee(self, rng):
        xi = random_xi(rng, 1.0, (8,))
        np.testing.assert_allclose(sim3.vee(sim3.wedge(xi)), xi, atol=1e-12)

    def test_left_jacobian_vs_autodiff(self, rng):
        xi = random_xi(rng, 0.9)

        def f(dxi):
            return sim3.log(sim3.exp(xi + dxi) @ sim3.inv(sim3.exp(xi)))

        J_auto = jax.jacfwd(f)(jnp.zeros(7))
        np.testing.assert_allclose(sim3.left_jacobian(xi), J_auto, atol=1e-9)

    def test_inv_left_jacobian(self, rng):
        xi = random_xi(rng, 1.2, (16,))
        J = sim3.left_jacobian(xi)
        Jinv = sim3.inv_left_jacobian(xi)
        eye = jnp.broadcast_to(jnp.eye(7), J.shape)
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-10)

    def test_inv_left_jacobian_vs_autodiff(self, rng):
        # d/deps log(exp(eps) S) at 0 == J_l^-1(log S)
        xi = random_xi(rng, 0.9)
        S = sim3.exp(xi)

        def g(eps):
            return sim3.log(sim3.exp(eps) @ S)

        Ji_auto = jax.jacfwd(g)(jnp.zeros(7))
        np.testing.assert_allclose(sim3.inv_left_jacobian(xi), Ji_auto, atol=1e-9)

    def test_act(self, rng):
        xi = random_xi(rng, 1.0, (8,))
        S = sim3.exp(xi)
        p = jnp.asarray(rng.normal(size=(8, 3)))
        ph = jnp.concatenate([p, jnp.ones((8, 1))], axis=-1)
        np.testing.assert_allclose(
            sim3.act(S, p), jnp.einsum("...ij,...j->...i", S, ph)[..., :3], atol=1e-12
        )

    def test_se3_embed(self, rng):
        from pyslam_tpu.lie import se3

        T = se3.exp(jnp.asarray(rng.normal(size=(8, 6)) * 0.5))
        S = sim3.from_se3(T, jnp.full((8,), 1.7))
        np.testing.assert_allclose(sim3.scale(S), 1.7, atol=1e-12)
        np.testing.assert_allclose(sim3.to_se3(S), T, atol=1e-12)

    def test_normalize(self, rng):
        xi = random_xi(rng, 1.0)
        S = sim3.exp(xi)
        S_drift = S.at[:3, :3].multiply(1.0 + 1e-4)  # uniform drift = scale-like
        S_skew = S_drift.at[0, 1].add(1e-5)
        Sn = sim3.normalize(S_skew)
        R = sim3.rot(Sn)
        np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-10)
        np.testing.assert_allclose(Sn[:3, 3], S[:3, 3], atol=1e-12)

    def test_wrapper_class(self, rng):
        xi = random_xi(rng, 0.8)
        S = Sim3.exp(xi)
        np.testing.assert_allclose(S.log(), xi, atol=1e-9)
        np.testing.assert_allclose(float(S.scale), float(jnp.exp(xi[6])), atol=1e-12)
        np.testing.assert_allclose(
            S.dot(S.inv()).mat, jnp.eye(4), atol=1e-12
        )


class TestSim3Kernels:
    def test_prior_jacobian_vs_autodiff(self, rng):
        S_obs = sim3.exp(random_xi(rng, 0.8, (4,)))
        S = sim3.exp(random_xi(rng, 0.8, (4,)))
        sqrt_info = jnp.asarray(
            np.stack([np.diag(rng.uniform(0.5, 2.0, 7)) for _ in range(4)])
        )
        data = {"T_obs": S_obs, "sqrt_info": sqrt_info}
        r, (J,) = FACTOR_KERNELS["prior_sim3"](data, S)

        def f(eps):
            r2, _ = FACTOR_KERNELS["prior_sim3"](data, sim3.exp(eps)[None] @ S, False)
            return r2

        J_auto = jax.jacfwd(f)(jnp.zeros(7))
        np.testing.assert_allclose(J, J_auto, atol=1e-8)

    def test_between_jacobians_vs_autodiff(self, rng):
        S1 = sim3.exp(random_xi(rng, 0.8, (4,)))
        S2 = sim3.exp(random_xi(rng, 0.8, (4,)))
        S_obs = sim3.exp(random_xi(rng, 0.3, (4,)))
        sqrt_info = jnp.asarray(
            np.stack([np.diag(rng.uniform(0.5, 2.0, 7)) for _ in range(4)])
        )
        data = {"T_obs": S_obs, "sqrt_info": sqrt_info}
        r, (J1, J2) = FACTOR_KERNELS["between_sim3"](data, S1, S2)

        def f1(eps):
            r2, _ = FACTOR_KERNELS["between_sim3"](
                data, sim3.exp(eps)[None] @ S1, S2, False
            )
            return r2

        def f2(eps):
            r2, _ = FACTOR_KERNELS["between_sim3"](
                data, S1, sim3.exp(eps)[None] @ S2, False
            )
            return r2

        J1_auto = jax.jacfwd(f1)(jnp.zeros(7))
        J2_auto = jax.jacfwd(f2)(jnp.zeros(7))
        np.testing.assert_allclose(J1, J1_auto, atol=1e-8)
        np.testing.assert_allclose(J2, J2_auto, atol=1e-8)

    def test_zero_at_consistent(self, rng):
        S1 = sim3.exp(random_xi(rng, 0.8, (4,)))
        S2 = sim3.exp(random_xi(rng, 0.8, (4,)))
        data = {
            "T_obs": S2 @ sim3.inv(S1),
            "sqrt_info": jnp.broadcast_to(jnp.eye(7), (4, 7, 7)),
        }
        r, _ = FACTOR_KERNELS["between_sim3"](data, S1, S2, False)
        np.testing.assert_allclose(r, 0.0, atol=1e-9)

    def test_object_api(self, rng):
        # PoseResidual / PoseToPoseResidual dispatch on the Sim3 wrapper type
        S_obs = Sim3.exp(random_xi(rng, 0.7))
        res = PoseResidual(S_obs, 2.0)
        assert res.factor_kind == "prior_sim3"
        np.testing.assert_allclose(res.evaluate([S_obs]), 0.0, atol=1e-9)
        res2 = PoseToPoseResidual(S_obs, 1.0)
        assert res2.factor_kind == "between_sim3"
        S1 = Sim3.exp(random_xi(rng, 0.7))
        S2 = Sim3(S_obs.mat @ S1.mat)
        np.testing.assert_allclose(res2.evaluate([S1, S2]), 0.0, atol=1e-8)


class TestSim3Problem:
    def test_problem_api_end_to_end(self, rng):
        # Sim3 params must route through the sim3 manifold (a regression:
        # Problem once fell through to 16-dof euclidean on Sim3 wrappers)
        from pyslam_tpu.problem import Options as POptions
        from pyslam_tpu.problem import Problem

        S_prior = Sim3.exp(jnp.zeros(7))
        S_rel = Sim3.exp(jnp.asarray(rng.normal(size=7) * 0.2))
        prob = Problem(POptions(method="lm", max_iters=50))
        prob.add_residual_block(PoseResidual(S_prior, 10.0), ["a"])
        prob.add_residual_block(PoseToPoseResidual(S_rel, 5.0), ["a", "b"])
        prob.initialize_params(
            {
                "a": Sim3.exp(jnp.asarray(rng.normal(size=7) * 0.1)),
                "b": Sim3.exp(jnp.asarray(rng.normal(size=7) * 0.1)),
            }
        )
        out = prob.solve()
        assert isinstance(out["b"], Sim3)
        assert float(prob.eval_cost()) < 1e-16
        np.testing.assert_allclose(out["a"].mat, jnp.eye(4), atol=1e-9)
        np.testing.assert_allclose(out["b"].mat, S_rel.mat, atol=1e-9)


class TestSim3PoseGraph:
    def test_recovers_consistent_graph(self, rng):
        # exactly-consistent measurements + perturbed init -> exact recovery
        data = synth.sim3_loop(n_poses=40, n_loops=4, gt_scale_std=0.3, seed=3)
        data.T_meas = np.stack(
            [
                data.T_gt[j] @ synth._sim3_inv(data.T_gt[i])
                for i, j in zip(data.edges_i, data.edges_j)
            ]
        )
        perturb = np.array(random_xi(np.random.default_rng(7), 0.05, (40,)))
        perturb[0] = 0.0  # keep the anchor at ground truth
        data.T_init = np.asarray(sim3.exp(jnp.asarray(perturb))) @ data.T_gt
        g = build.sim3_pose_graph(data, dtype=jnp.float64)
        g2, info = solve(g, Options(method="lm", max_iters=30))
        assert float(info.chi2) < 1e-12
        err = sim3.log(jnp.asarray(data.T_gt) @ sim3.inv(g2.blocks["poses"].values))
        assert float(jnp.max(jnp.abs(err))) < 1e-6

    def test_scale_drift_correction(self, rng):
        # monocular drift: 0.01 log-scale per edge; 119 edges -> the
        # integrated init is ~3.3x off in scale at the loop end
        data = synth.sim3_loop(
            n_poses=120, n_loops=6, scale_drift=0.01, odo_scale_std=0.005, seed=0
        )
        scales_init = np.asarray(sim3.scale(jnp.asarray(data.T_init)))
        assert scales_init.max() > 2.0  # drift really accumulated
        g = build.sim3_pose_graph(data, dtype=jnp.float64)
        chi2_0 = float(g.chi2())
        chi2_gt = float(build.sim3_pose_graph(data, dtype=jnp.float64, init="gt").chi2())
        g2, info = solve(g, Options(method="lm", max_iters=50))
        # the optimum is at least as good as ground truth (which only pays
        # the measurement noise), and vastly better than the drifted init
        assert float(info.chi2) < chi2_gt * 1.2 and chi2_gt < chi2_0 * 0.01
        scales = np.asarray(sim3.scale(g2.blocks["poses"].values))
        # loop closures pull the accumulated scale drift back toward 1
        assert scales.max() < 1.6
        # trajectory ATE improves by an order of magnitude
        t_est = np.asarray(g2.blocks["poses"].values)[:, :3, 3]
        ate_init = np.linalg.norm(data.T_init[:, :3, 3] - data.T_gt[:, :3, 3], axis=-1)
        ate_opt = np.linalg.norm(t_est - data.T_gt[:, :3, 3], axis=-1)
        assert ate_opt.mean() < ate_init.mean() / 5.0

    def test_ell_path_matches_dense(self, rng):
        # the block-sparse ELL PCG path is dof-generic: 7-dof Sim(3)
        # blocks go through build_ell_direct/solve_ell unchanged
        from pyslam_tpu.solver.bcsr import build_ell_direct, solve_ell

        data = synth.sim3_loop(n_poses=80, n_loops=6, scale_drift=0.005, seed=2)
        g = build.sim3_pose_graph(data, dtype=jnp.float64)
        _, i_d = solve(g, Options(method="lm", max_iters=40))
        _, i_e = solve_ell(
            g, Options(method="lm", max_iters=40), plan=build_ell_direct(g)
        )
        np.testing.assert_allclose(float(i_e.chi2), float(i_d.chi2), rtol=1e-3)

    def test_route_auto_large_sim3(self, rng):
        from pyslam_tpu.solver import route_auto

        data = synth.sim3_loop(n_poses=2500, n_loops=40, scale_drift=0.002, seed=1)
        g = build.sim3_pose_graph(data, dtype=jnp.float32)
        assert route_auto(g) == "ell"

    def test_gauge_anchoring(self, rng):
        data = synth.sim3_loop(n_poses=30, n_loops=2, seed=1)
        g = build.sim3_pose_graph(data, dtype=jnp.float64)
        g2, _ = solve(g, Options(method="lm", max_iters=20))
        np.testing.assert_allclose(
            np.asarray(g2.blocks["poses"].values[0]), data.T_init[0], atol=1e-12
        )


class TestSim3ScipyParity:
    def test_chi2_matches_independent_scipy_solver(self):
        # the independent scipy GN harness (logm/expm + finite differences
        # + spsolve; shares no code with the framework) must converge to
        # the same chi2 on a sim3 graph — SURVEY.md §4.3 extended to Sim(3)
        import scipy_ref

        data = synth.sim3_loop(
            n_poses=25, n_loops=3, scale_drift=0.01, odo_scale_std=0.005, seed=4
        )
        g = build.sim3_pose_graph(data, dtype=jnp.float64)
        g2, info = solve(g, Options(method="lm", max_iters=50))
        _, chi2_ref, _ = scipy_ref.solve_pose_graph(data, max_iters=60)
        np.testing.assert_allclose(float(info.chi2), chi2_ref, rtol=1e-5)


class TestSim3Covariance:
    def test_marginals_vs_dense_inverse(self):
        from pyslam_tpu.solver.covariance import full_covariance, marginal_covariances

        data = synth.sim3_loop(n_poses=15, n_loops=2, seed=6)
        g = build.sim3_pose_graph(data, dtype=jnp.float64)
        g2, _ = solve(g, Options(method="lm", max_iters=30))
        C = np.asarray(full_covariance(g2))
        margs = np.asarray(marginal_covariances(g2, pcg_rtol=1e-10))
        for i in range(1, 15):  # pose 0 anchored
            np.testing.assert_allclose(
                margs[i], C[7 * i : 7 * i + 7, 7 * i : 7 * i + 7], atol=1e-6
            )


def test_sim3_landmark_graph_through_schur_routing(rng):
    """Composability: a Sim(3)-pose landmark graph built with ONLY an
    autodiff-registered factor flows through the dof-generic Schur routing
    (7-dof pose blocks eliminated against 3-dof landmarks) and converges —
    no Schur path is se3-specialized on the single-chip side."""
    import numpy as np

    from pyslam_tpu.graph.core import (
        FactorBatch,
        FactorGraph,
        VariableBlock,
        register_autodiff_factor,
    )
    from pyslam_tpu.losses import L2Loss
    from pyslam_tpu.solver import Options, route_auto, solve_auto

    if "sim3_landmark_xyz" not in __import__("pyslam_tpu").graph.core.FACTOR_KERNELS:
        def resid(data, S, l):
            p = jnp.einsum("...ij,...j->...i", S[..., :3, :3], l) + S[..., :3, 3]
            return p - data["obs"]

        register_autodiff_factor("sim3_landmark_xyz", resid, ("sim3", "euclidean"))

    n, L = 6, 30
    S_gt = np.stack([np.eye(4)] * n)
    for k in range(n):
        S_gt[k][:3, 3] = [-k, 0, 0]
    lm = rng.uniform(-1, 1, (L, 3)) + [2, 0, 0]
    oi = np.repeat(np.arange(n), L)
    oj = np.tile(np.arange(L), n)
    obs = np.einsum("mij,mj->mi", S_gt[oi][:, :3, :3], lm[oj]) + S_gt[oi][:, :3, 3]
    obs += rng.normal(0, 0.005, obs.shape)
    blocks = {
        "poses": VariableBlock.create(
            "sim3", jnp.asarray(S_gt, jnp.float64), np.eye(n, dtype=bool)[0]
        ),
        "landmarks": VariableBlock.create(
            "euclidean", jnp.asarray(lm + rng.normal(0, 0.1, lm.shape), jnp.float64)
        ),
    }
    batch = FactorBatch.create(
        "sim3_landmark_xyz", ("poses", "landmarks"), (oi, oj),
        {"obs": jnp.asarray(obs, jnp.float64)}, L2Loss(),
    )
    g = FactorGraph(blocks, [batch])
    assert route_auto(g) == "schur_dense"
    solved, info = solve_auto(g, Options(method="lm", max_iters=15))
    assert float(info.chi2) < 0.01 * float(g.chi2())
