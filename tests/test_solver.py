"""Solver-core tests: convergence, reference parity, metamorphic invariances
(SURVEY.md §4: gauge-fixed perturbation recovery, padding inertness, factor
-order invariance, scipy-parity harness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.graph import FactorBatch, FactorGraph, VariableBlock, build
from pyslam_tpu.io import synth
from pyslam_tpu.lie import se2, se3
from pyslam_tpu.losses import CauchyLoss, L2Loss
from pyslam_tpu.solver import Options, solve, solve_one_iter

import scipy_ref

F64 = jnp.float64


def small_se2(seed=1, **kw):
    return synth.se2_loop(n_poses=40, n_loops=6, seed=seed, **kw)


class TestQuadraticFit:
    """The reference's README demo: fit y = a x^2 + b x + c."""

    def test_converges_to_truth(self, rng):
        truth = np.array([2.0, -1.0, 0.5])
        x = rng.uniform(-3, 3, 80)
        y = truth[0] * x * x + truth[1] * x + truth[2] + rng.normal(0, 0.01, 80)
        blocks = {
            "params": VariableBlock.create("euclidean", jnp.zeros((1, 3), F64))
        }
        batch = FactorBatch.create(
            "quadratic",
            slots=("params",),
            indices=(np.zeros(80, np.int32),),
            data={
                "x": jnp.asarray(x, F64),
                "y": jnp.asarray(y, F64),
                "stiffness": jnp.full(80, 1.0 / 0.01, F64),
            },
            loss=L2Loss(),
        )
        g, info = solve(FactorGraph(blocks, [batch]), Options(method="gn", max_iters=20))
        est = np.asarray(g.blocks["params"].values[0])
        np.testing.assert_allclose(est, truth, atol=0.01)
        # linear problem: GN converges in one step
        assert int(info.iterations) <= 3


class TestPoseGraph2D:
    def test_gn_converges(self):
        data = small_se2()
        g = build.pose_graph(data, dtype=F64)
        g2, info = solve(g, Options(method="gn", max_iters=30))
        assert float(info.chi2) < float(g.chi2()) * 0.5
        err = se2.log(jnp.asarray(data.T_gt) @ se2.inv(g2.blocks["poses"].values))
        assert float(jnp.max(jnp.abs(err))) < 0.5

    def test_lm_converges(self):
        data = small_se2()
        g = build.pose_graph(data, dtype=F64)
        g2, info = solve(g, Options(method="lm", max_iters=50))
        costs = np.asarray(info.cost_history)
        costs = costs[~np.isnan(costs)]
        # accepted-cost trajectory is monotone non-increasing for LM
        assert np.all(np.diff(costs) <= 1e-9)

    def test_scipy_parity(self):
        """Converged chi2 must match the independent scipy GN solver
        (BASELINE.json:5 'match converged cost within optimality gap')."""
        data = synth.se2_loop(n_poses=25, n_loops=4, seed=3)
        g = build.pose_graph(data, dtype=F64)
        g2, info = solve(g, Options(method="lm", max_iters=60, min_cost_decrease=0.999999))
        T_ref, chi2_ref, _ = scipy_ref.solve_pose_graph(data, max_iters=60)
        # same convention: L2 cost = 0.5 sum r^2
        assert abs(float(info.chi2) - chi2_ref) / chi2_ref < 1e-5

    def test_robust_loss_rejects_outliers(self):
        data = small_se2(seed=7)
        # corrupt two loop-closure measurements badly
        bad = data.T_meas.copy()
        bad[-1] = synth._se2_mat(5.0, -3.0, 1.5) @ bad[-1]
        bad[-2] = synth._se2_mat(-4.0, 2.0, -2.0) @ bad[-2]
        data_bad = synth.PoseGraphData(
            2, data.T_gt, data.T_init, data.edges_i, data.edges_j, bad, data.sqrt_info
        )
        g_l2 = build.pose_graph(data_bad, loss=L2Loss(), dtype=F64)
        g_cauchy = build.pose_graph(data_bad, loss=CauchyLoss(1.0), dtype=F64)
        opts = Options(method="lm", max_iters=50)
        s_l2, _ = solve(g_l2, opts)
        s_c, _ = solve(g_cauchy, opts)
        err = lambda s: float(
            jnp.max(jnp.abs(se2.log(jnp.asarray(data.T_gt) @ se2.inv(s.blocks["poses"].values))))
        )
        assert err(s_c) < err(s_l2) * 0.7  # robust loss materially better

    def test_constant_params_respected(self):
        data = small_se2()
        g = build.pose_graph(data, dtype=F64)
        const = np.zeros(data.T_gt.shape[0], bool)
        const[0] = const[5] = True
        b = g.blocks["poses"]
        g = FactorGraph(
            {"poses": VariableBlock(b.kind, b.values, jnp.asarray(const))}, g.batches
        )
        g2, _ = solve(g, Options(method="lm", max_iters=20))
        np.testing.assert_allclose(
            np.asarray(g2.blocks["poses"].values[5]),
            np.asarray(g.blocks["poses"].values[5]),
            atol=1e-12,  # exp(0) @ T is identity up to rounding
        )

    def test_padding_inert(self):
        """Zero-weight (padding) factors must not change the solution."""
        data = small_se2()
        g = build.pose_graph(data, dtype=F64)
        fb = g.batches[0]
        pad = 7
        fb_padded = FactorBatch(
            fb.kind,
            fb.slots,
            tuple(jnp.concatenate([i, jnp.zeros(pad, jnp.int32)]) for i in fb.indices),
            {k: jnp.concatenate([v, v[:pad]]) for k, v in fb.data.items()},
            fb.loss,
            jnp.concatenate([fb.weight, jnp.zeros(pad, fb.weight.dtype)]),
        )
        g_pad = FactorGraph(g.blocks, [fb_padded])
        opts = Options(method="lm", max_iters=25)
        s1, i1 = solve(g, opts)
        s2, i2 = solve(g_pad, opts)
        np.testing.assert_allclose(float(i1.chi2), float(i2.chi2), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(s1.blocks["poses"].values),
            np.asarray(s2.blocks["poses"].values),
            atol=1e-12,
        )

    def test_factor_order_invariance(self):
        data = small_se2()
        g = build.pose_graph(data, dtype=F64)
        perm = np.random.default_rng(0).permutation(len(data.edges_i))
        data_shuf = synth.PoseGraphData(
            2,
            data.T_gt,
            data.T_init,
            data.edges_i[perm],
            data.edges_j[perm],
            data.T_meas[perm],
            data.sqrt_info[perm],
        )
        g_shuf = build.pose_graph(data_shuf, dtype=F64)
        opts = Options(method="lm", max_iters=25)
        _, i1 = solve(g, opts)
        _, i2 = solve(g_shuf, opts)
        np.testing.assert_allclose(float(i1.chi2), float(i2.chi2), rtol=1e-8)

    def test_solve_one_iter_decreases_cost(self):
        data = small_se2()
        g = build.pose_graph(data, dtype=F64)
        g2, dx, chi2_0 = solve_one_iter(g, Options(method="gn"))
        assert float(g2.chi2()) < float(chi2_0)


class TestPoseGraph3D:
    def test_se3_sphere_converges(self):
        data = synth.se3_sphere(n_poses=80, seed=2)
        g = build.pose_graph(data, dtype=F64)
        chi0 = float(g.chi2())
        g2, info = solve(g, Options(method="lm", max_iters=40))
        assert float(info.chi2) < chi0 * 0.1
        err = se3.log(jnp.asarray(data.T_gt) @ se3.inv(g2.blocks["poses"].values))
        assert float(jnp.max(jnp.abs(err))) < 0.5

    def test_perturbation_recovery(self, rng):
        """Metamorphic: perturb GT poses, solve with exact measurements,
        recover GT (gauge-fixed)."""
        data = synth.se3_sphere(n_poses=40, odo_trans_std=1e-8, odo_rot_std=1e-8, seed=5)
        g = build.pose_graph(data, dtype=F64, init="odometry")
        # init integrates (noiseless) odometry; perturb it
        vals = g.blocks["poses"].values
        noise = jnp.asarray(rng.normal(0, 0.05, (vals.shape[0], 6)))
        noise = noise.at[0].set(0.0)
        vals = se3.exp(noise) @ vals
        g = FactorGraph(
            {"poses": VariableBlock("se3", vals, g.blocks["poses"].const_mask)}, g.batches
        )
        g2, info = solve(g, Options(method="lm", max_iters=60))
        err = se3.log(jnp.asarray(data.T_gt) @ se3.inv(g2.blocks["poses"].values))
        assert float(jnp.max(jnp.abs(err))) < 1e-3


class TestBundleAdjustment:
    def test_small_ba_converges(self):
        data = synth.ba_synthetic(n_cams=6, n_pts=60, obs_per_pt=3, seed=4)
        g = build.ba_graph(data, dtype=F64)
        chi0 = float(g.chi2())
        g2, info = solve(g, Options(method="lm", max_iters=40))
        assert float(info.chi2) < chi0 * 0.05
        # landmarks near truth
        lm_err = np.abs(np.asarray(g2.blocks["landmarks"].values) - data.pts_gt)
        assert np.median(lm_err) < 0.05


class TestSolveAuto:
    """Structure dispatch (solver.solve_auto): each graph shape must route to
    a working path and converge."""

    def test_pose_graph_small_dense(self):
        from pyslam_tpu.io import synth
        from pyslam_tpu.graph import build
        from pyslam_tpu.solver import Options, solve_auto

        data = synth.se2_loop(n_poses=40, seed=0)
        g = build.pose_graph(data, dtype=jnp.float64)
        solved, info = solve_auto(g, Options(method="lm", max_iters=25))
        assert float(info.chi2) < float(g.chi2()) * 0.5

    def test_ba_routes_to_schur(self):
        from pyslam_tpu.io import synth
        from pyslam_tpu.graph import build
        from pyslam_tpu.solver import Options, solve_auto

        data = synth.ba_synthetic(n_cams=6, n_pts=40, seed=0)
        g = build.ba_graph(data, dtype=jnp.float64)
        solved, info = solve_auto(g, Options(method="lm", max_iters=20))
        assert float(info.chi2) < float(g.chi2())
        # gauge camera untouched (Schur path property)
        np.testing.assert_allclose(
            np.asarray(solved.blocks["poses"].values[0]),
            np.asarray(g.blocks["poses"].values[0]),
            atol=1e-12,
        )

    def _fake_ba_graph(self, n_obs, with_prior=False):
        """Structure-only BA graph (never evaluated) for routing tests."""
        from pyslam_tpu.graph.core import FactorBatch, FactorGraph, VariableBlock

        blocks = dict(
            poses=VariableBlock.create("se3", np.tile(np.eye(4), (3, 1, 1))),
            landmarks=VariableBlock.create("euclidean", np.zeros((5, 3))),
        )
        z = np.zeros(n_obs, np.int32)
        binary = FactorBatch.create(
            "reprojection_bal", ("poses", "landmarks"), (z, z), {}, None
        )
        batches = [binary]
        if with_prior:
            batches.append(
                FactorBatch.create(
                    "prior_se3", ("poses",), (np.zeros(2, np.int32),), {}, None
                )
            )
        return FactorGraph(blocks, batches)

    def test_venice_scale_with_priors_routes_to_schur_large(self, monkeypatch):
        """A >2M-observation BA graph WITH pose-prior batches must take the
        streamed schur_large path (the (M,dp,dl) block layout of solve_schur
        is a 19 GB OOM at that scale) — regression for the round-1 routing
        bug where any extra batch fell through to solve_schur."""
        import pyslam_tpu.solver as solver_mod
        import pyslam_tpu.solver.schur_large as sl
        from pyslam_tpu.solver import Options, solve_auto

        calls = []
        monkeypatch.setattr(
            sl, "solve_schur_large",
            lambda g, o, pose_name, lm_name: (calls.append("large") or g, 0.0, [0.0]),
        )
        monkeypatch.setattr(
            solver_mod, "solve_schur",
            lambda *a, **k: (_ for _ in ()).throw(AssertionError("wrong route")),
        )
        g = self._fake_ba_graph(2_000_001, with_prior=True)
        solve_auto(g, Options())
        assert calls == ["large"]

    def test_small_ba_with_priors_routes_to_schur(self, monkeypatch):
        import pyslam_tpu.solver as solver_mod
        from pyslam_tpu.solver import Options, solve_auto

        modes = []
        monkeypatch.setattr(
            solver_mod, "solve_schur",
            lambda g, o, mode, pose_name, lm_name: (modes.append(mode) or g, None),
        )
        g = self._fake_ba_graph(100, with_prior=True)
        solve_auto(g, Options())
        assert modes == ["dense"]

    def test_dense_mode_gated_on_hpl_memory(self, monkeypatch):
        """Few cameras + many landmarks (BAL-Dubrovnik class) must use the
        implicit-PCG Schur mode: dense mode materializes two (C,dp,L,dl)
        arrays, which OOMs despite a small camera count."""
        import pyslam_tpu.solver as solver_mod
        from pyslam_tpu.solver import Options, solve_auto

        modes = []
        monkeypatch.setattr(
            solver_mod, "solve_schur",
            lambda g, o, mode, pose_name, lm_name: (modes.append(mode) or g, None),
        )
        g = self._fake_ba_graph(100)
        solve_auto(g, Options(), dense_hpl_budget_bytes=100)  # force over-budget
        solve_auto(g, Options())  # default budget: comfortably dense
        assert modes == ["pcg", "dense"]

    def test_problem_api_uses_dispatch(self):
        from pyslam_tpu import Problem, Options, PoseToPoseResidual, SE2
        from pyslam_tpu.io import synth

        data = synth.se2_loop(n_poses=10, n_loops=2, seed=1)
        problem = Problem(Options(max_iters=25))
        names = [f"T_{i}" for i in range(10)]
        for k in range(len(data.edges_i)):
            i, j = int(data.edges_i[k]), int(data.edges_j[k])
            problem.add_residual_block(
                PoseToPoseResidual(data.T_meas[k], data.sqrt_info[k]),
                [names[i], names[j]],
            )
        problem.initialize_params(
            {n: SE2(jnp.asarray(T)) for n, T in zip(names, data.T_init)}
        )
        problem.set_parameters_constant(names[0])
        before = problem.eval_cost()
        problem.solve()
        assert problem.eval_cost() < before


class TestSolveBatched:
    def test_fleet_matches_individual(self):
        from pyslam_tpu.io import synth
        from pyslam_tpu.graph import build
        from pyslam_tpu.solver import Options, solve, solve_batched

        datas = [synth.se2_loop(n_poses=20, n_loops=3, seed=s) for s in range(5)]
        graphs = [build.pose_graph(d, dtype=jnp.float64) for d in datas]
        opts = Options(method="lm", max_iters=25)
        values, chi2s = solve_batched(graphs, opts)
        assert values["poses"].shape == (5, 20, 3, 3)
        for i, g in enumerate(graphs):
            _, info = solve(g, opts)
            np.testing.assert_allclose(float(chi2s[i]), float(info.chi2), rtol=1e-10)

    def test_monte_carlo_covariance_consistency(self):
        # resampled-noise fleet: empirical spread of the solutions should be
        # finite and nonzero (smoke-level sanity of the MC use case)
        from pyslam_tpu.io import synth
        from pyslam_tpu.graph import build
        from pyslam_tpu.solver import Options, solve_batched

        datas = [synth.se2_loop(n_poses=15, n_loops=2, seed=s) for s in range(8)]
        graphs = [build.pose_graph(d, dtype=jnp.float64) for d in datas]
        values, chi2s = solve_batched(graphs, Options(method="lm", max_iters=25))
        last_xy = np.asarray(values["poses"])[:, -1, :2, 2]
        spread = last_xy.std(axis=0)
        assert np.isfinite(spread).all() and (spread > 0).all()


class TestSpanningTreeInit:
    def test_reproduces_odometry_integration(self):
        from pyslam_tpu.graph.initialize import spanning_tree_init
        from pyslam_tpu.io import synth

        # chain-only graph: the BFS tree IS the odometry chain
        data = synth.se2_loop(n_poses=25, n_loops=0, seed=0)
        T0 = spanning_tree_init(
            data.edges_i, data.edges_j, data.T_meas, 25, T_root=data.T_gt[0]
        )
        np.testing.assert_allclose(T0, data.T_init, atol=1e-9)

    def test_solves_from_tree_init(self):
        from pyslam_tpu.graph.initialize import spanning_tree_init
        from pyslam_tpu.graph import build
        from pyslam_tpu.io import synth
        from pyslam_tpu.solver import Options, solve

        data = synth.se3_sphere(n_poses=40, n_loops=10, seed=5)
        T0 = spanning_tree_init(
            data.edges_i, data.edges_j, data.T_meas, 40, T_root=data.T_gt[0]
        )
        data.T_init = T0
        g = build.pose_graph(data, dtype=jnp.float64)
        solved, info = solve(g, Options(method="lm", max_iters=30))
        assert float(info.chi2) < float(g.chi2()) * 0.5

    def test_disconnected_gets_root_pose(self):
        from pyslam_tpu.graph.initialize import spanning_tree_init

        # 4 poses, only 0-1 connected; 2,3 unreachable
        T_meas = np.tile(np.eye(3), (1, 1, 1))
        T0 = spanning_tree_init([0], [1], T_meas, 4)
        np.testing.assert_allclose(T0[2], np.eye(3))
        np.testing.assert_allclose(T0[3], np.eye(3))

    def test_reverse_edges(self):
        from pyslam_tpu.graph.initialize import spanning_tree_init
        from pyslam_tpu.io import synth

        data = synth.se2_loop(n_poses=10, n_loops=0, seed=1)
        # flip every edge direction: j->i with inverted measurement
        T0 = spanning_tree_init(
            data.edges_j, data.edges_i,
            np.linalg.inv(data.T_meas), 10, T_root=data.T_gt[0],
        )
        np.testing.assert_allclose(T0, data.T_init, atol=1e-9)


class TestDogleg:
    """Powell dogleg trust region (Options.method='dogleg'): must reach the
    same optimum as LM on the standard families, with monotone accepted
    costs and a working trust-radius rejection path."""

    def test_matches_lm_se2(self):
        data = small_se2()
        g = build.pose_graph(data, dtype=F64)
        _, i_lm = solve(g, Options(method="lm", max_iters=40))
        _, i_dl = solve(g, Options(method="dogleg", max_iters=40))
        np.testing.assert_allclose(float(i_dl.chi2), float(i_lm.chi2), rtol=1e-6)

    def test_matches_lm_se3(self):
        data = synth.se3_sphere(n_poses=80, n_loops=20, seed=2)
        g = build.pose_graph(data, dtype=F64)
        _, i_lm = solve(g, Options(method="lm", max_iters=40))
        _, i_dl = solve(g, Options(method="dogleg", max_iters=40))
        np.testing.assert_allclose(float(i_dl.chi2), float(i_lm.chi2), rtol=1e-6)

    def test_accepted_costs_monotone(self):
        data = synth.se3_sphere(n_poses=80, n_loops=20, seed=2)
        g = build.pose_graph(data, dtype=F64)
        _, info = solve(g, Options(method="dogleg", max_iters=40))
        hist = np.asarray(info.cost_history)
        hist = hist[~np.isnan(hist)]
        assert np.all(np.diff(hist) <= 1e-9)

    def test_tiny_trust_radius_still_converges(self):
        # start with a radius far below the natural step: the radius must
        # grow via the gain-ratio rule and still reach the optimum
        data = small_se2()
        g = build.pose_graph(data, dtype=F64)
        _, i_lm = solve(g, Options(method="lm", max_iters=60))
        _, i_dl = solve(
            g, Options(method="dogleg", max_iters=60, trust_radius_init=1e-4)
        )
        np.testing.assert_allclose(float(i_dl.chi2), float(i_lm.chi2), rtol=1e-5)

    def test_custom_path_requires_matvec(self):
        from pyslam_tpu.solver import lm as _lm

        data = small_se2()
        g = build.pose_graph(data, dtype=F64)

        def fake_assemble(graph):
            raise AssertionError("should not be called")

        with pytest.raises(ValueError, match="matvec_fn"):
            _lm.solve(g, Options(method="dogleg"), assemble_fn=fake_assemble)

    def test_dogleg_on_ell_path(self):
        # dogleg rides the block-sparse ELL path through its matvec closure
        from pyslam_tpu.solver.bcsr import build_ell_direct, solve_ell

        data = synth.se3_sphere(n_poses=120, n_loops=30, seed=3)
        g = build.pose_graph(data, dtype=F64)
        plan = build_ell_direct(g)
        _, i_lm = solve_ell(g, Options(method="lm", max_iters=40), plan=plan)
        _, i_dl = solve_ell(g, Options(method="dogleg", max_iters=40), plan=plan)
        np.testing.assert_allclose(float(i_dl.chi2), float(i_lm.chi2), rtol=1e-4)
