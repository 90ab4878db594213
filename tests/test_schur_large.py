"""Component-major (Venice-scale) Schur path: must agree exactly with the
standard Schur solver on problems small enough for both (SURVEY.md §7 M3/M4;
solver/schur_large.py docstring for the layout rationale)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.graph import build
from pyslam_tpu.io import bal, synth
from pyslam_tpu.losses import HuberLoss
from pyslam_tpu.solver import Options, solve_schur
from pyslam_tpu.solver.schur_large import solve_schur_large


def stereo_graph(loss=None, seed=3):
    data = synth.ba_synthetic(n_cams=8, n_pts=64, seed=seed)
    return build.ba_graph(data, loss=loss, dtype=jnp.float64)


def bal_graph(seed=0):
    data = bal.perturbed(bal.synthetic_bal(n_cams=6, n_pts=50, seed=seed))
    return build.bal_graph(data, dtype=jnp.float64)


class TestSchurLarge:
    @pytest.mark.parametrize("graph_fn", [stereo_graph, bal_graph])
    def test_matches_standard_schur(self, graph_fn):
        g = graph_fn()
        opts = Options(method="lm", max_iters=20)
        _, info = solve_schur(g, opts, mode="pcg", pcg_rtol=1e-10, pcg_max_iters=300)
        _, chi2_l, _ = solve_schur_large(
            g, opts, n_chunks=4, pcg_rtol=1e-10, pcg_max_iters=300
        )
        np.testing.assert_allclose(chi2_l, float(info.chi2), rtol=1e-8)

    def test_chunk_count_invariance(self):
        g = stereo_graph(seed=5)
        opts = Options(method="lm", max_iters=8)
        _, a, _ = solve_schur_large(g, opts, n_chunks=1)
        _, b, _ = solve_schur_large(g, opts, n_chunks=7)  # forces padding
        np.testing.assert_allclose(a, b, rtol=1e-9)

    def test_plan_reuse_identical(self):
        # a prebuilt prepare_large_ba plan must give the bit-identical
        # solve (same sorts, padding, uploads) as the internal build
        from pyslam_tpu.solver.schur_large import prepare_large_ba

        g = stereo_graph(seed=9)
        opts = Options(method="lm", max_iters=6)
        plan = prepare_large_ba(g, 4)
        _, a, hist_a = solve_schur_large(g, opts, n_chunks=4)
        _, b, hist_b = solve_schur_large(g, opts, n_chunks=4, plan=plan)
        _, c, _ = solve_schur_large(g, opts, n_chunks=4, plan=plan)  # reuse twice
        assert hist_a == hist_b
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(c))

    def test_robust_loss(self):
        g = stereo_graph(loss=HuberLoss(2.0))
        opts = Options(method="lm", max_iters=12)
        _, chi2, hist = solve_schur_large(g, opts, n_chunks=4)
        assert chi2 < hist[0]

    def test_gauge_anchor(self):
        g = stereo_graph()
        solved, _, _ = solve_schur_large(g, Options(method="lm", max_iters=5), n_chunks=4)
        np.testing.assert_allclose(
            np.asarray(solved.blocks["poses"].values[0]),
            np.asarray(g.blocks["poses"].values[0]),
            atol=1e-12,
        )


class TestSchurLargeUnary:
    def test_pose_prior_matches_standard(self):
        import numpy as _np
        from pyslam_tpu.graph.core import FactorBatch, FactorGraph

        data = synth.ba_synthetic(n_cams=6, n_pts=40, seed=11)
        g = build.ba_graph(data, dtype=jnp.float64)
        pb = g.blocks["poses"]
        prior = FactorBatch.create(
            kind="prior_se3",
            slots=("poses",),
            indices=(_np.array([0], _np.int32),),
            data={
                "T_obs": jnp.asarray(_np.asarray(pb.values[:1]), jnp.float64),
                "sqrt_info": 1e3 * jnp.eye(6, dtype=jnp.float64)[None],
            },
            loss=g.batches[0].loss,
        )
        g2 = FactorGraph(dict(g.blocks), [g.batches[0], prior])
        opts = Options(method="lm", max_iters=15)
        _, info = solve_schur(g2, opts, mode="pcg", pcg_rtol=1e-10, pcg_max_iters=300)
        _, chi2_l, _ = solve_schur_large(
            g2, opts, n_chunks=4, pcg_rtol=1e-10, pcg_max_iters=300
        )
        np.testing.assert_allclose(chi2_l, float(info.chi2), rtol=1e-8)


class TestPCGSegmentBreakdown:
    def test_exact_convergence_mid_segment_freezes(self):
        """rz -> 0 on exact convergence must freeze the CG state, not NaN it
        (round-1 advisor finding: a NaN dx caused LM to reject the step AT
        the solution and burn the full iteration budget)."""
        from pyslam_tpu.solver.schur_large import _pcg_init, _pcg_segment

        C, L = 1, 1
        Hpp = jnp.eye(6, dtype=jnp.float64)[None]
        Hinv = jnp.asarray([1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0], jnp.float64)[:, None]
        W = jnp.zeros((18, 1), jnp.float64)
        ci = jnp.zeros(1, jnp.int32)
        li = jnp.zeros(1, jnp.int32)
        cam_starts = jnp.asarray([0, 1], jnp.int32)
        Dinv = jnp.eye(6, dtype=jnp.float64)[None]
        b = jnp.ones(6, jnp.float64)
        PP = jnp.zeros((0, 6, 6), jnp.float64)
        pi = jnp.zeros(0, jnp.int32)
        pj = jnp.zeros(0, jnp.int32)
        # identity system converges EXACTLY at iteration 1; run 10 more
        state, _ = _pcg_init(C, L, Hpp, Hinv, W, PP, ci, li, pi, pj, cam_starts, Dinv, b)
        state, rnorm = _pcg_segment(
            C, L, 10, Hpp, Hinv, W, PP, ci, li, pi, pj, cam_starts, Dinv, state
        )
        x = np.asarray(state[0])
        assert np.isfinite(x).all()
        np.testing.assert_allclose(x, np.ones(6), atol=1e-12)
        assert float(rnorm) < 1e-12


class TestClosedKernelRegistry:
    def test_content_keyed_names(self):
        """Closure kernels are keyed on static-data CONTENT: identical data
        reuses one registry entry; different data never collides (round-1
        advisor finding: id()-keyed names could alias after GC)."""
        from pyslam_tpu.graph.core import FACTOR_KERNELS, register_closed_kernel

        d1 = {"f": np.asarray(800.0), "k": np.asarray([1.0, 2.0])}
        d2 = {"f": np.asarray(801.0), "k": np.asarray([1.0, 2.0])}
        n1 = register_closed_kernel("reprojection_bal", dict(d1))
        n2 = register_closed_kernel("reprojection_bal", dict(d1))
        n3 = register_closed_kernel("reprojection_bal", dict(d2))
        assert n1 == n2 and n1 != n3
        assert n1 in FACTOR_KERNELS and n3 in FACTOR_KERNELS


class TestSchurLargeBetween:
    def test_between_factors_match_standard(self):
        """Full-SLAM at the streamed path: pose-pose between factors ride
        replicated alongside the streamed observations."""
        from pyslam_tpu.graph.core import FactorBatch, FactorGraph
        from pyslam_tpu.losses import L2Loss

        data = synth.ba_synthetic(n_cams=8, n_pts=64, obs_per_pt=4, seed=12)
        g = build.ba_graph(data, dtype=jnp.float64)
        Ti = np.arange(7, dtype=np.int32)
        Tj = Ti + 1
        T_obs = np.stack(
            [data.T_gt[j] @ np.linalg.inv(data.T_gt[i]) for i, j in zip(Ti, Tj)]
        )
        between = FactorBatch.create(
            kind="between_se3",
            slots=("poses", "poses"),
            indices=(Ti, Tj),
            data={
                "T_obs": jnp.asarray(T_obs, jnp.float64),
                "sqrt_info": jnp.broadcast_to(
                    10.0 * jnp.eye(6, dtype=jnp.float64), (7, 6, 6)
                ),
            },
            loss=L2Loss(),
        )
        g2 = FactorGraph(dict(g.blocks), [g.batches[0], between])
        opts = Options(method="lm", max_iters=20)
        _, i_ref = solve_schur(g2, opts, mode="pcg", pcg_rtol=1e-12, pcg_max_iters=400)
        _, chi2, hist = solve_schur_large(
            g2, opts, n_chunks=4, pcg_rtol=1e-12, pcg_max_iters=400
        )
        assert hist[-1] < hist[0]
        np.testing.assert_allclose(chi2, float(i_ref.chi2), rtol=1e-6)


class TestSpeculativeLoop:
    def test_speculative_matches_classic_history(self):
        """The speculative-linearization loop (one gradient pass per
        iteration, no cost-only pass) must walk the identical iterate
        sequence: same accepted-cost history, same converged chi2
        (solver/host_loop.py host_lm_loop_speculative)."""
        g = stereo_graph(seed=7)
        opts = Options(method="lm", max_iters=15)
        _, chi2_a, hist_a = solve_schur_large(g, opts, n_chunks=4, speculative=False)
        _, chi2_b, hist_b = solve_schur_large(g, opts, n_chunks=4, speculative=True)
        assert len(hist_a) == len(hist_b)
        np.testing.assert_allclose(hist_a, hist_b, rtol=1e-12)
        np.testing.assert_allclose(chi2_a, chi2_b, rtol=1e-12)

    def test_speculative_matches_classic_history_gn(self):
        g = stereo_graph(seed=9)
        opts = Options(method="gn", max_iters=8)
        _, chi2_a, hist_a = solve_schur_large(g, opts, n_chunks=2, speculative=False)
        _, chi2_b, hist_b = solve_schur_large(g, opts, n_chunks=2, speculative=True)
        assert len(hist_a) == len(hist_b)
        np.testing.assert_allclose(hist_a, hist_b, rtol=1e-12)
        np.testing.assert_allclose(chi2_a, chi2_b, rtol=1e-12)


class TestDenseLinear:
    """linear="dense": exact direct solve of the reduced camera system
    (dense S from host-enumerated co-observation pairs + equilibrated
    Cholesky) must reproduce tight-tolerance PCG on problems small enough
    for both (solver/schur_large._dense_solve_fused)."""

    @pytest.mark.parametrize("graph_fn", [stereo_graph, bal_graph])
    def test_matches_pcg(self, graph_fn):
        g = graph_fn()
        opts = Options(method="lm", max_iters=15)
        _, chi2_p, _ = solve_schur_large(
            g, opts, n_chunks=4, pcg_rtol=1e-12, pcg_max_iters=400
        )
        _, chi2_d, _ = solve_schur_large(g, opts, n_chunks=4, linear="dense")
        # rtol matches the cross-solver parity precedent (ADVICE r4): two
        # different LM iterate sequences, not one linear solve
        np.testing.assert_allclose(chi2_d, chi2_p, rtol=1e-8)

    def test_between_factors(self):
        """PP couplings fold into the dense-S buckets pre-symmetrization."""
        from pyslam_tpu.graph.core import FactorBatch, FactorGraph
        from pyslam_tpu.losses import L2Loss

        data = synth.ba_synthetic(n_cams=8, n_pts=64, obs_per_pt=4, seed=12)
        g = build.ba_graph(data, dtype=jnp.float64)
        Ti = np.arange(7, dtype=np.int32)
        Tj = Ti + 1
        T_obs = np.stack(
            [data.T_gt[j] @ np.linalg.inv(data.T_gt[i]) for i, j in zip(Ti, Tj)]
        )
        between = FactorBatch.create(
            kind="between_se3",
            slots=("poses", "poses"),
            indices=(Ti, Tj),
            data={
                "T_obs": jnp.asarray(T_obs, jnp.float64),
                "sqrt_info": jnp.broadcast_to(
                    10.0 * jnp.eye(6, dtype=jnp.float64), (7, 6, 6)
                ),
            },
            loss=L2Loss(),
        )
        g2 = FactorGraph(dict(g.blocks), [g.batches[0], between])
        opts = Options(method="lm", max_iters=15)
        _, chi2_p, _ = solve_schur_large(
            g2, opts, n_chunks=4, pcg_rtol=1e-12, pcg_max_iters=400
        )
        _, chi2_d, _ = solve_schur_large(g2, opts, n_chunks=4, linear="dense")
        np.testing.assert_allclose(chi2_d, chi2_p, rtol=1e-8)

    def test_plan_caches_pairs_and_speculative_matches(self):
        from pyslam_tpu.solver.schur_large import prepare_large_ba

        g = stereo_graph(loss=HuberLoss(2.0), seed=5)
        opts = Options(method="lm", max_iters=10)
        plan = prepare_large_ba(g, 4)
        _, a, ha = solve_schur_large(g, opts, n_chunks=4, linear="dense", plan=plan)
        pairs = plan.pairs
        assert pairs is not None
        _, b, hb = solve_schur_large(
            g, opts, n_chunks=4, linear="dense", plan=plan, speculative=False
        )
        assert plan.pairs is pairs  # reused, not rebuilt
        assert len(ha) == len(hb)
        np.testing.assert_allclose(ha, hb, rtol=1e-12)
        np.testing.assert_allclose(a, b, rtol=1e-12)


class TestClusterPrecond:
    """precond="cluster": camera-cluster block-Jacobi must converge to the
    same optimum as SCHUR_JACOBI (a preconditioner changes the CG
    trajectory, not the solution) and must not need MORE CG iterations."""

    @pytest.mark.parametrize("G", [2, 4])
    def test_matches_jacobi(self, G):
        g = stereo_graph(seed=3)
        opts = Options(method="lm", max_iters=15)
        _, chi2_j, _ = solve_schur_large(
            g, opts, n_chunks=4, pcg_rtol=1e-10, pcg_max_iters=50
        )
        _, chi2_c, _ = solve_schur_large(
            g, opts, n_chunks=4, pcg_rtol=1e-10, pcg_max_iters=50,
            precond="cluster", cluster_size=G,
        )
        np.testing.assert_allclose(chi2_c, chi2_j, rtol=1e-8)

    def test_with_between_factors(self):
        from pyslam_tpu.graph.core import FactorBatch, FactorGraph
        from pyslam_tpu.losses import L2Loss

        data = synth.ba_synthetic(n_cams=8, n_pts=64, obs_per_pt=4, seed=12)
        g = build.ba_graph(data, dtype=jnp.float64)
        Ti = np.arange(7, dtype=np.int32)
        Tj = Ti + 1
        T_obs = np.stack(
            [data.T_gt[j] @ np.linalg.inv(data.T_gt[i]) for i, j in zip(Ti, Tj)]
        )
        between = FactorBatch.create(
            kind="between_se3",
            slots=("poses", "poses"),
            indices=(Ti, Tj),
            data={
                "T_obs": jnp.asarray(T_obs, jnp.float64),
                "sqrt_info": jnp.broadcast_to(
                    10.0 * jnp.eye(6, dtype=jnp.float64), (7, 6, 6)
                ),
            },
            loss=L2Loss(),
        )
        g2 = FactorGraph(dict(g.blocks), [g.batches[0], between])
        opts = Options(method="lm", max_iters=15)
        _, chi2_j, _ = solve_schur_large(
            g2, opts, n_chunks=4, pcg_rtol=1e-10, pcg_max_iters=50
        )
        _, chi2_c, _ = solve_schur_large(
            g2, opts, n_chunks=4, pcg_rtol=1e-10, pcg_max_iters=50,
            precond="cluster", cluster_size=3,  # non-divisor: padded cluster
        )
        np.testing.assert_allclose(chi2_c, chi2_j, rtol=1e-8)

    @pytest.mark.parametrize("refresh", [1, 3])
    def test_stale_matches_jacobi(self, refresh):
        """precond="stale" (S factored every `refresh` solves, reused as
        CG preconditioner in between) converges to the SCHUR_JACOBI
        optimum — a preconditioner, stale or not, changes the CG
        trajectory but not the solution."""
        g = stereo_graph(seed=7)
        opts = Options(method="lm", max_iters=15)
        _, chi2_j, _ = solve_schur_large(
            g, opts, n_chunks=4, pcg_rtol=1e-10, pcg_max_iters=50
        )
        _, chi2_s, _ = solve_schur_large(
            g, opts, n_chunks=4, pcg_rtol=1e-10, pcg_max_iters=50,
            precond="stale", stale_refresh=refresh,
        )
        np.testing.assert_allclose(chi2_s, chi2_j, rtol=1e-8)

    def test_stale_reuses_dense_pair_tables(self):
        # precond="stale" builds the same co-observation pair tables the
        # dense-S solve uses, caches them on the plan, and reuses them
        from pyslam_tpu.solver.schur_large import prepare_large_ba

        g = stereo_graph(seed=6)
        opts = Options(method="lm", max_iters=5)
        plan = prepare_large_ba(g, 4)
        solve_schur_large(g, opts, n_chunks=4, plan=plan, precond="stale")
        pairs = plan.pairs
        assert pairs is not None
        solve_schur_large(g, opts, n_chunks=4, plan=plan, precond="stale")
        assert plan.pairs is pairs

    def test_stale_budget_validated_before_pair_build(self):
        from pyslam_tpu.solver.schur_large import prepare_large_ba

        g = stereo_graph(seed=6)
        plan = prepare_large_ba(g, 4)
        with pytest.raises(ValueError, match="fused"):
            solve_schur_large(
                g, Options(method="lm", max_iters=5), n_chunks=4, plan=plan,
                precond="stale", pcg_max_iters=100,
            )
        assert plan.pairs is None  # the invalid call must not mutate the plan

    def test_plan_caches_cluster_pairs(self):
        from pyslam_tpu.solver.schur_large import prepare_large_ba

        g = stereo_graph(seed=5)
        opts = Options(method="lm", max_iters=5)
        plan = prepare_large_ba(g, 4)
        solve_schur_large(
            g, opts, n_chunks=4, plan=plan, precond="cluster", cluster_size=4
        )
        cp = plan.cpairs
        assert cp is not None and plan.cpairs_G == 4
        solve_schur_large(
            g, opts, n_chunks=4, plan=plan, precond="cluster", cluster_size=4
        )
        assert plan.cpairs is cp  # reused, not rebuilt


class TestDualOrder:
    def test_dual_order_matches(self):
        """Landmark-direction cumsum matvec (dual-order W) must reproduce
        the scatter matvec: same accepted-cost history and converged chi2.
        The two reductions order float adds differently, so mid-history
        costs agree to roundoff (observed 2e-9 relative in f64), not
        bitwise."""
        g = stereo_graph(seed=13)
        opts = Options(method="lm", max_iters=12)
        _, chi2_a, hist_a = solve_schur_large(
            g, opts, n_chunks=4, dual_order=False
        )
        _, chi2_b, hist_b = solve_schur_large(
            g, opts, n_chunks=4, dual_order=True
        )
        assert len(hist_a) == len(hist_b)
        np.testing.assert_allclose(hist_a, hist_b, rtol=1e-6)
        np.testing.assert_allclose(chi2_a, chi2_b, rtol=1e-8)

    def test_dual_order_bal(self):
        g = bal_graph(seed=2)
        opts = Options(method="lm", max_iters=10)
        _, chi2_a, _ = solve_schur_large(g, opts, n_chunks=3, dual_order=False)
        _, chi2_b, _ = solve_schur_large(g, opts, n_chunks=3, dual_order=True)
        np.testing.assert_allclose(chi2_a, chi2_b, rtol=1e-9)
